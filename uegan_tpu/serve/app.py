"""HTTP scoring/enhancement service.

Capability parity with the vendored nima package's Flask+gunicorn scorer
(reference: metrics/NIMA/nima/nima/inference/app.py:8-79 — POST an image,
get aesthetic scores back).  Flask is not in this image, so this is a
stdlib ``http.server`` implementation; model forwards are jitted, and
concurrent requests are micro-batched into shared device programs
(``_MicroBatcher``) — the TPU-native serving pattern the reference lacked.

Endpoints:
- ``GET  /``                 service info (JSON)
- ``POST /api/get_scores``   body = raw image bytes -> NIMA mean/std + the
                             full 10-bucket distribution
- ``POST /api/enhance``      body = raw image bytes -> enhanced PNG bytes
                             (requires a generator checkpoint)

Run:  python -m uegan_tpu.serve.app --port 5000 [--nima_weights p.pth]
          [--generator_ckpt results/UEGAN-FiveK/models/... --platform cpu]
"""

from __future__ import annotations

import argparse
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional

import numpy as np
from PIL import Image


class _MicroBatcher:
    """Cross-request micro-batching for a fixed-shape jitted forward.

    TPU throughput scales with batch (e.g. 516 img/s at B=128 vs a
    latency-bound single image per program), so concurrent HTTP requests
    should share one device program: each request enqueues its preprocessed
    array and blocks on a Future; a single worker thread drains the queue,
    waits up to ``window_ms`` for followers, pads the group to the next
    power-of-two bucket (so only O(log max_batch) shapes ever compile), runs
    ONE ``run_batch`` call, and distributes the per-image results.  A lone
    request costs at most ``window_ms`` extra latency.  The reference's
    Flask scorer (metrics/NIMA/nima/inference/app.py) had no batching story.
    """

    def __init__(self, run_batch: Callable[[np.ndarray], np.ndarray],
                 window_ms: float = 2.0, max_batch: int = 16):
        self.run_batch = run_batch
        self.window_s = window_ms / 1000.0
        self.max_batch = max_batch
        self.calls = 0  # batched device calls issued (observability/tests)
        self._q: "queue.Queue" = queue.Queue()
        self._worker: Optional[threading.Thread] = None
        self._lock = threading.Lock()

    def submit(self, arr: np.ndarray):
        """Block until the batched result for ``arr`` is available."""
        fut: Future = Future()
        with self._lock:
            if self._worker is None:
                self._worker = threading.Thread(target=self._loop, daemon=True)
                self._worker.start()
        self._q.put((arr, fut))
        return fut.result()

    def _loop(self):
        while True:
            group = [self._q.get()]  # block for the first request
            deadline = time.monotonic() + self.window_s
            while len(group) < self.max_batch:
                timeout = deadline - time.monotonic()
                if timeout <= 0:
                    break
                try:
                    group.append(self._q.get(timeout=timeout))
                except queue.Empty:
                    break
            arrs = np.stack([g[0] for g in group])
            b = arrs.shape[0]
            bucket = 1
            while bucket < b:
                bucket *= 2
            if bucket > b:  # pad to the bucket so only a few shapes compile
                pad = np.zeros((bucket - b,) + arrs.shape[1:], arrs.dtype)
                arrs = np.concatenate([arrs, pad])
            try:
                out = np.asarray(self.run_batch(arrs))
                self.calls += 1
                for i, (_, fut) in enumerate(group):
                    fut.set_result(out[i])
            except Exception as e:  # surface to every waiting request
                for _, fut in group:
                    if not fut.done():
                        fut.set_exception(e)


class _Models:
    """Lazily-built jitted model handles shared across requests."""

    def __init__(self, nima_weights: str = "", generator_ckpt: str = "",
                 test_img_size: int = 512, quantized_inference: str = "",
                 nima_dtype: str = "float32", batch_window_ms: float = 2.0,
                 max_batch: int = 16, keep_aspect: bool = False):
        self._lock = threading.Lock()
        self.nima_weights = nima_weights
        self.generator_ckpt = generator_ckpt
        self.test_img_size = test_img_size
        self.quantized_inference = quantized_inference
        self.nima_dtype = nima_dtype
        self.batch_window_ms = batch_window_ms
        self.max_batch = max_batch
        # native-resolution enhancement (the CLI's --test_keep_aspect, served):
        # pad-reflect to the bucketed /16 grid, enhance, crop back
        # (infer/native.py).  Requests run unbatched — mixed native shapes
        # can't share a stacked program; each bucket shape jit-caches once.
        self.keep_aspect = keep_aspect
        self._nima = None
        self._enhancer = None
        self._nima_batcher: Optional[_MicroBatcher] = None
        self._enhance_batcher: Optional[_MicroBatcher] = None
        # fail at STARTUP on a bad checkpoint path, not on the first request
        # (enhance() re-checks the type when it actually loads)
        if generator_ckpt:
            import os

            if not (generator_ckpt.endswith(".pth") and os.path.isfile(generator_ckpt)) \
                    and not os.path.isdir(generator_ckpt):
                raise FileNotFoundError(
                    f"generator_ckpt {generator_ckpt!r} is neither a .pth file "
                    "nor an orbax checkpoint directory"
                )

    def nima_score(self, image: Image.Image):
        import jax
        import jax.numpy as jnp

        from uegan_tpu.metrics.nima import init_nima, prepare_image_np
        from uegan_tpu.models.nima import score_stats

        with self._lock:
            if self._nima is None:
                model, variables = init_nima(self.nima_weights,
                                             compute_dtype=self.nima_dtype)
                self._nima = jax.jit(lambda b: model.apply(variables, b, train=False))
                self._nima_batcher = _MicroBatcher(
                    lambda arrs: np.asarray(self._nima(jnp.asarray(arrs))),
                    self.batch_window_ms, self.max_batch,
                )
        probs = self._nima_batcher.submit(prepare_image_np(image))
        buckets = np.arange(1, 11, dtype=np.float64)
        mean = float((probs * buckets).sum())
        std = float(np.sqrt((probs * (buckets - mean) ** 2).sum()))
        return {
            "mean_score": round(mean, 6),
            "std_score": round(std, 6),
            "scores": [round(float(s), 6) for s in probs],
        }

    def enhance(self, image: Image.Image) -> bytes:
        import jax
        import jax.numpy as jnp

        with self._lock:
            if self._enhancer is None:
                import os

                from uegan_tpu.config import Config
                from uegan_tpu.infer.packed import make_fast_eval

                from uegan_tpu.train.state import create_train_state

                cfg = Config(quantized_inference=self.quantized_inference).validate()
                state, bundle = create_train_state(
                    cfg, jax.random.PRNGKey(0), (self.test_img_size, self.test_img_size), 1
                )
                if self.generator_ckpt:
                    if self.generator_ckpt.endswith(".pth"):
                        from uegan_tpu.convert.torch_import import import_uegan_checkpoint

                        conv = import_uegan_checkpoint(self.generator_ckpt)
                        cast = lambda new, old: jnp.asarray(new, old.dtype)
                        state = state.replace(
                            g_params=jax.tree_util.tree_map(
                                cast, conv["g_vars"]["params"], state.g_params
                            )
                        )
                    elif os.path.isdir(self.generator_ckpt):
                        # accepts EMA-carrying checkpoints and serves the
                        # averaged weights when present (Config.ema_eval)
                        from uegan_tpu.utils.checkpoint import restore_eval_state

                        state = restore_eval_state(
                            self.generator_ckpt, jax.device_get(state)
                        )
                    else:
                        # never serve random-init weights on a bad path
                        raise FileNotFoundError(
                            f"generator_ckpt {self.generator_ckpt!r} is neither "
                            "a .pth file nor an orbax checkpoint directory"
                        )
                # packed fast path (2.8x canonical; int8 when configured) —
                # kernels transformed from the loaded weights.  uint8 I/O:
                # the [-1,1] normalize and the PNG quantize both run inside
                # the jit, so the host only moves 1-byte pixels each way
                # (3.6x e2e measured on a transfer-bound link; see
                # OPTIMIZATION_NOTES.md "uint8 device I/O")
                from uegan_tpu.data.pipeline import device_normalize

                # u8_output fuses the PNG quantize before the packed final
                # depth_to_space (bit-identical; infer/packed.py)
                base = make_fast_eval(bundle, state.g_params, u8_output=True)
                fn = jax.jit(
                    lambda p, e, x: base(p, e, device_normalize(x))
                )
                st = state
                self._enhancer = (fn, st)
                self._enhance_batcher = _MicroBatcher(
                    lambda arrs: np.asarray(fn(st.g_params, st.g_extra, jnp.asarray(arrs))),
                    self.batch_window_ms, self.max_batch,
                )
        if self.keep_aspect:
            import jax.numpy as jnp

            from uegan_tpu.infer.native import enhance_native

            fn, st = self._enhancer
            arr = np.asarray(image.convert("RGB"))[None]  # native uint8 NHWC
            out_u8 = enhance_native(
                lambda b: np.asarray(fn(st.g_params, st.g_extra, jnp.asarray(b))),
                arr,
            )[0]
        else:
            s = self.test_img_size
            arr = np.asarray(image.convert("RGB").resize((s, s), Image.BILINEAR))  # uint8
            out_u8 = self._enhance_batcher.submit(arr)
        buf = io.BytesIO()
        Image.fromarray(out_u8).save(buf, "PNG")
        return buf.getvalue()


def create_server(host: str = "0.0.0.0", port: int = 5000, **model_kw) -> ThreadingHTTPServer:
    models = _Models(**model_kw)

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/info"):
                self._json(200, {
                    "service": "uegan_tpu",
                    "endpoints": ["/api/get_scores", "/api/enhance"],
                })
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path not in ("/api/get_scores", "/api/enhance"):
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                data = self.rfile.read(length)
                image = Image.open(io.BytesIO(data))
            except Exception as e:  # bad/absent image
                self._json(400, {"error": f"invalid image: {e}"})
                return
            try:
                if self.path == "/api/get_scores":
                    self._json(200, models.nima_score(image))
                elif self.path == "/api/enhance":
                    png = models.enhance(image)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(png)))
                    self.end_headers()
                    self.wfile.write(png)
                else:
                    self._json(404, {"error": "not found"})
            except Exception as e:
                self._json(500, {"error": str(e)})

        def log_message(self, fmt, *args):  # quiet
            pass

    srv = ThreadingHTTPServer((host, port), Handler)
    srv.models = models  # observability: batcher call counts, lazy handles
    return srv


def run_server(host="0.0.0.0", port=5000, **model_kw) -> None:
    srv = create_server(host, port, **model_kw)
    print(f"uegan_tpu serving on {host}:{port}")
    srv.serve_forever()


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5000)
    p.add_argument("--nima_weights", default="")
    p.add_argument("--generator_ckpt", default="")
    p.add_argument("--test_img_size", type=int, default=512)
    p.add_argument("--quantized_inference", default="",
                   help="'' or 'int8' — opt-in int8 enhancement path")
    p.add_argument("--nima_dtype", default="float32",
                   help="float32 (reference parity) or bfloat16 (20x on v5e)")
    p.add_argument("--batch_window_ms", type=float, default=2.0,
                   help="micro-batching window: concurrent requests within it "
                        "share one device program (0 disables waiting)")
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--keep_aspect", action="store_true",
                   help="enhance at NATIVE resolution (pad to /16, crop "
                        "back) instead of the square test_img_size resize; "
                        "requests run unbatched")
    p.add_argument("--platform", default="")
    a = p.parse_args(argv)
    if a.platform:
        import jax

        jax.config.update("jax_platforms", a.platform)
    run_server(a.host, a.port, nima_weights=a.nima_weights,
               generator_ckpt=a.generator_ckpt, test_img_size=a.test_img_size,
               quantized_inference=a.quantized_inference,
               nima_dtype=a.nima_dtype, batch_window_ms=a.batch_window_ms,
               max_batch=a.max_batch, keep_aspect=a.keep_aspect)


if __name__ == "__main__":
    main()
