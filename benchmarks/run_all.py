#!/usr/bin/env python
"""Benchmark suite for the five BASELINE.json tracked configs.

1. 512px test inference (img/s)
2. batched NIMA eval (img/s)
3. 256px training, batch 10, full loss stack (steps/s)
4. 512px multi-scale-D training, data-parallel over the mesh (steps/s)
5. 2048px tiled/spatially-sharded inference (img/s)

Prints one JSON object per config plus a summary line.  ``bench.py`` at the
repo root remains the single-line driver entry (config #1).

Usage: python benchmarks/run_all.py [--skip 4,5] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force(x):
    import numpy as np
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf[(0,) * leaf.ndim])


def bench_inference(iters: int, hw: int = 512, batch: int = 128,
                    quantized: str = ""):
    import jax
    import numpy as np

    from uegan_tpu.config import Config
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="bfloat16", quantized_inference=quantized)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (hw, hw), 1)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    fn = jax.jit(make_fast_eval(bundle, state.g_params))
    x = jax.device_put(np.random.default_rng(0).uniform(-1, 1, (batch, hw, hw, 3)).astype("float32"), dev)
    r = fn(state.g_params, state.g_extra, x)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(state.g_params, state.g_extra, x)
    _force(r)
    return batch * iters / (time.perf_counter() - t0)


def bench_nima(iters: int, batch: int = 32, compute_dtype: str = "float32"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from uegan_tpu.metrics.nima import init_nima, nima_scores

    model, variables = init_nima(compute_dtype=compute_dtype)
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    fn = jax.jit(lambda b: nima_scores(model, variables, b))
    x = jax.device_put(np.random.default_rng(0).random((batch, 224, 224, 3)).astype("float32"), dev)
    r = fn(x)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(x)
    _force(r)
    return batch * iters / (time.perf_counter() - t0)


def bench_train(iters: int, hw: int, batch: int, remat: bool = False):
    import jax
    import numpy as np

    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_train_step
    from uegan_tpu.parallel.mesh import make_mesh
    from uegan_tpu.parallel.sharding import batch_sharding, replicated

    cfg = Config(compute_dtype="bfloat16", train_batch_size=batch, remat=remat)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (hw, hw), 100)
    mesh = make_mesh()
    state = jax.device_put(state, replicated(mesh))
    bshard = batch_sharding(mesh)
    step = jax.jit(make_train_step(bundle), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    raw = jax.device_put(rng.uniform(-1, 1, (batch, hw, hw, 3)).astype("float32"), bshard)
    exp = jax.device_put(rng.uniform(-1, 1, (batch, hw, hw, 3)).astype("float32"), bshard)
    state, m, _ = step(state, raw, exp)
    _force(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m, _ = step(state, raw, exp)
    _force(m)
    return iters / (time.perf_counter() - t0)


def bench_highres(iters: int, hw: int = 2048, batch: int = 4):
    """Config 5: native-resolution 2048px enhancement.

    make_fast_eval auto-routes huge images to the exact H-strip executor
    (infer/strips.py): 20.3 img/s at batch 4 vs 10.8 direct (XLA
    space-blocks >=1024-row conv maps and drowns in layout copies).  The
    tiled paths remain as beyond-HBM fallbacks (see infer/tiles.py,
    46x slower host-side).
    """
    import jax
    import numpy as np

    from uegan_tpu.config import Config
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (hw, hw), 1)
    dev = jax.devices()[0]
    # inference bench: keep ONLY the generator params/extra on device — the
    # D params, Adam moments and the image pool (hw-sized!) otherwise eat
    # hundreds of MB and tip the 4096px strip executor into OOM
    gp = jax.device_put(jax.device_get(state.g_params), dev)
    ge = jax.device_put(jax.device_get(state.g_extra), dev)
    fn = jax.jit(make_fast_eval(bundle, gp))
    del state
    x = jax.device_put(np.random.default_rng(0).uniform(-1, 1, (batch, hw, hw, 3)).astype("float32"), dev)
    r = fn(gp, ge, x)
    _force(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(gp, ge, x)
    _force(r)
    return batch * iters / (time.perf_counter() - t0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--skip", type=str, default="")
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--extras", action="store_true",
                   help="also run the int8 variant and the 4096/8192 "
                        "subprocess ladder (long: up to two 3600s "
                        "subprocess timeouts beyond the five headline "
                        "configs)")
    p.add_argument("--no-extras", action="store_true",
                   help=argparse.SUPPRESS)  # retired r5: extras are opt-in
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")

    skip = {int(s) for s in args.skip.split(",") if s}
    results = {}
    if 1 not in skip:
        results["1_inference_512px_img_per_s"] = round(bench_inference(args.iters), 2)
        print(json.dumps({"config": 1, "img_per_s": results["1_inference_512px_img_per_s"]}), flush=True)
    if 2 not in skip:
        # r5: bf16 is the product default (Config.nima_dtype — priced in
        # benchmarks/nima_dtype.py: |d mean| avg 0.050 vs 22.6x), so it is
        # the headline; f32 stays tracked as the reference-exact variant
        results["2_nima_eval_img_per_s"] = round(
            bench_nima(args.iters, batch=256, compute_dtype="bfloat16"), 2
        )
        print(json.dumps({"config": 2, "img_per_s": results["2_nima_eval_img_per_s"]}), flush=True)
        results["2_nima_eval_f32_img_per_s"] = round(bench_nima(args.iters), 2)
        print(json.dumps({"config": "2-f32", "img_per_s": results["2_nima_eval_f32_img_per_s"]}), flush=True)
    if 3 not in skip:
        results["3_train_256px_b10_steps_per_s"] = round(bench_train(args.iters, 256, 10), 3)
        print(json.dumps({"config": 3, "steps_per_s": results["3_train_256px_b10_steps_per_s"]}), flush=True)
    if 4 not in skip:
        results["4_train_512px_dp_steps_per_s"] = round(
            bench_train(max(2, args.iters // 2), 512, max(2, 2 * len(jax.devices())), remat=True), 3
        )
        print(json.dumps({"config": 4, "steps_per_s": results["4_train_512px_dp_steps_per_s"]}), flush=True)
    if 5 not in skip:
        results["5_highres_2048px_img_per_s"] = round(bench_highres(max(2, args.iters // 2)), 3)
        print(json.dumps({"config": 5, "img_per_s": results["5_highres_2048px_img_per_s"]}), flush=True)
    if args.extras and not args.no_extras:
        # tracked variants beyond the five headline configs: the opt-in
        # int8 full-image path and the high-res strip ladder (auto-routed
        # to the exact H-strip executor; see infer/strips.py)
        results["1_inference_512px_int8_img_per_s"] = round(
            bench_inference(args.iters, quantized="int8"), 2)
        print(json.dumps({"config": "1-int8", "img_per_s": results["1_inference_512px_int8_img_per_s"]}), flush=True)
        results["5_highres_2048px_b1_img_per_s"] = round(
            bench_highres(max(2, args.iters // 2), batch=1), 3)
        print(json.dumps({"config": "5-b1", "img_per_s": results["5_highres_2048px_b1_img_per_s"]}), flush=True)
        # 4096/8192 run in fresh subprocesses: after the five in-process
        # configs the device heap is fragmented enough that the 4096 entry
        # slabs RESOURCE_EXHAUST (measured r4); a clean process fits fine
        import subprocess

        for hw, key in ((4096, "5_highres_4096px_b1_img_per_s"),
                        (8192, "5_highres_8192px_b1_img_per_s")):
            code = (
                "import sys; sys.path.insert(0, %r); sys.argv=['x']; "
                "import jax; jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache_uegan'); "
                "from benchmarks.run_all import bench_highres; "
                "print('RESULT', round(bench_highres(%d, hw=%d, batch=1), 3))"
                % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   max(2, args.iters // (3 if hw == 8192 else 2)), hw)
            )
            out = subprocess.run([sys.executable, "-c", code],
                                 capture_output=True, text=True, timeout=3600)
            val = None
            for ln in out.stdout.splitlines():
                if ln.startswith("RESULT "):
                    val = float(ln.split()[1])
            if val is None:
                print(json.dumps({"config": f"5-{hw}", "error":
                                  out.stderr.strip()[-300:]}), flush=True)
                continue
            results[key] = val
            print(json.dumps({"config": f"5-{hw}", "img_per_s": val}), flush=True)
    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
