"""HTTP scoring service tests (stdlib server, CPU backend)."""

import http.client
import io
import json
import threading

import numpy as np
import pytest
from PIL import Image

from uegan_tpu.serve.app import create_server


@pytest.fixture(scope="module")
def server():
    srv = create_server(host="127.0.0.1", port=0, test_img_size=32)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield port
    srv.shutdown()


def _png_bytes(rng, size=64):
    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def test_info_endpoint(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("GET", "/")
    r = conn.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    assert "/api/get_scores" in body["endpoints"]


def test_get_scores(server, rng):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=600)
    conn.request("POST", "/api/get_scores", body=_png_bytes(rng))
    r = conn.getresponse()
    assert r.status == 200
    body = json.loads(r.read())
    assert 1.0 <= body["mean_score"] <= 10.0
    assert len(body["scores"]) == 10
    np.testing.assert_allclose(sum(body["scores"]), 1.0, rtol=1e-4)


def test_enhance_endpoint(server, rng):
    """POST image -> enhanced PNG at test_img_size (random-init weights;
    exercises the packed fast path inside the service)."""
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=600)
    conn.request("POST", "/api/enhance", body=_png_bytes(rng))
    r = conn.getresponse()
    assert r.status == 200
    assert r.getheader("Content-Type") == "image/png"
    img = Image.open(io.BytesIO(r.read()))
    assert img.size == (32, 32)


@pytest.mark.slow
def test_enhance_int8_mode(rng):
    """The service's --quantized_inference int8 flag routes enhancement
    through the quantized path."""
    srv = create_server(host="127.0.0.1", port=0, test_img_size=32,
                        quantized_inference="int8")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/api/enhance", body=_png_bytes(rng))
        r = conn.getresponse()
        assert r.status == 200
        img = Image.open(io.BytesIO(r.read()))
        assert img.size == (32, 32)
    finally:
        srv.shutdown()


@pytest.mark.slow
def test_enhance_serves_ema_weights(rng, tmp_path):
    """An orbax checkpoint trained with g_ema_decay carries the Polyak copy;
    the server's restore fallback must accept it (its template is EMA-less)
    and serve the AVERAGED weights, matching a direct forward with g_ema."""
    import jax
    import jax.numpy as jnp

    from uegan_tpu.config import Config
    from uegan_tpu.data.pipeline import device_normalize
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.utils.checkpoint import CheckpointManager

    cfg = Config(g_ema_decay=0.999, checkpoint_async=False)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 1)
    # make the EMA copy distinct from the live params so serving the wrong
    # tree would be detected
    state = state.replace(g_ema=jax.tree_util.tree_map(
        lambda p: p + 0.01, state.g_params))
    mgr = CheckpointManager(str(tmp_path), cfg)
    path = mgr.save(jax.device_get(state), 9)

    srv = create_server(host="127.0.0.1", port=0, test_img_size=32,
                        generator_ckpt=path)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        png = _png_bytes(rng)
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/api/enhance", body=png)
        r = conn.getresponse()
        assert r.status == 200
        got = np.asarray(Image.open(io.BytesIO(r.read())))

        # expected: the served pipeline (resize -> u8 fast path) with g_ema
        arr = np.asarray(
            Image.open(io.BytesIO(png)).convert("RGB").resize((32, 32), Image.BILINEAR)
        )[None]
        base = make_fast_eval(bundle, state.g_ema, u8_output=True)
        want = np.asarray(jax.jit(
            lambda p, e, x: base(p, e, device_normalize(x))
        )(state.g_ema, state.g_extra, jnp.asarray(arr)))[0]
        np.testing.assert_array_equal(got, want)
    finally:
        srv.shutdown()


def test_microbatcher_groups_and_orders():
    """Concurrent submits share device calls; each caller gets ITS result
    back (order-preserving distribution), padding never leaks out."""
    from uegan_tpu.serve.app import _MicroBatcher

    calls = []

    def run(arrs):
        calls.append(arrs.shape[0])
        return arrs * 2.0

    mb = _MicroBatcher(run, window_ms=200.0, max_batch=8)
    results = {}

    def worker(i):
        results[i] = mb.submit(np.full((4,), float(i), np.float32))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 6
    for i in range(6):
        np.testing.assert_array_equal(results[i], np.full((4,), 2.0 * i, np.float32))
    # 6 requests inside a 200ms window: strictly fewer device calls than
    # requests, every batch padded to a power-of-two bucket
    assert mb.calls == len(calls) and len(calls) < 6
    assert all(c in (1, 2, 4, 8) for c in calls)


def test_microbatcher_propagates_errors():
    from uegan_tpu.serve.app import _MicroBatcher

    def boom(arrs):
        raise RuntimeError("device on fire")

    mb = _MicroBatcher(boom, window_ms=1.0, max_batch=4)
    with pytest.raises(RuntimeError, match="device on fire"):
        mb.submit(np.zeros((2,), np.float32))
    # the worker survives a failed batch and serves the next one
    mb.run_batch = lambda arrs: arrs + 1.0
    np.testing.assert_array_equal(
        mb.submit(np.zeros((2,), np.float32)), np.ones((2,), np.float32)
    )


def test_concurrent_enhance_requests(server, rng):
    """Several simultaneous /api/enhance requests all come back correct
    through the micro-batched path."""
    outs = {}
    bodies = [_png_bytes(rng) for _ in range(4)]  # rng isn't thread-safe

    def hit(i):
        conn = http.client.HTTPConnection("127.0.0.1", server, timeout=600)
        conn.request("POST", "/api/enhance", body=bodies[i])
        r = conn.getresponse()
        outs[i] = (r.status, Image.open(io.BytesIO(r.read())).size)

    threads = [threading.Thread(target=hit, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert all(v == (200, (32, 32)) for v in outs.values())


def test_bad_generator_ckpt_fails_at_startup(tmp_path):
    """A typo'd --generator_ckpt must abort server construction, not serve
    random-init weights or 500 on the first request."""
    with pytest.raises(FileNotFoundError):
        create_server(host="127.0.0.1", port=0, test_img_size=32,
                      generator_ckpt=str(tmp_path / "nope_92"))


def test_invalid_image_400(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("POST", "/api/get_scores", body=b"not an image")
    r = conn.getresponse()
    assert r.status == 400
    assert "error" in json.loads(r.read())


def test_unknown_route_404(server):
    conn = http.client.HTTPConnection("127.0.0.1", server, timeout=30)
    conn.request("POST", "/api/nope", body=b"")
    r = conn.getresponse()
    assert r.status == 404


def test_enhance_keep_aspect_native_size(rng):
    """--keep_aspect serves native-resolution enhancement: a non-square,
    non-/16 input comes back at ITS OWN size, not the square resize."""
    srv = create_server(host="127.0.0.1", port=0, test_img_size=32,
                        keep_aspect=True)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        arr = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "PNG")
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        conn.request("POST", "/api/enhance", body=buf.getvalue())
        r = conn.getresponse()
        assert r.status == 200
        img = Image.open(io.BytesIO(r.read()))
        assert img.size == (56, 40)  # PIL size is (w, h)
    finally:
        srv.shutdown()
