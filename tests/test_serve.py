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
