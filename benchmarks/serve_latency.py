"""Serving latency/throughput benchmark for the HTTP enhancement service.

The serving stack (serve/app.py: stdlib ThreadingHTTPServer + cross-request
micro-batching) had throughput evidence only by proxy (the B=128 batch bench);
this measures the REAL product path end-to-end on the chip: HTTP POST of PNG
bytes -> decode -> micro-batcher -> jitted u8-I/O packed forward -> PNG
response.  Reference analog: the vendored nima Flask scorer
(metrics/NIMA/nima/inference/app.py:8-79) — one image per request, no
batching, no latency numbers published.

Reports, per scenario:
- sequential single requests: mean/p50/p95 wall latency (the lone-request
  cost: window_ms wait + device step + host PNG work)
- concurrent (N threads): achieved requests/s + per-request p50/p95 and the
  number of batched device calls the micro-batcher issued (coalescing proof)

Run:  python benchmarks/serve_latency.py [--size 512] [--threads 8]
      [--platform cpu --n 4 --size 64]   # smoke
"""

from __future__ import annotations

import argparse
import http.client
import io
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _png_bytes(rng, size):
    from PIL import Image

    arr = (rng.random((size, size, 3)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "PNG")
    return buf.getvalue()


def _request(port, body, timeout=1200):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    t0 = time.perf_counter()
    conn.request("POST", "/api/enhance", body=body)
    r = conn.getresponse()
    data = r.read()
    dt = time.perf_counter() - t0
    conn.close()
    if r.status != 200:
        raise RuntimeError(f"HTTP {r.status}: {data[:200]!r}")
    return dt, len(data)


def _pct(xs, q):
    return float(np.percentile(np.asarray(xs), q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--n", type=int, default=30, help="sequential requests")
    ap.add_argument("--threads", type=int, default=8)
    ap.add_argument("--per_thread", type=int, default=8)
    ap.add_argument("--window_ms", type=float, default=2.0)
    ap.add_argument("--platform", default="")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    else:
        import jax
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_test_cache" if args.platform == "cpu"
                      else "/tmp/jax_cache_uegan")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    from uegan_tpu.serve.app import create_server

    # max_batch = threads so the concurrent scenario can coalesce fully, and
    # only the power-of-two buckets up to it ever compile
    srv = create_server(host="127.0.0.1", port=0, test_img_size=args.size,
                        batch_window_ms=args.window_ms,
                        max_batch=max(1, args.threads))
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    body = _png_bytes(rng, args.size)

    # warmup: compile bucket-1, then the concurrent buckets; first D2H over
    # the remote tunnel also pays its ~70 s handshake here
    print(f"=== warmup (compiling buckets; size {args.size}) ===", flush=True)
    _request(port, body)
    warm_threads = []
    for _ in range(args.threads):
        t = threading.Thread(target=_request, args=(port, body))
        t.start()
        warm_threads.append(t)
    for t in warm_threads:
        t.join()
    _request(port, body)

    # --- sequential singles ---
    lat = []
    for _ in range(args.n):
        dt, _ = _request(port, body)
        lat.append(dt)
    seq = {
        "n": args.n,
        "mean_ms": round(1e3 * float(np.mean(lat)), 1),
        "p50_ms": round(1e3 * _pct(lat, 50), 1),
        "p95_ms": round(1e3 * _pct(lat, 95), 1),
    }
    print(f"=== sequential: {seq} ===", flush=True)

    # --- concurrent ---
    results: list = []
    errs: list = []

    def worker():
        for _ in range(args.per_thread):
            try:
                results.append(_request(port, body)[0])
            except Exception as e:  # pragma: no cover
                errs.append(str(e))

    batcher = srv.models._enhance_batcher
    calls0 = batcher.calls if batcher else 0
    t0 = time.perf_counter()
    ts = [threading.Thread(target=worker) for _ in range(args.threads)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    wall = time.perf_counter() - t0
    total = args.threads * args.per_thread
    conc = {
        "batched_device_calls": (batcher.calls - calls0) if batcher else None,
        "threads": args.threads,
        "requests": total,
        "errors": len(errs),
        "wall_s": round(wall, 2),
        "req_per_s": round(total / wall, 2),
        "p50_ms": round(1e3 * _pct(results, 50), 1) if results else None,
        "p95_ms": round(1e3 * _pct(results, 95), 1) if results else None,
    }
    print(f"=== concurrent: {conc} ===", flush=True)

    record = {
        "size": args.size,
        "window_ms": args.window_ms,
        "platform": __import__("jax").devices()[0].platform,
        "sequential": seq,
        "concurrent": conc,
        "note": "random-init weights (identical compute to trained); "
                "1-core host does all PNG encode/decode + HTTP",
    }
    if args.out:
        with open(args.out, "w") as f:
            json.dump(record, f, indent=1)
        print(f"=== record written to {args.out} ===")
    print(json.dumps(record))
    srv.shutdown()


if __name__ == "__main__":
    main()
