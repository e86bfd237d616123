#!/usr/bin/env python
"""Measure int8 packed inference vs bf16 packed at 512px on the local chip."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")
except Exception:
    pass

from uegan_tpu.config import Config
from uegan_tpu.infer.packed import make_fast_eval
from uegan_tpu.train.state import create_train_state

BATCH = int(os.environ.get("B", "128"))
HW = int(os.environ.get("HW", "512"))
WARMUP, ITERS = 3, 4


def run(tag: str, cfg: Config) -> float:
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (HW, HW), 1)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    fn = jax.jit(make_fast_eval(bundle, state.g_params))
    x = jax.device_put(
        np.random.default_rng(0).uniform(-1, 1, (BATCH, HW, HW, 3)).astype(np.float32), dev
    )
    r = None
    for _ in range(WARMUP):
        r = fn(state.g_params, state.g_extra, x)
    _ = np.asarray(r[0, :1, :1, 0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        r = fn(state.g_params, state.g_extra, x)
    _ = np.asarray(r[0, :1, :1, 0])
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt
    print(json.dumps({"path": tag, "img_per_sec": round(ips, 1), "batch": BATCH, "hw": HW}))
    return ips


if __name__ == "__main__":
    only = os.environ.get("ONLY", "")
    results = {}
    for tag, qi in (("bf16_packed", ""), ("int8_packed", "int8"),
                    ("int8_pallas", "int8_pallas")):
        if only and only != tag:
            continue
        results[tag] = run(tag, Config(compute_dtype="bfloat16",
                                       quantized_inference=qi))
    if "bf16_packed" in results:
        base = results["bf16_packed"]
        print(json.dumps({f"speedup_{k}_over_bf16": round(v / base, 3)
                          for k, v in results.items() if k != "bf16_packed"}))
