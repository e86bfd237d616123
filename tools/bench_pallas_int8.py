#!/usr/bin/env python
"""Pallas int8 fused conv vs the XLA int8 chain, at production shapes."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")
except Exception:
    pass

from uegan_tpu.ops.pallas.packed_conv_int8 import packed_conv_int8_pallas


def timeit(fn, *args, iters=8):
    r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    return (time.perf_counter() - t0) / iters * 1000


def xla_chain(xq, kq, ws, b, s0, act, mul, osc, requant):
    S = kq.shape[0]
    s1 = S - 1 - s0
    y = lax.conv_general_dilated(
        xq, kq, (1, 1), ((s0, s1), (s0, s1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * ws + b
    if act == "leaky":
        y = jnp.where(y >= 0, y, 0.2 * y)
    if mul is not None:
        y = y * mul.astype(jnp.float32)
    if requant:
        return jnp.clip(jnp.round(y / osc), -127, 127).astype(jnp.int8)
    return y.astype(jnp.bfloat16)


def run(tag, n, l, w, cin, cout, S, s0, act, with_mul, requant, iters):
    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    xq = jax.device_put(rng.integers(-127, 128, (n, l, w, cin), dtype=np.int8), dev)
    kq = jax.device_put(rng.integers(-4, 5, (S, S, cin, cout), dtype=np.int8), dev)
    ws = jax.device_put(rng.uniform(1e-4, 3e-4, cout).astype(np.float32), dev)
    b = jax.device_put((rng.standard_normal(cout) * 0.1).astype(np.float32), dev)
    mul = (
        jax.device_put(rng.standard_normal((n, l, w, cout)).astype(np.float32), dev)
        .astype(jnp.bfloat16)
        if with_mul else None
    )
    osc = jnp.asarray(0.013, jnp.float32)

    f_x = jax.jit(lambda *a: xla_chain(*a, s0=s0, act=act, mul=mul, osc=osc,
                                       requant=requant))
    t_x = timeit(f_x, xq, kq, ws, b, iters=iters)

    f_p = jax.jit(lambda *a: packed_conv_int8_pallas(
        *a, s0=s0, act=act, mul=mul, out_scale=osc, requant=requant))
    t_p = timeit(f_p, xq, kq, ws, b, iters=iters)

    # numerics spot check on-chip
    gp = np.asarray(f_p(xq, kq, ws, b), np.float32)
    gx = np.asarray(f_x(xq, kq, ws, b), np.float32)
    s1 = S - 1 - s0
    sl = slice(s0, -s1 if s1 else None)
    d = np.abs(gp[:, :, sl] - gx[:, :, sl])
    rel = float((d / np.maximum(np.abs(gx[:, :, sl]), 1e-6)).max())
    print(json.dumps({
        "shape": tag, "xla_ms": round(t_x, 2), "pallas_ms": round(t_p, 2),
        "speedup": round(t_x / t_p, 2), "max_rel_interior": round(rel, 5),
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    n = args.batch
    cases = {
        "dec4_fusedmul": (n, 256, 256, 256, 128, 3, 1, "leaky", True, True),
        "dec5_0_requant": (n, 256, 256, 128, 128, 3, 1, "none", False, True),
        "up4_1x1_requant": (n, 256, 256, 256, 128, 1, 0, "none", False, True),
        "ga1_1x1_bf16": (n, 256, 256, 128, 128, 1, 0, "none", False, False),
    }
    for tag, c in cases.items():
        if args.only and args.only != tag:
            continue
        run(tag, *c, iters=args.iters)
