#!/usr/bin/env python
"""A/B harness for train-step variants on the chip (VERDICT r2 #4).

Measures steps/s of the jitted train step under named config overrides.
Baseline = the default Config; variants toggle the dead-backward splits
(split_percep_label / split_g_adv) and any future train levers.

Usage: python benchmarks/ab_train.py [--hw 256] [--batch 10] [--iters 10]
           [--variants base,sp,sg,sp+sg] [--remat]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # explicit both ways: the splits default ON in Config since r3
    "base": {"split_percep_label": False, "split_g_adv": False},
    "sp": {"split_percep_label": True, "split_g_adv": False},
    "sg": {"split_percep_label": False, "split_g_adv": True},
    "sp+sg": {"split_percep_label": True, "split_g_adv": True},
    "default": {},
    # packed-interior lever (VERDICT r3 #5): second s2d level on the
    # half-res stage group of the packed train forward
    "l2": {"packed_train_l2": True},
    # Polyak/EMA generator (r5): prices the in-step axpy over G's 4.16M
    # params against the default step
    "ema": {"g_ema_decay": 0.999},
}


def bench(hw: int, batch: int, iters: int, remat: bool, overrides: dict) -> float:
    import jax
    import numpy as np

    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_train_step

    cfg = Config(
        compute_dtype="bfloat16", train_batch_size=batch, remat=remat, **overrides
    )
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (hw, hw), 100)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    step = jax.jit(make_train_step(bundle), donate_argnums=(0,))
    rng = np.random.default_rng(0)
    raw = jax.device_put(rng.uniform(-1, 1, (batch, hw, hw, 3)).astype("float32"), dev)
    exp = jax.device_put(rng.uniform(-1, 1, (batch, hw, hw, 3)).astype("float32"), dev)
    state, m, _ = step(state, raw, exp)
    state, m, _ = step(state, raw, exp)
    _ = np.asarray(m["G/Total"])  # fence (remote tunnel: fetch, not block_until_ready)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m, _ = step(state, raw, exp)
    _ = np.asarray(m["G/Total"])
    return iters / (time.perf_counter() - t0)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--hw", type=int, default=256)
    p.add_argument("--batch", type=int, default=10)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--variants", type=str, default="base,sp,sg,sp+sg")
    p.add_argument("--platform", type=str, default="")
    args = p.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")

    for name in args.variants.split(","):
        sps = bench(args.hw, args.batch, args.iters, args.remat, VARIANTS[name])
        print(f"{name:8s}: {sps:6.3f} steps/s ({1000/sps:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
