#!/usr/bin/env python
"""Benchmark: 512px UEGAN-generator inference throughput on the local chip.

Prints ONE JSON line {metric, value, unit, vs_baseline}.

Baseline: the reference publishes no speed numbers (BASELINE.md) — its
north-star is ">=5x A100-PyTorch images/sec at 512px FiveK inference".  The
A100 PyTorch number is not measurable here (no GPU); we anchor on an
estimated 120 images/s for the reference fp32 PyTorch generator at 512px on
one A100 (≈68 GFLOPs/image, ~25% utilization at TF32 plus the reference's
per-image python save loop).  ``vs_baseline`` = ours / 120.
"""

from __future__ import annotations

import json
import time

A100_PYTORCH_IMG_PER_SEC_EST = 120.0
BATCH = 8
HW = 512
WARMUP = 3
ITERS = 10


def main() -> None:
    import jax
    import jax.numpy as jnp

    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (HW, HW), steps_per_epoch=1)
    eval_fn = jax.jit(make_eval_step(bundle))

    x = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, HW, HW, 3), minval=-1.0, maxval=1.0)
    for _ in range(WARMUP):
        eval_fn(state.g_params, state.g_extra, x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        eval_fn(state.g_params, state.g_extra, x).block_until_ready()
    dt = time.perf_counter() - t0
    ips = BATCH * ITERS / dt

    print(json.dumps({
        "metric": "images_per_sec_512px_inference",
        "value": round(ips, 2),
        "unit": "img/s/chip",
        "vs_baseline": round(ips / A100_PYTORCH_IMG_PER_SEC_EST, 3),
    }))


if __name__ == "__main__":
    main()
