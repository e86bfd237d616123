"""Multi-scale reconstruction ("identity") loss.

Parity with MultiscaleRecLoss (reference: losses.py:202-231): criterion over
3 scales produced by repeated 2x2 average pooling, weights [1, 1/2, 1/4];
criterion is l1 (default) / l2 / smoothl1 (torch SmoothL1Loss, beta=1).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from uegan_tpu.ops.pooling import avg_pool_2x2

Array = jnp.ndarray


def rec_criterion(kind: str) -> Callable[[Array, Array], Array]:
    if kind == "l1":
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if kind == "l2":
        return lambda a, b: jnp.mean((a - b) ** 2)
    if kind == "smoothl1":

        def smooth_l1(a, b):
            d = jnp.abs(a - b)
            return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))

        return smooth_l1
    raise NotImplementedError(f"Loss [{kind}] is not implemented")


def multiscale_rec_loss(
    pred: Array,
    target: Array,
    rec_loss_type: str = "l1",
    scale: int = 3,
    multiscale: bool = True,
) -> Array:
    crit = rec_criterion(rec_loss_type)
    p = pred.astype(jnp.float32)
    t = target.astype(jnp.float32)
    if not multiscale:
        return crit(p, t)
    weights = [1.0, 1.0 / 2, 1.0 / 4][:scale]
    loss = jnp.float32(0.0)
    for i, w in enumerate(weights):
        loss = loss + w * crit(p, t)
        if i != len(weights) - 1:
            p = avg_pool_2x2(p)
            t = avg_pool_2x2(t)
    return loss
