"""Auxiliary losses kept for capability parity.

- ``tv_loss``      total-variation smoothness (reference: losses.py:167-184;
                   unused by the reference train loop but part of its API)
- ``angular_loss`` mean angular error in degrees (reference: losses.py:187-199)
- ``emd_loss``     squared earth-mover's distance over score distributions,
                   used to train NIMA (reference:
                   metrics/NIMA/nima/nima/train/emd_loss.py:6-18)
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def tv_loss(x: Array, weight: float = 1.0) -> Array:
    """x is NHWC; matches torch TVLoss normalization (per-sample counts)."""
    n, h, w, c = x.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = jnp.sum((x[:, 1:, :, :] - x[:, : h - 1, :, :]) ** 2)
    w_tv = jnp.sum((x[:, :, 1:, :] - x[:, :, : w - 1, :]) ** 2)
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w) / n


def angular_loss(f1: Array, f2: Array, eps_bound: float = 0.999999) -> Array:
    """Mean arccos of channel-wise cosine similarity, in degrees (NHWC)."""
    num = jnp.sum(f1 * f2, axis=-1)
    den = jnp.linalg.norm(f1, axis=-1) * jnp.linalg.norm(f2, axis=-1)
    cos = jnp.clip(num / jnp.maximum(den, 1e-8), -eps_bound, eps_bound)
    return jnp.mean(jnp.arccos(cos)) * 180.0 / jnp.pi


def emd_loss(p_target: Array, p_pred: Array, r: int = 2) -> Array:
    """Squared EMD between per-image score distributions, shape (N, buckets)."""
    cdf_t = jnp.cumsum(p_target, axis=-1)
    cdf_p = jnp.cumsum(p_pred, axis=-1)
    per_image = jnp.sqrt(jnp.mean((cdf_t - cdf_p) ** 2, axis=-1))
    return jnp.mean(per_image)
