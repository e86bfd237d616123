"""Pooling ops (NHWC)."""

from __future__ import annotations

import jax.lax as lax
import jax.numpy as jnp


def avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool, ``count_include_pad=False`` semantics.

    Used by the multiscale reconstruction loss (reference: losses.py:214).
    Torch's AvgPool2d(2, 2) never pads, so for any input the window is always
    fully inside the tensor and a plain reduce_window average is exact (odd
    trailing rows/cols are dropped, matching floor division).
    """
    n, h, w, c = x.shape
    acc = x.astype(jnp.float32)
    s = lax.reduce_window(
        acc, 0.0, lax.add, (1, 2, 2, 1), (1, 2, 2, 1), padding="VALID"
    )
    return (s / 4.0).astype(x.dtype)


def avg_pool(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """General VALID average pool (used by MobileNetV2's global pool)."""
    acc = x.astype(jnp.float32)
    s = lax.reduce_window(
        acc, 0.0, lax.add, (1, window, window, 1), (1, stride, stride, 1), padding="VALID"
    )
    return (s / float(window * window)).astype(x.dtype)
