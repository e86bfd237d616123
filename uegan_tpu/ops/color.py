"""Color/value-range helpers."""

from __future__ import annotations

import jax.numpy as jnp


def denorm(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1] with clamping (reference: utils.py:128-130)."""
    return jnp.clip((x + 1.0) / 2.0, 0.0, 1.0)


def rgb_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    """ITU-R 601 luma, NHWC -> NHW1 (reference: utils.py:211-222)."""
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    return (0.299 * r + 0.587 * g + 0.114 * b)[..., None]


def rgb_to_ycbcr_y(img: jnp.ndarray) -> jnp.ndarray:
    """MATLAB rgb2ycbcr Y channel for [0,1] float RGB input.

    Parity with ``bgr2ycbcr(only_y=True)`` (reference: metrics/CalcPSNR.py:139-160),
    expressed for RGB channel order: Y = (65.481 R + 128.553 G + 24.966 B + 16)/255.
    """
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    return (65.481 * r + 128.553 * g + 24.966 * b + 16.0) / 255.0
