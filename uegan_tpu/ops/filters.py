"""Image filters kept for utility parity (reference: utils.py:158-246).

- ``gaussian_kernel2d`` / ``gaussian_smoothing``: depthwise Gaussian blur with
  reflect padding (reference GaussianSmoothing, utils.py:158-208).
- ``gaussian_noise``: additive N(mean, std) noise (reference GaussianNoise,
  utils.py:225-246) — takes an explicit PRNG key, TPU-style.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.lax as lax
import jax.numpy as jnp

from uegan_tpu.ops.padding import reflect_pad_2d


def gaussian_kernel2d(kernel_size: int = 21, sigma: float = 3.0) -> jnp.ndarray:
    """Normalized separable Gaussian window, (k, k) float32."""
    ax = np.arange(kernel_size, dtype=np.float64)
    mean = (kernel_size - 1) / 2.0
    g = np.exp(-(((ax - mean) / sigma) ** 2) / 2.0) / (sigma * np.sqrt(2 * np.pi))
    k2d = np.outer(g, g)
    return jnp.asarray(k2d / k2d.sum(), jnp.float32)


def gaussian_smoothing(x: jnp.ndarray, kernel_size: int = 21, sigma: float = 3.0) -> jnp.ndarray:
    """Depthwise Gaussian blur of an NHWC tensor with reflect padding."""
    c = x.shape[-1]
    k = gaussian_kernel2d(kernel_size, sigma)[..., None, None]  # (k,k,1,1)
    k = jnp.tile(k, (1, 1, 1, c))
    xp = reflect_pad_2d(x.astype(jnp.float32), kernel_size // 2)
    y = lax.conv_general_dilated(
        xp,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )
    return y.astype(x.dtype)


def gaussian_noise(key: jax.Array, x: jnp.ndarray, mean: float = 0.0, stddev: float = 0.1) -> jnp.ndarray:
    return x + (mean + stddev * jax.random.normal(key, x.shape, jnp.float32)).astype(x.dtype)
