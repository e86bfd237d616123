"""Bilinear resize with ``align_corners=True`` parity.

The reference decoder upsamples with
``F.interpolate(scale_factor=2, mode='bilinear', align_corners=True)``
(reference: models.py:191-201).  ``jax.image.resize`` implements the
half-pixel (align_corners=False) convention, so we build the resize as two
separable interpolation matrices and contract them with einsum.  On TPU this
is a pair of MXU matmuls — typically faster than a gather-based resize, and it
shards cleanly under GSPMD when H is split across a mesh axis (the einsum
becomes a sharded matmul with an all-to-all the compiler inserts).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix_np(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Row-interpolation matrix M of shape (out_size, in_size): out = M @ in.

    Cached as NUMPY only — caching a jnp array here would capture a tracer
    when first built inside a jit trace and leak it into later traces.
    """
    m = np.zeros((out_size, in_size), dtype=np.float64)
    if in_size == 1:
        m[:, 0] = 1.0
        return m.astype(np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.maximum((np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0.0)
        src = np.minimum(src, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    m[np.arange(out_size), lo] += 1.0 - frac
    m[np.arange(out_size), hi] += frac
    return m.astype(np.float32)


@functools.lru_cache(maxsize=64)
def _interp_taps_np(in_size: int, out_size: int, align_corners: bool):
    """Per-output-row gather indices (lo, hi) and fraction for 2-tap lerp."""
    if in_size == 1:
        z = np.zeros(out_size, np.int32)
        return z, z, np.zeros(out_size, np.float32)
    if align_corners and out_size > 1:
        src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    else:
        scale = in_size / out_size
        src = np.clip((np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5, 0.0, in_size - 1)
    lo = np.minimum(np.floor(src).astype(np.int32), in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (src - lo).astype(np.float32)
    return lo, hi, frac


def _resize_axis(x: jnp.ndarray, axis: int, out_size: int, align_corners: bool) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    lo, hi, frac = _interp_taps_np(in_size, out_size, align_corners)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = jnp.asarray(frac, x.dtype).reshape(shape)
    xl = jnp.take(x, jnp.asarray(lo), axis=axis)
    xh = jnp.take(x, jnp.asarray(hi), axis=axis)
    return xl * (1.0 - f) + xh * f


def resize_bilinear_align_corners(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = True
) -> jnp.ndarray:
    """Resize an NHWC tensor with torch ``F.interpolate`` bilinear semantics.

    ``align_corners=True`` matches the reference decoder; ``False`` matches
    torch's default half-pixel convention (without antialiasing).

    Two implementations, picked per axis by size (measured on TPU v5e):
    - MXU einsum with the (out, in) interpolation matrix — wins for the
      decoder's x2 shapes (5.8ms vs 13.5ms at 256->512, C=32, B=32);
    - separable 2-tap gather+lerp — O(out) instead of O(in*out), wins for
      very large axes (high-res tiled/spatial inference).
    """
    n, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    acc = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    if max(out_h, out_w) <= _MATMUL_MAX_OUT:
        return resize_bilinear_matmul(x, out_h, out_w, align_corners)
    y = _resize_axis(x.astype(acc), 1, out_h, align_corners)
    y = _resize_axis(y, 2, out_w, align_corners)
    return y.astype(x.dtype)


_MATMUL_MAX_OUT = 1024


def resize_bilinear_matmul(
    x: jnp.ndarray, out_h: int, out_w: int, align_corners: bool = True
) -> jnp.ndarray:
    """Matmul-based variant (kept for comparison/benchmarking)."""
    n, h, w, c = x.shape
    if h == out_h and w == out_w:
        return x
    acc = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    mh = jnp.asarray(_interp_matrix_np(h, out_h, align_corners), dtype=acc)
    mw = jnp.asarray(_interp_matrix_np(w, out_w, align_corners), dtype=acc)
    prec = jax.lax.Precision.HIGHEST if acc == jnp.float32 else jax.lax.Precision.DEFAULT
    y = jnp.einsum("oh,nhwc->nowc", mh, x.astype(acc), precision=prec)
    y = jnp.einsum("pw,nowc->nopc", mw, y, precision=prec)
    return y.astype(x.dtype)


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """The reference's ``Interpolate(2, 'bilinear', True)`` (models.py:191-201)."""
    n, h, w, c = x.shape
    return resize_bilinear_align_corners(x, 2 * h, 2 * w, align_corners=True)
