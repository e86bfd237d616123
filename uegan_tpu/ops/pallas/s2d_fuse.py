"""Pallas kernels fusing the packed path's space-to-depth boundary passes.

The packed 512px inference step spends ~9 ms/step (of 216 ms, B=128) in
XLA layout copies at its two s2d boundaries (HLO: copy.7/8/9 on the way
in, the final-clip fusion + copy.93/94 on the way out — each a separate
full-tensor pass).  Both boundaries are pure data-movement with a little
elementwise work, i.e. one-read-one-write jobs:

- ``s2d_convert``: f32 (N,H,W,3) -> bf16 packed (N,H/2,W/2,12) — the
  convert + space_to_depth (infer/packed.py:space_to_depth) in ONE pass.
- ``residual_tail_d2s``: bf16 res + xp (N,HP,WP,4C) ->
  clip(res+xp, -1, 1) in f32, cast, depth_to_space — the generator's
  global-residual tail (reference: models.py:70-72) in ONE pass.

Key layout trick shared by both: a packed row (pi phase pair) maps to two
ADJACENT original rows, so viewing the full-res tensor as
(N, H/2, 2, W*C) makes the row de/interleave a plain index on a size-2
dim — no strided slab access, no transpose with tiny minor dims.  The
(pj, c) pair regroup is a lane-granularity reshuffle the VPU does in VMEM.

Interpret-tested (tests/test_pallas_s2d.py); wired behind shape
eligibility with the jnp forms as fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_th(hp: int, row_bytes: int, budget: int = 4 * 1024 * 1024) -> int:
    th = hp
    while th > 1 and (th * row_bytes > budget or hp % th):
        th //= 2
    return max(th, 1)


def _s2d_kernel(x_ref, out_ref, *, wp: int, c: int):
    # x block (1, TH, 2, W*C) full-res dtype; out block (1, TH, WP*4C) bf16
    even = x_ref[0, :, 0, :]  # original rows 2o   -> phase pi=0
    odd = x_ref[0, :, 1, :]   # original rows 2o+1 -> phase pi=1
    th = even.shape[0]
    e = even.reshape(th, wp, 2 * c)
    o = odd.reshape(th, wp, 2 * c)
    t = jnp.concatenate([e, o], axis=-1)  # ch = pi*2C + pj*C + c
    out_ref[0] = t.reshape(th, wp * 4 * c).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "th"))
def s2d_convert(x: jnp.ndarray, interpret: bool = False, th: int = 0) -> jnp.ndarray:
    """bf16(space_to_depth(x)) in one fused pass.  x: (N,H,W,C) float."""
    n, h, w, c = x.shape
    hp, wp = h // 2, w // 2
    xv = x.reshape(n, hp, 2, w * c)
    th = th or _pick_th(hp, 2 * w * c * x.dtype.itemsize)
    out = pl.pallas_call(
        functools.partial(_s2d_kernel, wp=wp, c=c),
        grid=(n, hp // th),
        in_specs=[pl.BlockSpec((1, th, 2, w * c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, th, wp * 4 * c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, wp * 4 * c), jnp.bfloat16),
        interpret=interpret,
    )(xv)
    return out.reshape(n, hp, wp, 4 * c)


def _tail_kernel(res_ref, xp_ref, out_ref, *, wp: int, c4: int):
    # res/xp blocks (1, TH, WP*4C) bf16; out block (1, TH, 2, WP*2C) bf16
    t = res_ref[0].astype(jnp.float32) + xp_ref[0].astype(jnp.float32)
    t = jnp.clip(t, -1.0, 1.0).astype(out_ref.dtype)
    th = t.shape[0]
    c2 = c4 // 2
    t = t.reshape(th, wp, c4)
    out_ref[0, :, 0, :] = t[:, :, :c2].reshape(th, wp * c2)  # rows 2o
    out_ref[0, :, 1, :] = t[:, :, c2:].reshape(th, wp * c2)  # rows 2o+1


@functools.partial(jax.jit, static_argnames=("interpret", "th"))
def residual_tail_d2s(res: jnp.ndarray, xp: jnp.ndarray,
                      interpret: bool = False, th: int = 0) -> jnp.ndarray:
    """depth_to_space(clip(res + xp, -1, 1)) in one fused pass.

    res, xp: (N, HP, WP, 4C) bf16 (packed); returns (N, 2HP, 2WP, C) bf16.
    The add/clip runs in f32 (same rounding point as the jnp tail).
    """
    n, hp, wp, c4 = res.shape
    c2 = c4 // 2
    rv = res.reshape(n, hp, wp * c4)
    xv = xp.reshape(n, hp, wp * c4)
    th = th or _pick_th(hp, 3 * wp * c4 * 2)
    out = pl.pallas_call(
        functools.partial(_tail_kernel, wp=wp, c4=c4),
        grid=(n, hp // th),
        in_specs=[
            pl.BlockSpec((1, th, wp * c4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, wp * c4), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, 2, wp * c2), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hp, 2, wp * c2), jnp.bfloat16),
        interpret=interpret,
    )(rv, xv)
    return out.reshape(n, 2 * hp, 2 * wp, c2 // 2)


def eligible(hp: int, wp: int, c: int) -> bool:
    """Both kernels want lane-aligned flat rows and a tileable HP."""
    return (wp * 4 * c) % 128 == 0 and hp % _pick_th(hp, 3 * wp * 4 * c * 2) == 0
