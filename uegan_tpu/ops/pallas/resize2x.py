"""Pallas kernel: bilinear x2 align-corners upsample in ONE fused pass.

The inference decoder's x2 upsamples (reference: models.py:191-201,
``F.interpolate(scale_factor=2, align_corners=True)``) are implemented in
XLA as two interpolation-matrix einsums (ops/resize.py:105-118), which is
MXU-cheap but forces big layout copies between the dots and the consuming
conv (HLO copy.182/fusion.652 etc., ~11 ms of the 216 ms 512px B=128 step
across up1..up3).

Structure this kernel exploits — for out = 2*in with align_corners=True
the source position of output row k is k*(H-1)/(2H-1), and

    floor(src(2o))   = o-1   (o >= 1;  weight on it -> 0 as o -> 0)
    floor(src(2o+1)) = o

with interpolation weights LINEAR in o:

    out[2o]   = (o/(2H-1))         * x[o-1] + (1 - o/(2H-1))    * x[o]
    out[2o+1] = (1-(H-1-o)/(2H-1)) * x[o]   + ((H-1-o)/(2H-1))  * x[o+1]

(and the same along W).  So the whole resize is a 2-tap lerp with +-1
shifts: pure VPU work — one slab read, four phase lerps via ``pltpu.roll``
(the wrapped columns carry exactly-zero weight), one write.  No matmuls,
no transposes, no layout copies.  The output block is the 6-d phase view
(N, H, 2, W, 2, C) whose row-major flattening IS (N, 2H, 2W, C).

Interpret-tested against ops/resize.py (tests/test_pallas_resize2x.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, out_ref, slab, sem, *, TH: int, H: int, W: int, C: int):
    n = pl.program_id(0)
    i = pl.program_id(1)
    nh = pl.num_programs(1)

    # slab holds x rows [i*TH - 1, i*TH + TH + 1) — one halo row each side.
    # Out-of-range halo rows carry exactly-zero lerp weight, but 0 * garbage
    # is NaN-unsafe, so zero them before the DMA.
    if nh == 1:
        slab[0:1] = jnp.zeros((1, W, C), slab.dtype)
        slab[TH + 1 :] = jnp.zeros((1, W, C), slab.dtype)
        dma = pltpu.make_async_copy(x_hbm.at[n, pl.ds(0, TH)], slab.at[pl.ds(1, TH)], sem)
        dma.start()
        dma.wait()
    else:

        @pl.when(i == 0)
        def _first():
            slab[0:1] = jnp.zeros((1, W, C), slab.dtype)
            dma = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(0, TH + 1)], slab.at[pl.ds(1, TH + 1)], sem)
            dma.start()
            dma.wait()

        @pl.when(i == nh - 1)
        def _last():
            slab[TH + 1 :] = jnp.zeros((1, W, C), slab.dtype)
            dma = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(H - TH - 1, TH + 1)], slab.at[pl.ds(0, TH + 1)], sem)
            dma.start()
            dma.wait()

        if nh > 2:

            @pl.when(jnp.logical_and(i > 0, i < nh - 1))
            def _interior():
                dma = pltpu.make_async_copy(
                    x_hbm.at[n, pl.ds(i * TH - 1, TH + 2)], slab.at[pl.ds(0, TH + 2)], sem)
                dma.start()
                dma.wait()

    rows = slab[...].astype(jnp.float32)  # (TH+2, W, C)
    oa = (i * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, 1, 1), 0)).astype(jnp.float32)
    g0 = oa / (2 * H - 1)                      # weight on x[o-1] for out row 2o
    f1 = (H - 1 - oa) / (2 * H - 1)            # weight on x[o+1] for out row 2o+1
    t0 = rows[0:TH] * g0 + rows[1 : TH + 1] * (1.0 - g0)
    t1 = rows[1 : TH + 1] * (1.0 - f1) + rows[2 : TH + 2] * f1

    q = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1).astype(jnp.float32)
    gw = q / (2 * W - 1)                       # weight on x[:, q-1] for out col 2q
    fw = (W - 1 - q) / (2 * W - 1)             # weight on x[:, q+1] for out col 2q+1
    dt = out_ref.dtype
    for e, t in ((0, t0), (1, t1)):
        # wrapped roll columns carry weight gw(0) = 0 / fw(W-1) = 0 exactly
        # (pltpu.roll wants shift >= 0: roll by W-1 == roll by -1)
        y0 = pltpu.roll(t, 1, axis=1) * gw + t * (1.0 - gw)
        y1 = t * (1.0 - fw) + pltpu.roll(t, W - 1, axis=1) * fw
        out_ref[0, :, e, :, 0, :] = y0.astype(dt)
        out_ref[0, :, e, :, 1, :] = y1.astype(dt)


def _pick_th(h: int, w: int, c: int, itemsize: int, budget: int = 10 * 1024 * 1024) -> int:
    # VMEM stack estimate per block: slab (th+2,w,c) + its f32 cast +
    # t0/t1 f32 + roll/lerp transients + the (th,2,w,2,c) output block.
    est = lambda th: (th + 2) * w * c * (itemsize + 4) + th * w * c * (24 + 4 * itemsize)
    th = h
    while th > 1 and (est(th) > budget or h % th):
        th //= 2
    return th


@functools.partial(jax.jit, static_argnames=("interpret", "th"))
def upsample2x_ac_pallas(x: jnp.ndarray, interpret: bool = False, th: int = 0) -> jnp.ndarray:
    """(N,H,W,C) -> (N,2H,2W,C), torch bilinear align_corners=True parity."""
    n, h, w, c = x.shape
    th = th or _pick_th(h, w, c, x.dtype.itemsize)
    out = pl.pallas_call(
        functools.partial(_kernel, TH=th, H=h, W=w, C=c),
        grid=(n, h // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, th, 2, w, 2, c), lambda i, j: (i, j, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, 2, w, 2, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x)
    return out.reshape(n, 2 * h, 2 * w, c)


def eligible(h: int, w: int, c: int) -> bool:
    """Tile-aligned shapes: full-lane channels, sublane-aligned W, h tileable."""
    return c % 128 == 0 and w % 8 == 0 and h >= 8 and h % _pick_th(h, w, c, 2) == 0
