"""Pallas kernel: stride-1 packed conv + bias + activation, zero-pad.

The packed generator tail's convs (infer/packed.py) are memory-bound: XLA's
conv runs them at ~250 GB/s effective HBM bandwidth (profiled: dec4
[32,256,256,256]x[3,3,256,128] takes 6.4 ms for 1.6 GB of traffic).  This
kernel streams TH-row slabs (with an (S-1)-row halo) HBM->VMEM once,
computes the S^2 channel matmuls on the MXU with an f32 accumulator, applies
bias + activation, and writes the output tile — one read + one write of the
tensor.

Key trick — the flat-slab tap addressing: the slab is (TH + S + 1, W, Cin)
with the data starting at row 1 and NO W padding (W stays lane/sublane
aligned — the remote Mosaic compiler crashes on scratch buffers with
unaligned second-minor dims).  Reshaped row-major to ((TH+S+1)*W, Cin), the
conv tap (si, sj) is exactly the static slice starting at
``(si + 1) * W + sj - s0``: row-major flattening turns a (row, col) shift
into a single flat shift.  Column wrap-around at row boundaries only
corrupts output columns [0, s0) and [W-s1, W) — precisely the columns whose
windows read the W pad, and the caller's reflect border fix-up strips
overwrite those anyway (`packed_conv`'s fused path), so no masking is
needed.  The H pad rows are zeroed in the slab (zero padding = the exact
semantics the XLA path uses before its own border fix-up).

Only used when shapes qualify (`eligible`); callers fall back to `lax.conv`.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, kp_ref, b_ref, out_ref, slab, acc, sem, *,
            TH: int, W: int, S: int, s0: int, L: int, act: str):
    n = pl.program_id(0)
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    s1 = S - 1 - s0
    halo = S - 1
    cin = slab.shape[-1]
    cout = out_ref.shape[-1]
    rows_total = TH + S + 1  # 1 lead + TH + halo data rows + 1 flat-overrun

    # rows a DMA may not cover: the lead row (flat-underrun guard), the
    # trailing (s1 + 1) rows (zero-pad bottom + flat-overrun guard), and the
    # top s0 pad rows on the first block.  Zero BEFORE the DMA — interior
    # blocks re-fill the real halo rows.
    slab[0:1] = jnp.zeros((1, W, cin), slab.dtype)
    slab[1 + TH + s0 :] = jnp.zeros((s1 + 1, W, cin), slab.dtype)

    if s0:

        @pl.when(i == 0)
        def _zero_top():
            slab[1 : 1 + s0] = jnp.zeros((s0, W, cin), slab.dtype)

    # DMA input rows [i*TH - s0, i*TH + TH - 1 + s1] clamped to [0, L).
    # Static-size variants; impossible branches are not traced.
    if nh > 2:

        @pl.when(jnp.logical_and(i > 0, i < nh - 1))
        def _dma_interior():
            dma = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(i * TH - s0, TH + halo)],
                slab.at[pl.ds(1, TH + halo)],
                sem,
            )
            dma.start()
            dma.wait()

    @pl.when(i == 0)
    def _dma_first():
        rows = TH + (s1 if nh > 1 else 0)
        dma = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(0, rows)],
            slab.at[pl.ds(1 + s0, rows)],
            sem,
        )
        dma.start()
        dma.wait()

    if nh > 1:

        @pl.when(i == nh - 1)
        def _dma_last():
            rows = TH + s0
            dma = pltpu.make_async_copy(
                x_hbm.at[n, pl.ds(L - rows, rows)],
                slab.at[pl.ds(1, rows)],
                sem,
            )
            dma.start()
            dma.wait()

    flat = slab[...].reshape(rows_total * W, cin)
    acc[...] = jnp.zeros_like(acc)
    for si in range(S):
        for sj in range(S):
            d = (si + 1) * W + sj - s0
            acc[...] += jnp.dot(
                flat[d : d + TH * W, :], kp_ref[si, sj],
                preferred_element_type=jnp.float32,
            )

    y = acc[...] + b_ref[0].astype(jnp.float32)
    if act == "leaky":
        y = jnp.where(y >= 0, y, 0.2 * y)
    elif act == "tanh":
        y = jnp.tanh(y)
    out_ref[...] = y.reshape(1, TH, W, cout).astype(out_ref.dtype)


def _pick_th(l: int, w: int, cin: int, s: int, cout: int = 128,
             budget: int = 6 * 1024 * 1024) -> int:
    """Largest row tile dividing l whose slab + accumulator fit VMEM."""
    th = l
    while th > 1:
        slab_b = (th + s + 1) * w * cin * 2
        acc_b = th * w * cout * 4
        if slab_b + acc_b <= budget and l % th == 0:
            return th
        th //= 2
    return 1


@functools.partial(jax.jit, static_argnames=("s0", "act", "interpret", "th"))
def packed_conv_pallas(
    xp: jnp.ndarray,
    kp: jnp.ndarray,
    bias: jnp.ndarray,
    s0: int,
    act: str = "none",
    interpret: bool = False,
    th: int = 0,
) -> jnp.ndarray:
    """conv(xp zero-padded (s0, S-1-s0) both axes, kp, VALID) + bias + act.

    INTERIOR-exact: output columns [0, s0) and [W-s1, W) contain wrapped
    contributions and MUST be overwritten by the caller (the reflect border
    fix-up strips do).  All rows are exact (H pads are real zeros).

    xp (N, L, W, Cin); kp (S, S, Cin, Cout); bias (Cout,) already
    phase-tiled by the caller when the output is packed.  ``th`` overrides
    the automatic row tile (tests force multi-block grids with it).
    """
    n, l, w, cin = xp.shape
    S, _, _, cout = kp.shape
    th = th or _pick_th(l, w, cin, S, cout)
    grid = (n, l // th)
    return pl.pallas_call(
        functools.partial(_kernel, TH=th, W=w, S=S, s0=s0, L=l, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((S, S, cin, cout), lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, l, w, cout), xp.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + S + 1, w, cin), xp.dtype),
            pltpu.VMEM((th * w, cout), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, kp, bias.reshape(1, -1))


def eligible(xp_shape: Tuple[int, ...], kp_shape: Tuple[int, ...]) -> bool:
    """Shapes this kernel handles well: 128-lane channels, aligned W tiles."""
    n, l, w, cin = xp_shape
    S, _, _, cout = kp_shape
    return (
        cin % 128 == 0
        and cout % 128 == 0
        and w % 128 == 0
        and l % 8 == 0
        and l // _pick_th(l, w, cin, S, cout) >= 2
    )
