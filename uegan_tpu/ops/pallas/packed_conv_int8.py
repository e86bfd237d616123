"""Pallas kernel: int8 packed conv with a fused dequant/requant epilogue.

Why this exists: XLA's int8 convolution materializes its s32 accumulator to
HBM and a separate fusion re-reads it to dequantize/requantize (profiled at
512px B=128: dec4's s32[128,256,256,128] costs ~8.6 GB of extra HBM traffic
per call), which eats most of the int8 MXU advantage — the end-to-end int8
path measured only +11% over bf16 (OPTIMIZATION_NOTES.md).  This kernel
keeps the s32 accumulator in VMEM and applies the whole epilogue before the
single HBM write:

    y_i32 = sum_taps  x_s8 @ k_s8            (MXU, int8 2x rate)
    y     = y_i32 * w_scale + bias           (per-output-channel dequant)
    y     = act(y)                           (none / leaky / tanh)
    y    *= mul_operand                      (optional, e.g. the y4*x1
                                              modulation — models.py:70
                                              in the reference)
    out   = bf16(y)  OR  s8(round(y/out_scale))   (optional requantize)

Traffic per conv drops from read(s8) + write(s32) + read(s32) + write(bf16)
[+ separate requant read/write] to read(s8) + write(out) — the fused dec4+
modulation+requant collapses what XLA runs as 4 passes into one.

Pipelining: the bulk TH input rows and the optional mul operand are
ordinary blocked BlockSpec inputs, so Pallas double-buffers their fetches
against compute automatically; only the (S-1) halo rows (a few hundred KB)
are DMA'd manually from the HBM-resident input per tile (the first manual-
DMA version of this kernel serialized the whole ~1 MB slab fetch against
compute and measured only 1.11x over the XLA chain at the dec5_0 shape).

Tap addressing is the flat-slab trick from the bf16 kernel
(ops/pallas/packed_conv.py): the slab is (1 lead + TH + halo + 1 overrun)
rows assembled in VMEM; reshaped row-major, conv tap (si, sj) is the static
slice starting at (si + 1) * W + sj - s0.  Column wrap-around only corrupts
output columns [0, s0) and [W - s1, W), which the caller's reflect border
fix-up strips overwrite anyway.  S=1 (1x1 conv) degenerates to a pure tiled
matmul with no halo/slab and is exact everywhere.

Zero-pad semantics: H pad rows are real zeros, matching the XLA fallback's
implicit zero padding, so border-row math is identical (integer conv —
interior equality is exact, test-enforced in interpret mode).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue(acc_f32, ws_ref, b_ref, os_ref, mul_block, *, act, requant,
              has_mul, TH, W, cout):
    y = acc_f32 * ws_ref[0] + b_ref[0]
    if act == "leaky":
        y = jnp.where(y >= 0, y, 0.2 * y)
    elif act == "tanh":
        y = jnp.tanh(y)
    if has_mul:
        y = y * mul_block.reshape(TH * W, cout).astype(jnp.float32)
    if requant:
        y = jnp.clip(jnp.round(y * (1.0 / os_ref[0, 0])), -127.0, 127.0)
    return y


def _kernel(x_hbm, xb_ref, kp_ref, ws_ref, b_ref, os_ref, mul_ref, out_ref,
            slab, acc, sem_t, sem_b, *,
            TH: int, W: int, S: int, s0: int, L: int, act: str,
            requant: bool, has_mul: bool):
    n = pl.program_id(0)
    i = pl.program_id(1)
    nh = pl.num_programs(1)
    s1 = S - 1 - s0
    cin = slab.shape[-1]
    cout = out_ref.shape[-1]
    rows_total = TH + S + 1  # 1 lead + s0 + TH + s1 data rows + 1 overrun

    # Halo DMAs first (tiny: s0 + s1 rows), then the bulk copy from the
    # auto-pipelined block while they fly.
    if s0:
        top = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(jnp.maximum(i * TH - s0, 0), s0)],
            slab.at[pl.ds(1, s0)],
            sem_t,
        )
        top.start()
    if s1:
        bot = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(jnp.minimum(i * TH + TH, L - s1), s1)],
            slab.at[pl.ds(1 + s0 + TH, s1)],
            sem_b,
        )
        bot.start()

    slab[0:1] = jnp.zeros((1, W, cin), slab.dtype)
    slab[rows_total - 1 :] = jnp.zeros((1, W, cin), slab.dtype)
    slab[1 + s0 : 1 + s0 + TH] = xb_ref[0]

    if s0:
        top.wait()

        @pl.when(i == 0)
        def _zero_top():
            slab[1 : 1 + s0] = jnp.zeros((s0, W, cin), slab.dtype)

    if s1:
        bot.wait()

        @pl.when(i == nh - 1)
        def _zero_bot():
            slab[1 + s0 + TH :rows_total - 1] = jnp.zeros((s1, W, cin), slab.dtype)

    flat = slab[...].reshape(rows_total * W, cin)
    acc[...] = jnp.zeros_like(acc)
    for si in range(S):
        for sj in range(S):
            d = (si + 1) * W + sj - s0
            acc[...] += jnp.dot(
                flat[d : d + TH * W, :], kp_ref[si, sj],
                preferred_element_type=jnp.int32,
            )

    y = _epilogue(acc[...].astype(jnp.float32), ws_ref, b_ref, os_ref,
                  mul_ref[0] if has_mul else None,
                  act=act, requant=requant, has_mul=has_mul,
                  TH=TH, W=W, cout=cout)
    out_ref[...] = y.reshape(1, TH, W, cout).astype(out_ref.dtype)


def _kernel_1x1(xb_ref, kp_ref, ws_ref, b_ref, os_ref, mul_ref, out_ref,
                *, TH: int, W: int, act: str, requant: bool, has_mul: bool):
    cin = xb_ref.shape[-1]
    cout = out_ref.shape[-1]
    acc = jnp.dot(
        xb_ref[0].reshape(TH * W, cin), kp_ref[0, 0],
        preferred_element_type=jnp.int32,
    )
    y = _epilogue(acc.astype(jnp.float32), ws_ref, b_ref, os_ref,
                  mul_ref[0] if has_mul else None,
                  act=act, requant=requant, has_mul=has_mul,
                  TH=TH, W=W, cout=cout)
    out_ref[...] = y.reshape(1, TH, W, cout).astype(out_ref.dtype)


def _pick_th(l: int, w: int, cin: int, cout: int, s: int, has_mul: bool,
             budget: int = 10 * 1024 * 1024) -> int:
    """Largest row tile dividing l whose buffers fit VMEM (bulk block and
    mul block are double-buffered by the pipeline, hence x2)."""
    th = l
    while th > 1:
        bulk_b = 2 * th * w * cin
        slab_b = (th + s + 1) * w * cin if s > 1 else 0
        acc_b = th * w * cout * 4
        mul_b = 2 * th * w * cout * 2 if has_mul else 0
        if bulk_b + slab_b + acc_b + mul_b <= budget and l % th == 0:
            return th
        th //= 2
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("s0", "act", "requant", "interpret", "th", "out_dtype"),
)
def packed_conv_int8_pallas(
    xp: jnp.ndarray,
    kp: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: jnp.ndarray,
    s0: int,
    act: str = "none",
    mul: Optional[jnp.ndarray] = None,
    out_scale: Optional[jnp.ndarray] = None,
    requant: bool = False,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    th: int = 0,
) -> jnp.ndarray:
    """int8 conv(xp zero-padded (s0, S-1-s0), kp, VALID) + fused epilogue.

    INTERIOR-exact for S>1: output columns [0, s0) and [W-s1, W) contain
    wrapped contributions and MUST be overwritten by the caller (the packed
    reflect border fix-up strips do).  S=1 is exact everywhere.

    xp (N, L, W, Cin) s8; kp (S, S, Cin, Cout) s8; w_scale/bias (Cout,) f32
    (already phase-tiled by the caller when the output is packed);
    mul (N, L, W, Cout) optional elementwise factor applied after the
    activation; out_scale scalar f32 — with ``requant=True`` the output is
    s8 = clip(round(y / out_scale)).
    """
    n, l, w, cin = xp.shape
    S, _, _, cout = kp.shape
    has_mul = mul is not None
    th = th or _pick_th(l, w, cin, cout, S, has_mul)
    grid = (n, l // th)
    if requant:
        out_dtype = jnp.int8
    if mul is None:
        mul = jnp.zeros((n, 1, 1, cout), jnp.bfloat16)  # placeholder, unread
    if out_scale is None:
        out_scale = jnp.ones((), jnp.float32)

    mul_spec = pl.BlockSpec(
        (1, th if has_mul else 1, w if has_mul else 1, cout),
        (lambda i, j: (i, j, 0, 0)) if has_mul else (lambda i, j: (0, 0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    common_specs = [
        pl.BlockSpec((1, th, w, cin), lambda i, j: (i, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((S, S, cin, cout), lambda i, j: (0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        mul_spec,
    ]
    args = (
        kp,
        w_scale.reshape(1, -1).astype(jnp.float32),
        bias.reshape(1, -1).astype(jnp.float32),
        out_scale.reshape(1, 1).astype(jnp.float32),
        mul,
    )
    out_spec = pl.BlockSpec(
        (1, th, w, cout), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((n, l, w, cout), out_dtype)

    if S == 1:
        kernel = functools.partial(
            _kernel_1x1, TH=th, W=w, act=act, requant=requant, has_mul=has_mul
        )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=common_specs,
            out_specs=out_spec,
            out_shape=out_shape,
            interpret=interpret,
        )(xp, *args)

    kernel = functools.partial(
        _kernel, TH=th, W=w, S=S, s0=s0, L=l, act=act,
        requant=requant, has_mul=has_mul,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + common_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((th + S + 1, w, cin), jnp.int8),
            pltpu.VMEM((th * w, cout), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp, xp, *args)


def eligible(xp_shape: Tuple[int, ...], kp_shape: Tuple[int, ...]) -> bool:
    """Shapes this kernel handles well: 128-lane channels, aligned W tiles."""
    n, l, w, cin = xp_shape
    S, _, _, cout = kp_shape
    return (
        cin % 128 == 0
        and cout % 128 == 0
        and w % 128 == 0
        and l % 8 == 0
        and l // _pick_th(l, w, cin, cout, S, False) >= 2
    )
