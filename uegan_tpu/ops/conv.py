"""Convolution with reflect-pad semantics, without materializing the pad.

The reference pads every conv input with ``nn.ReflectionPad2d`` before the
conv (reference: models.py:80,91).  Materializing the padded tensor costs a
full HBM write + re-read of every activation; profiled on the v5e chip the
pad constructions (compare/select fusions + layout copies) were ~25% of
512px inference step time.

``conv2d_reflect`` instead runs the conv with XLA's *implicit zero padding*
(free — folded into the convolution) and then overwrites only the few border
output rows/cols whose windows touched the pad, with strips computed from
reflect-padded slabs of the input border.  The interior windows never read a
pad value, so interior results are identical math; the strips reproduce the
reflect values exactly.  The border writes are static-index
``dynamic-update-slice`` ops that XLA performs in place on the conv output.

Falls back to the materialized-pad path for dilated convs and inputs too
small for the strip geometry (e.g. the discriminator's deepest 8x8 stage).
"""

from __future__ import annotations

import os
from typing import Any

import jax.lax as lax
import jax.numpy as jnp

from uegan_tpu.ops.padding import reflect_pad_2d, same_reflect_padding

Dtype = Any

# A/B switch for benchmarking; identical numerics either way.
FUSED_PAD_CONV = os.environ.get("UEGAN_TPU_FUSED_PAD", "1") != "0"

# Measured crossover (512/1024/2048px sweeps, v5e): the fix-up strips win at
# batch >= 4 (+5..14%) but lose badly at batch 1 (-15..-45%) — XLA's batch-1
# conv specialization beats the strip/DUS plan there.  Read dynamically so
# tests can force either path.
FUSED_PAD_MIN_BATCH = int(os.environ.get("UEGAN_TPU_FUSED_PAD_MIN_BATCH", "4"))

# Trace-time flag (see skip_h_borders below): while True, conv2d_reflect
# leaves the H-border output rows zero-pad-contaminated instead of fixing
# them up.  Set only around convs whose H edges are discarded margin (the
# strip executor's slab tensors, infer/strips.py).
_SKIP_H_BORDERS = False


class skip_h_borders:
    """Context manager: trace convs with H-border fix-ups skipped.

    For slab tensors the H edges are fake (reflect-halo margin, discarded at
    reassembly) — the fix-up work and its layout copies are pure waste.  The
    flag is read at TRACE time, so it must wrap the model apply, not the
    jitted call."""

    def __enter__(self):
        import uegan_tpu.ops.conv as _self

        self._prev = _self._SKIP_H_BORDERS
        _self._SKIP_H_BORDERS = True

    def __exit__(self, *exc):
        import uegan_tpu.ops.conv as _self

        _self._SKIP_H_BORDERS = self._prev
        return False


def conv2d_nhwc(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    dtype: Dtype = jnp.float32,
    padding="VALID",
) -> jnp.ndarray:
    """Conv, NHWC x HWIO; returns ``dtype``.

    float32 mode: HIGHEST precision (the MXU otherwise silently truncates
    inputs to bf16) with f32 output.  bfloat16 mode: bf16 in/out — the MXU
    accumulates in f32 internally, and keeping the *output* bf16 keeps
    cotangents bf16 too (an f32 ``preferred_element_type`` makes the conv
    transpose see an f32 cotangent against a bf16 kernel and fail).
    """
    f32 = dtype == jnp.float32
    return lax.conv_general_dilated(
        x.astype(dtype),
        kernel.astype(dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if f32 else None,
        precision=lax.Precision.HIGHEST if f32 else lax.Precision.DEFAULT,
    )


def _flip_slice(t: jnp.ndarray, axis: int, start: int, stop: int) -> jnp.ndarray:
    idx = [slice(None)] * t.ndim
    idx[axis] = slice(start, stop)
    return jnp.flip(t[tuple(idx)], axis=axis)


def _wpad_reflect(t: jnp.ndarray, pad: int, w: int) -> jnp.ndarray:
    """Reflect-pad axis 2 (width) only; ``w`` is the full-width size of t."""
    return jnp.concatenate(
        [_flip_slice(t, 2, 1, pad + 1), t, _flip_slice(t, 2, w - 1 - pad, w - 1)], axis=2
    )


def conv2d_reflect(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: int = 1,
    dilation: int = 1,
    dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """ReflectionPad2d((k-1)//2 style) + conv, pad never materialized.

    Exactly ``conv2d_nhwc(reflect_pad_2d(x, pad), ...)`` — the self-computed
    reference padding ``(k + (k-1)(d-1) - 1)//2`` (reference: models.py:80).
    """
    k = int(kernel.shape[0])
    pad = same_reflect_padding(k, dilation)
    if pad == 0:
        return conv2d_nhwc(x, kernel, stride, dilation, dtype)
    n, h, w, _ = x.shape
    s = stride
    import uegan_tpu.ops.conv as _self

    if (
        not _self.FUSED_PAD_CONV
        or n < _self.FUSED_PAD_MIN_BATCH
        or dilation != 1
        or h < k + 2 * pad
        or w < k + 2 * pad
    ):
        return conv2d_nhwc(reflect_pad_2d(x, pad), kernel, stride, dilation, dtype)

    y = conv2d_nhwc(x, kernel, s, 1, dtype, padding=((pad, pad), (pad, pad)))
    ho, wo = y.shape[1], y.shape[2]

    conv_v = lambda t: conv2d_nhwc(t, kernel, s, 1, dtype)

    # contaminated border extents: output row i reads input rows s*i-pad ..
    # s*i-pad+k-1; top rows with window start < 0, bottom rows with window
    # end > h-1 (same for columns)
    t_top = -(-pad // s)
    i_ok_h = (h + pad - k) // s  # last row whose window is fully in range
    n_bot = ho - 1 - i_ok_h
    i_ok_w = (w + pad - k) // s
    n_right = wo - 1 - i_ok_w
    if i_ok_h + 1 < t_top or i_ok_w + 1 < t_top:  # degenerate tiny input
        return conv2d_nhwc(reflect_pad_2d(x, pad), kernel, stride, dilation, dtype)

    if t_top and not _self._SKIP_H_BORDERS:
        hi = s * (t_top - 1) - pad + k  # input rows [0, hi) feed the top strip
        slab = jnp.concatenate([_flip_slice(x, 1, 1, pad + 1), x[:, :hi]], axis=1)
        y = y.at[:, :t_top].set(conv_v(_wpad_reflect(slab, pad, w)))
    if n_bot and not _self._SKIP_H_BORDERS:
        lo = s * (i_ok_h + 1) - pad  # first input row for the bottom strip
        bot_pad = s * (ho - 1) - pad + k - h  # rows past the end, reflected
        slab = jnp.concatenate(
            [x[:, lo:], _flip_slice(x, 1, h - 1 - bot_pad, h - 1)], axis=1
        )
        y = y.at[:, ho - n_bot :].set(conv_v(_wpad_reflect(slab, pad, w)))

    # side strips cover only the rows the top/bottom strips did not
    t_left = t_top
    r0 = s * t_top - pad
    r1 = s * i_ok_h - pad + k
    mid = x[:, r0:r1]
    if t_left:
        ci = s * (t_left - 1) - pad + k  # input cols [0, ci) feed the left strip
        slab = jnp.concatenate([_flip_slice(mid, 2, 1, pad + 1), mid[:, :, :ci]], axis=2)
        y = y.at[:, t_top : i_ok_h + 1, :t_left].set(conv_v(slab))
    if n_right:
        lo_w = s * (i_ok_w + 1) - pad
        right_pad = s * (wo - 1) - pad + k - w
        slab = jnp.concatenate(
            [mid[:, :, lo_w:], _flip_slice(mid, 2, w - 1 - right_pad, w - 1)], axis=2
        )
        y = y.at[:, t_top : i_ok_h + 1, wo - n_right :].set(conv_v(slab))
    return y
