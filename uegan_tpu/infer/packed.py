"""Space-to-depth packed execution of the generator's full-resolution tail.

Why: every full-res activation has C=32, which TPU tiles to 128 lanes — 4x
wasted HBM bandwidth and MXU lanes (profiled; OPTIMIZATION_NOTES.md).
Packing 2x2 spatial phases into channels ((H,W,C) -> (H/2,W/2,4C)) makes all
full-res tensors 128-channel.  Measured per-op on TPU v5e: the packed
equivalent of the 3x3 C32 conv at 512^2 runs 2.8x faster, and of the 7x7
32->3 output conv 6.3x faster — despite computing up to 4x the FLOPs,
because both bandwidth and lane utilization quadruple.

Algebra: for a stride-1 conv with kernel k (K x K, pad P = (K-1)//2), the
packed conv kernel K_p satisfies

    conv_packed(s2d(pad_reflect(x)), K_p) == s2d(conv(pad_reflect(x), k))

with packed window size S = S0+S1+1 where the packed tap s and input phase
pi for original tap u and output phase d solve 2s + pi = d + u - P.  A
stride-2 conv consuming a packed input emits an ordinary (unpacked)
half-res output with a 2x2 packed kernel.  Reflect padding in the packed
domain mixes the two row/col phases of neighboring packed rows
(``packed_reflect_pad``).

Channel layout: phase-major — packed channel index = (pi*2 + pj)*C + c.

Everything here transforms the CANONICAL parameter tree (no separate
checkpoint format); equivalence against the canonical Generator forward is
test-enforced (tests/test_packed.py).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# layout transforms
# ---------------------------------------------------------------------------
def space_to_depth(x: Array) -> Array:
    """(N,H,W,C) -> (N,H/2,W/2,4C), phase-major channels.

    Implemented WITHOUT the canonical 6-d reshape-transpose-reshape
    (bitwise-identical result): that form materializes a 6-d intermediate
    whose size-2 dims land in the tiled minor positions, which XLA
    tile-pads 64x — at 8192px the unpack alone asked for a 25.7 GB
    allocation at compile time, and even at 512px the transpose costs
    measurable layout copies (515 -> 531 img/s B=128 bf16 switching both
    pack and unpack to the rows form).  Here the W/channel pack is a free
    contiguous reshape ((pj, c) pairs are adjacent in memory) and the H
    pack is two strided row slices concatenated pi-major on channels, so
    no transpose with tiny minor dims ever exists.
    """
    n, h, w, c = x.shape
    xw = x.reshape(n, h, w // 2, 2 * c)  # (pj, c) channel pairs, contiguous
    return jnp.concatenate([xw[:, 0::2], xw[:, 1::2]], axis=-1)


def _depth_to_space_reshape(x: Array) -> Array:
    """Reshape/concat d2s (the transpose-free strategy): split the pi
    channel halves, interleave them as rows via a stacked length-2 axis
    adjacent to Hp, then split (pj, c) pairs back into W.  Kept for uint8
    tensors (the u8_out path) — TPU has no integer conv."""
    n, hp, wp, c4 = x.shape
    c2 = c4 // 2
    e, o = x[..., :c2], x[..., c2:]
    y = jnp.concatenate([e[:, :, None], o[:, :, None]], axis=2)
    return y.reshape(n, 2 * hp, 2 * wp, c2 // 2)


@functools.lru_cache(maxsize=8)
def _d2s_convT_kernel_np(c4: int) -> np.ndarray:
    """One-hot (2,2,c4,c4//4) kernel whose stride-2 transposed conv IS
    depth_to_space: packed channel k = dy*(c4/2) + dx*(c4/4) + c lands at
    output offset (dy, dx) channel c; conv_transpose taps are mirrored, so
    the hot entry sits at kernel position (1-dy, 1-dx)."""
    cq = c4 // 4
    K = np.zeros((2, 2, c4, cq), np.float32)
    for k in range(c4):
        dy, dx, c = k // (2 * cq), (k // cq) % 2, k % cq
        K[1 - dy, 1 - dx, k, c] = 1.0
    return K


def depth_to_space(x: Array) -> Array:
    """Inverse of :func:`space_to_depth`, lowered as a one-hot stride-2
    TRANSPOSED CONV for float dtypes.

    BIT-exact with the reshape form (each output element is exactly one
    input element; the other taps multiply by 0.0 and add exact zeros —
    verified bitwise in f32 and bf16), but XLA's conv emitter tiles the
    interleave far better than the reshape/copy lowering, whose tiny minor
    dims (6/3 channels) left T(·,128) tiles mostly empty: standalone
    (4,1024,1024,12) d2s 13.0 -> 6.6 ms; 2048px strip inference e2e
    19.03 -> 20.14 img/s (r4 measurement).  uint8 (u8_out path) keeps the
    reshape form."""
    if x.dtype == jnp.uint8:
        return _depth_to_space_reshape(x)
    K = jnp.asarray(_d2s_convT_kernel_np(x.shape[-1]), x.dtype)
    return jax.lax.conv_transpose(
        x, K, strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        # f32 needs HIGHEST on TPU: default-precision f32 convs run as bf16
        # passes, which would truncate mantissas and break the documented
        # bit-exactness with _depth_to_space_reshape (f32 strip executor,
        # u8-commute contracts).  bf16 keeps DEFAULT like every conv here.
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT))


# ---------------------------------------------------------------------------
# kernel transforms (numpy, applied once to the canonical params)
# ---------------------------------------------------------------------------
def _tap_ranges(k: int, pad: int) -> Tuple[int, int]:
    """Packed tap range [s_min, s_max] for original kernel size k, pad P."""
    vals = [d + u - pad for d in (0, 1) for u in range(k)]
    ss = [(v - (v & 1)) // 2 for v in vals]
    return min(ss), max(ss)


def pack_kernel_s1(kernel: np.ndarray, pad: int) -> Tuple[np.ndarray, int]:
    """Stride-1 conv kernel (K,K,Cin,Cout) -> packed kernel, plus S0.

    Packed conv: VALID over input packed-padded by S0 (lead) / S1 (trail);
    output is packed (4*Cout) phase-major.
    """
    kk, _, cin, cout = kernel.shape
    s_min, s_max = _tap_ranges(kk, pad)
    S = s_max - s_min + 1
    out = np.zeros((S, S, 4 * cin, 4 * cout), kernel.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for u in range(kk):
                for v in range(kk):
                    ri = di + u - pad
                    rj = dj + v - pad
                    pi, pj = ri & 1, rj & 1
                    si = (ri - pi) // 2 - s_min
                    sj = (rj - pj) // 2 - s_min
                    pin = (pi * 2 + pj)
                    pout = (di * 2 + dj)
                    out[si, sj, pin * cin : (pin + 1) * cin, pout * cout : (pout + 1) * cout] += kernel[u, v]
    return out, -s_min


def pack_kernel_s2(kernel: np.ndarray, pad: int) -> Tuple[np.ndarray, int]:
    """Stride-2 conv kernel -> packed kernel consuming packed input, emitting
    ordinary (unpacked) half-res output.  out[i,j] = sum_u k[u] x[2i+u-P]."""
    kk, _, cin, cout = kernel.shape
    vals = [u - pad for u in range(kk)]
    ss = [(v - (v & 1)) // 2 for v in vals]
    s_min, s_max = min(ss), max(ss)
    S = s_max - s_min + 1
    out = np.zeros((S, S, 4 * cin, cout), kernel.dtype)
    for u in range(kk):
        for v in range(kk):
            ri, rj = u - pad, v - pad
            pi, pj = ri & 1, rj & 1
            si = (ri - pi) // 2 - s_min
            sj = (rj - pj) // 2 - s_min
            pin = pi * 2 + pj
            out[si, sj, pin * cin : (pin + 1) * cin, :] += kernel[u, v]
    return out, -s_min


def pack_kernel_1x1(kernel: np.ndarray) -> np.ndarray:
    """1x1 conv (1,1,Cin,Cout) -> block-diagonal packed (1,1,4Cin,4Cout)."""
    _, _, cin, cout = kernel.shape
    out = np.zeros((1, 1, 4 * cin, 4 * cout), kernel.dtype)
    for p in range(4):
        out[0, 0, p * cin : (p + 1) * cin, p * cout : (p + 1) * cout] = kernel[0, 0]
    return out


def _interleave_perm(parts: Tuple[int, ...]) -> np.ndarray:
    """Permutation mapping kernel-input-row index -> packed-tensor channel.

    Desired kernel input order is [p, (part, c)]; the actual packed concat
    lays channels [(part, p, c)].  Shared by the numpy (inference) and
    traced (training) packers so the two layouts can never diverge.
    """
    perm = []
    offsets = np.cumsum([0] + list(parts[:-1]))
    for p in range(4):
        for part, cp in enumerate(parts):
            base = offsets[part] * 4 + p * cp
            perm.extend(range(base, base + cp))
    return np.asarray(perm)


def interleave_input_channels(packed_kernel: np.ndarray, parts: List[int]) -> np.ndarray:
    """Reorder a packed kernel's input channels from phase-major-per-part
    concat order to concat-per-phase order.

    A packed concat of tensors A (4*Ca) and B (4*Cb) lays channels as
    [A_p0..A_p3, B_p0..B_p3], but the packed kernel built from the canonical
    concat [A|B] expects [p0:(A|B), p1:(A|B), ...].  Folding the permutation
    into the kernel keeps the concat free.
    """
    total = sum(parts)
    inv = _interleave_perm(tuple(parts))
    # kernel input index i corresponds to canonical [p,(part,c)]; tensor
    # channel inv[i] holds that value -> gather kernel rows to tensor order
    out = np.zeros_like(packed_kernel)
    out[:, :, inv, :] = packed_kernel[:, :, np.arange(4 * total), :]
    return out


# ---------------------------------------------------------------------------
# differentiable kernel transforms (jnp, for packed TRAINING execution)
#
# The transforms above are linear scatters of kernel taps; expressing them as
# an einsum with a tiny constant 0/1 tensor makes them traceable, so the
# packed forward can run on the live canonical parameters inside the jitted
# train step and autodiff delivers canonical-parameter gradients through the
# packing for free.
# ---------------------------------------------------------------------------
@functools.lru_cache(maxsize=None)
def _pack_T_s1(k: int, pad: int) -> Tuple[np.ndarray, int]:
    """(S,S,4,4,K,K) 0/1 tensor: packed[si,sj,pin*C+c,pout*Q+q] =
    sum_{uv} T[si,sj,pin,pout,u,v] * kernel[u,v,c,q]."""
    s_min, s_max = _tap_ranges(k, pad)
    S = s_max - s_min + 1
    T = np.zeros((S, S, 4, 4, k, k), np.float32)
    for di in (0, 1):
        for dj in (0, 1):
            for u in range(k):
                for v in range(k):
                    ri, rj = di + u - pad, dj + v - pad
                    pi, pj = ri & 1, rj & 1
                    si = (ri - pi) // 2 - s_min
                    sj = (rj - pj) // 2 - s_min
                    T[si, sj, pi * 2 + pj, di * 2 + dj, u, v] += 1.0
    return T, -s_min


@functools.lru_cache(maxsize=None)
def _pack_T_s2(k: int, pad: int) -> Tuple[np.ndarray, int]:
    """(S,S,4,K,K) 0/1 tensor for the stride-2 consumer (unpacked output)."""
    vals = [u - pad for u in range(k)]
    ss = [(v - (v & 1)) // 2 for v in vals]
    s_min, s_max = min(ss), max(ss)
    S = s_max - s_min + 1
    T = np.zeros((S, S, 4, k, k), np.float32)
    for u in range(k):
        for v in range(k):
            ri, rj = u - pad, v - pad
            pi, pj = ri & 1, rj & 1
            si = (ri - pi) // 2 - s_min
            sj = (rj - pj) // 2 - s_min
            T[si, sj, pi * 2 + pj, u, v] += 1.0
    return T, -s_min


def pack_kernel_s1_traced(kernel: Array, pad: int) -> Array:
    """jnp version of :func:`pack_kernel_s1` (same output, differentiable)."""
    kk, _, cin, cout = kernel.shape
    T, _ = _pack_T_s1(kk, pad)
    S = T.shape[0]
    out = jnp.einsum("abipuv,uvcq->abicpq", jnp.asarray(T, kernel.dtype), kernel)
    return out.reshape(S, S, 4 * cin, 4 * cout)


def pack_kernel_s2_traced(kernel: Array, pad: int) -> Array:
    kk, _, cin, cout = kernel.shape
    T, _ = _pack_T_s2(kk, pad)
    S = T.shape[0]
    out = jnp.einsum("abiuv,uvcq->abicq", jnp.asarray(T, kernel.dtype), kernel)
    return out.reshape(S, S, 4 * cin, cout)


def pack_kernel_1x1_traced(kernel: Array) -> Array:
    _, _, cin, cout = kernel.shape
    out = jnp.einsum("ip,cq->icpq", jnp.eye(4, dtype=kernel.dtype), kernel[0, 0])
    return out.reshape(1, 1, 4 * cin, 4 * cout)


@functools.lru_cache(maxsize=None)
def _interleave_gather_idx(parts: Tuple[int, ...]) -> np.ndarray:
    """Gather indices g with out[..., j, :] = packed[..., g[j], :] equal to
    :func:`interleave_input_channels`'s scatter."""
    total = sum(parts)
    inv = _interleave_perm(parts)
    g = np.empty(4 * total, np.int64)
    g[inv] = np.arange(4 * total)
    return g


def interleave_input_channels_traced(packed_kernel: Array, parts) -> Array:
    return packed_kernel[:, :, jnp.asarray(_interleave_gather_idx(tuple(parts))), :]


# ---------------------------------------------------------------------------
# packed reflect padding
# ---------------------------------------------------------------------------
def packed_reflect_pad(x: Array, pad: int, c: int, axes=(1, 2)) -> Array:
    """Reflect-pad with ORIGINAL-domain semantics, done in the packed domain.

    Packed row m holds original rows (2m, 2m+1).  With torch-style reflect
    (no edge repeat, orig row -r == row r, row H-1+r == row H-1-r):

    - leading packed pad row -m  = (phase0 <- packed[m].phase0,
                                    phase1 <- packed[m-1].phase1)
    - trailing packed pad row L-1+m = (phase0 <- packed[L-m].phase0,
                                       phase1 <- packed[L-m-1].phase1)

    Same construction per axis, using the row-phase (pi) or col-phase (pj)
    channel groups.  ``pad`` is in packed rows (= 2 original rows).
    ``axes`` restricts the padding to a subset of the spatial axes (the
    strip executor pads W only — its slab H edges are discarded margin).
    """
    if pad == 0:
        return x
    parts = [c] if isinstance(c, int) else list(c)

    def pad_axis(t: Array, axis: int) -> Array:
        moved = jnp.moveaxis(t, axis, 1)  # (n, L, other..., 4c_total)
        L = moved.shape[1]
        phase_dim = -3 if axis == 1 else -2  # pi or pj within (..., 2, 2, c)

        def mixed(i_p0: int, i_p1: int) -> Array:
            # only the pad rows are constructed — the body is untouched, so a
            # multi-part (concatenated) tensor costs no extra full passes
            a_row, b_row = moved[:, i_p0], moved[:, i_p1]
            outs, off = [], 0
            for cp in parts:
                a = a_row[..., off : off + 4 * cp]
                b = b_row[..., off : off + 4 * cp]
                a = a.reshape(a.shape[:-1] + (2, 2, cp))
                b = b.reshape(b.shape[:-1] + (2, 2, cp))
                idx0 = (slice(None),) * (a.ndim + phase_dim) + (slice(0, 1),)
                idx1 = (slice(None),) * (b.ndim + phase_dim) + (slice(1, 2),)
                m = jnp.concatenate([a[idx0], b[idx1]], axis=phase_dim)
                outs.append(m.reshape(m.shape[:-3] + (4 * cp,)))
                off += 4 * cp
            row = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)
            return row[:, None]

        tops = [mixed(m, m - 1) for m in range(pad, 0, -1)]
        bots = [mixed(L - m, L - m - 1) for m in range(1, pad + 1)]
        out = jnp.concatenate(tops + [moved] + bots, axis=1)
        return jnp.moveaxis(out, 1, axis)

    for axis in axes:
        x = pad_axis(x, axis)
    return x


# ---------------------------------------------------------------------------
# packed conv application
# ---------------------------------------------------------------------------
def packed_conv(
    xp: Array, kp: Array, s0: int, c_in, bias: Array = None, dtype=jnp.bfloat16,
    h_fixups: bool = True, act=None,
) -> Array:
    """Conv of a packed tensor with a packed kernel, original-reflect padding
    applied in the packed domain.  ``c_in`` is the ORIGINAL channel count
    (phase group size), or a list of group sizes when ``xp`` is a
    channel-concat of separately-packed tensors (each part is padded with its
    own phase grouping).  ``bias`` is the original (Cout,) bias, applied per
    output phase group when the output is packed.

    Like ops/conv.py's ``conv2d_reflect``, the pad is never materialized when
    the shape allows: the conv runs with implicit zero padding and the border
    output rows/cols (the only windows that read a pad) are overwritten with
    strips computed from packed-reflect-padded slabs of the border.

    ``h_fixups=False`` skips the H-border fix-ups (and the corner rows of
    the W fix-ups): for the strip executor's slab tensors the H edges are
    discarded margin, and the fix-up machinery (W-pad transposes of the
    border slabs + tiny DMA copies) measured ~20%% of the 2048px step.

    ``act`` (elementwise, e.g. :func:`leaky`): applied with the bias INSIDE
    each conv (main body and border strips) rather than by the caller after
    the border DUS.  Pointwise ops commute with the DUS exactly, so the
    values are identical — but fused as a conv epilogue the activation
    stops being a separate full-tensor read+write pass (the 512px B=128
    trace showed leaky(enc1) alone as a 6.4 ms pass)."""
    from uegan_tpu.ops import conv as _convmod

    S = kp.shape[0]
    s1 = S - 1 - s0
    p = max(s0, s1)
    lp, wp = xp.shape[1], xp.shape[2]
    f32 = dtype == jnp.float32
    int8 = dtype == jnp.int8  # int8 operands, int32 accumulator output

    def _post(t):
        if bias is not None:
            cout = bias.shape[0]
            if t.shape[-1] == 4 * cout:  # packed output: bias per phase group
                b = jnp.tile(bias.astype(t.dtype), 4)
            else:
                b = bias.astype(t.dtype)
            t = t + b
        if act is not None:
            t = act(t)
        return t

    def conv_valid(t, padding="VALID"):
        return _post(lax.conv_general_dilated(
            t.astype(dtype),
            kp.astype(dtype),
            window_strides=(1, 1),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if f32 else (jnp.int32 if int8 else None),
            precision=lax.Precision.HIGHEST if f32 else lax.Precision.DEFAULT,
        ))

    m = max(s0 + s1, p + 1)  # slab depth: enough rows for pad construction
    if p == 0:
        y = conv_valid(xp)
    elif (
        _convmod.FUSED_PAD_CONV
        and xp.shape[0] >= _convmod.FUSED_PAD_MIN_BATCH
        and lp > m + 2 * p
        and wp > m + 2 * p
    ):
        y = conv_valid(xp, padding=((s0, s1), (s0, s1)))
        wslice = slice(p - s0, p + wp + s1)
        if s0 and h_fixups:
            slab = packed_reflect_pad(xp[:, :m], p, c_in)
            y = y.at[:, :s0].set(conv_valid(slab[:, p - s0 : p + s0 + s1, wslice]))
        if s1 and h_fixups:
            slab = packed_reflect_pad(xp[:, lp - m :], p, c_in)
            y = y.at[:, lp - s1 :].set(
                conv_valid(slab[:, p + m - s0 - s1 : p + m + s1, wslice])
            )
        if s0:
            slab = packed_reflect_pad(xp[:, :, :m], p, c_in,
                                      axes=(1, 2) if h_fixups else (2,))
            rows = slice(p, p + lp) if h_fixups else slice(None)
            y = y.at[:, s0 : lp - s1, :s0].set(
                conv_valid(slab[:, rows, p - s0 : p + s0 + s1])
            )
        if s1:
            slab = packed_reflect_pad(xp[:, :, wp - m :], p, c_in,
                                      axes=(1, 2) if h_fixups else (2,))
            rows = slice(p, p + lp) if h_fixups else slice(None)
            y = y.at[:, s0 : lp - s1, wp - s1 :].set(
                conv_valid(slab[:, rows, p + m - s0 - s1 : p + m + s1])
            )
    else:
        xpad = packed_reflect_pad(xp, p, c_in)
        r0 = p - s0
        y = conv_valid(xpad[:, r0 : r0 + lp + s0 + s1, r0 : r0 + wp + s0 + s1, :])
    return y if int8 else y.astype(dtype)


def leaky(x: Array) -> Array:
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def packed_resize2x_align_corners(x: Array, out_hw: Tuple[int, int]) -> Array:
    """Bilinear x2 align-corners resize emitting PACKED output directly.

    Output phase (di,dj) holds original output rows 2i+di — one einsum with
    the phase-split interpolation matrices produces all four phases with the
    phase dims adjacent to the channel dim, so the packed channel layout is
    a free reshape (the earlier 4-einsum + concat formulation cost a full
    layout copy before the consuming conv: 376 -> 389 img/s at 512px B32)."""
    from uegan_tpu.ops.resize import _interp_matrix_np

    n, h, w, c = x.shape
    oh, ow = out_hw
    mh = _interp_matrix_np(h, oh, True)  # (oh, h)
    mw = _interp_matrix_np(w, ow, True)
    prec = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    mhp = jnp.asarray(mh.reshape(oh // 2, 2, h).transpose(1, 0, 2), x.dtype)  # (2, oh/2, h)
    mwp = jnp.asarray(mw.reshape(ow // 2, 2, w).transpose(1, 0, 2), x.dtype)  # (2, ow/2, w)
    y = jnp.einsum("eoh,fpw,nhwc->nopefc", mhp, mwp, x, precision=prec)
    return y.reshape(n, oh // 2, ow // 2, 4 * c)  # phase-major: (e*2+f)*C + c


def packed_resize2x_shift(x: Array, out_hw: Tuple[int, int]) -> Array:
    """:func:`packed_resize2x_align_corners` as shifted-slice lerps — no
    interpolation-matrix einsums, no 6-d phase transpose.

    For out = 2*in align-corners the interpolation matrix is 2-tap banded
    with weights LINEAR in the row index (src(2i) = i - i/(2h-1), so phase
    e=0 mixes x[i-1], x[i] with ramp weight i/(2h-1); e=1 mixes x[i],
    x[i+1] with (h-1-i)/(2h-1); same along W).  Each packed output phase is
    therefore a row/col-ramp-weighted sum of four +-1-shifted copies of x —
    one elementwise pass, where the einsum form was staged by XLA as two
    dot products plus ~19 ms/step of layout copies at the up4 shape
    (copy.185/191/192 in the 512px B=128 trace).  Same weights as the
    matrix form; f32 arithmetic, summation order differs only in the
    separable factoring (tolerance class of the existing fusions).  Shift
    operands at the borders are clamped copies carrying exactly-zero
    weight (finite, never read into the result)."""
    n, h, w, c = x.shape
    assert out_hw == (2 * h, 2 * w), (out_hw, x.shape)
    f32 = jnp.float32
    ih = jnp.arange(h, dtype=f32)[None, :, None, None]
    iw = jnp.arange(w, dtype=f32)[None, None, :, None]
    hterm = {0: (ih / (2 * h - 1), -1), 1: ((h - 1 - ih) / (2 * h - 1), +1)}
    wterm = {0: (iw / (2 * w - 1), -1), 1: ((w - 1 - iw) / (2 * w - 1), +1)}
    xf = x.astype(f32)

    def sh(t: Array, axis: int, d: int) -> Array:
        lead = (slice(None),) * axis
        if d == -1:
            return jnp.concatenate([t[lead + (slice(0, 1),)],
                                    t[lead + (slice(0, -1),)]], axis)
        return jnp.concatenate([t[lead + (slice(1, None),)],
                                t[lead + (slice(-1, None),)]], axis)

    phases = []
    for e in (0, 1):
        we, de = hterm[e]
        xe = sh(xf, 1, de)
        for f in (0, 1):
            wf, df = wterm[f]
            p = (we * wf) * sh(xe, 2, df) + (we * (1 - wf)) * xe \
                + ((1 - we) * wf) * sh(xf, 2, df) + ((1 - we) * (1 - wf)) * xf
            phases.append(p)
    return jnp.concatenate(phases, axis=-1).astype(x.dtype)


def packed_resize2x_conv1x1(
    x: Array, kernel: Array, bias: Array, out_hw: Tuple[int, int]
) -> Array:
    """Fused bilinear x2 align-corners resize + 1x1 conv, packed output.

    One einsum contracts the two interpolation matrices AND the 1x1 kernel:
    XLA's staging contracts channels at the low-res side, so the resize
    moves q=Cout channels instead of Cin and the packed-layout copy feeding
    the conv disappears — measured 33 vs 60 ms standalone at the up4 shape
    (512px B=128).  Numerics: exact in f32; in bf16 the intermediate is
    rounded at post-conv magnitude — the same noise class as one extra bf16
    conv (the train path keeps the unfused form to preserve the loss-canary
    contract).  ``kernel`` is the CANONICAL (1,1,Cin,Cout) kernel.
    """
    from uegan_tpu.ops.resize import _interp_matrix_np

    n, h, w, c = x.shape
    oh, ow = out_hw
    mh = _interp_matrix_np(h, oh, True)
    mw = _interp_matrix_np(w, ow, True)
    prec = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    mhp = jnp.asarray(mh.reshape(oh // 2, 2, h).transpose(1, 0, 2), x.dtype)
    mwp = jnp.asarray(mw.reshape(ow // 2, 2, w).transpose(1, 0, 2), x.dtype)
    k = kernel[0, 0].astype(x.dtype)
    q = k.shape[-1]
    y = jnp.einsum("eoh,fpw,nhwc,cq->nopefq", mhp, mwp, x, k, precision=prec)
    y = y.reshape(n, oh // 2, ow // 2, 4 * q)
    return (y + jnp.tile(bias.astype(y.dtype), 4)).astype(x.dtype)


def resize2x_conv1x1(
    x: Array, kernel: Array, bias: Array, out_hw: Tuple[int, int]
) -> Array:
    """Fused bilinear x2 align-corners resize + 1x1 conv, ORDINARY output.

    Unpacked sibling of :func:`packed_resize2x_conv1x1`.  NOT WIRED: fusing
    the interior upsample1-3 stages this way measured MUCH slower e2e
    (406 vs 516 img/s at 512px B=128) — without the packed phase structure
    XLA's staging/layouts for the 4-operand einsum lose to resize-then-conv.
    Kept (and interpret-tested) as the measured record.  Exact in f32.
    """
    from uegan_tpu.ops.resize import _interp_matrix_np

    n, h, w, c = x.shape
    oh, ow = out_hw
    mh = jnp.asarray(_interp_matrix_np(h, oh, True), x.dtype)
    mw = jnp.asarray(_interp_matrix_np(w, ow, True), x.dtype)
    prec = (
        jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    k = kernel[0, 0].astype(x.dtype)
    y = jnp.einsum("oh,pw,nhwc,cq->nopq", mh, mw, x, k, precision=prec)
    return (y + bias.astype(y.dtype)).astype(x.dtype)


def compose_dec5_kernels(
    k0: np.ndarray, b0: np.ndarray, k1: np.ndarray, b1: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Fold dec5_0 (3x3 C->C) and dec5_1 (7x7 C->3) into ONE 9x9 C->3 conv.

    The output head has NO activation between its two convs (reference:
    models.py:32-36 — dec5 = [conv3x3, conv7x7, tanh]), so they compose
    linearly: K[u,v,c,o] = sum_{a+p=u, b+q=v} k0[a,b,c,m] k1[p,q,m,o] with
    pad 4, and b = b1 + sum_{pqm} k1[p,q,m,o] b0[m].  The composed conv is
    strictly cheaper in the packed domain — one (5,5,4C,12) conv replaces
    (3,3,4C,4C) + (5,5,4C,12) plus the full-size intermediate's HBM round
    trip (44.6 -> 34.6 ms at the 512px B=128 head shape, measured).

    Composition holds in the INTERIOR only: sequential reflect-pads the
    intermediate h, not the input — :func:`packed_dec5_head` overwrites the
    3-original-pixel border band with the exact sequential values.
    """
    K0 = k0.shape[0]
    K1 = k1.shape[0]
    c, o = k0.shape[2], k1.shape[3]
    out = np.zeros((K0 + K1 - 1, K0 + K1 - 1, c, o), np.float32)
    for a in range(K0):
        for b in range(K0):
            out[a : a + K1, b : b + K1] += np.einsum(
                "cm,pqmo->pqco", k0[a, b].astype(np.float64), k1.astype(np.float64)
            ).astype(np.float32)
    bias = b1.astype(np.float32) + np.einsum(
        "pqmo,m->o", k1.astype(np.float64), b0.astype(np.float64)
    ).astype(np.float32)
    return out, bias


def compose_dec5_deep_kernel(pk9: np.ndarray) -> np.ndarray:
    """Re-express the packed composed head as a STRIDE-2 conv: (5,5,4C,12)
    stride-1 on the packed tensor -> (6,6,4C,48) stride-2 emitting the
    4x-packed output (deep pixel = 2x2 packed pixels = 4x4 original).

    Why: the composed head's Cout=12 fills 12/128 MXU output lanes, so the
    (5,5,128,12) conv runs at the 128-lane cost — 34.6 ms at 512px B=128
    where its true FLOPs need ~3.3 ms.  The stride-2 form does 36/25 more
    tap-FLOPs but amortizes the lane padding over 4 output pixels:
    MXU-effective work drops 25*128 -> 36*128/4 per output pixel (2.8x).

    Derivation: deep output (i,j,P=(di,dj),oc) = packed_out[2i+di, 2j+dj, oc]
    = sum_{si,sj} pk9[si,sj,:,oc] . zpad[2i+di+si, 2j+dj+sj] with zpad the
    (S0=2)-padded input, so K6[di+si, dj+sj, :, P*12+oc] += pk9[si,sj,:,oc]
    and the stride-2 VALID conv over the same zpad reproduces it exactly
    (up to f32 summation order).  Output channel layout [P, p, rgb] is the
    two-level phase-major s2d convention, so one :func:`depth_to_space`
    returns the ordinary packed (N,Hp,Wp,12) head output.
    """
    S, _, cin4, cout = pk9.shape
    k6 = np.zeros((S + 1, S + 1, cin4, 4 * cout), pk9.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            P = di * 2 + dj
            k6[di : di + S, dj : dj + S, :, P * cout : (P + 1) * cout] += pk9
    return k6


# packed rows to overwrite with sequential values (covers the 3-original-
# pixel band where composed-reflect != sequential-reflect; also covers the
# deep stride-2 conv's zero-pad contamination, which reaches exactly
# S0=2 packed rows), and the slab depth whose fake-edge contamination
# stays outside the kept band
_DEC5_FIX = 2
_DEC5_SLAB = 6


def packed_dec5_head(
    z: Array, pk9: Array, s0_9: int, b9: Array,
    pk0: Array, s0_0: int, b0: Array, pk1: Array, s0_1: int, b1: Array,
    cd: int, dt, k6: Array = None, act=None,
) -> Array:
    """Composed dec5 head on the packed modulated tensor z = y4p * x1p,
    exact: interior from the composed 9x9 conv, the border band from the
    sequential two-conv chain on narrow slabs (full-height column slabs and
    full-width row slabs carry real reflect on their outer edges, so the
    strips — corners included — equal the canonical sequential values;
    fake interior-facing slab edges only contaminate discarded margin).

    ``k6`` (when given and the packed dims are even): the stride-2 deep
    form of the composed kernel (:func:`compose_dec5_deep_kernel`) — same
    values up to f32 summation order, 2.8x less MXU-lane-padded work.  Its
    zero-pad contamination reaches exactly the ``_DEC5_FIX`` band the
    sequential strips overwrite anyway, so no reflect fix-ups are needed."""
    r, L = _DEC5_FIX, _DEC5_SLAB
    lp, wp = z.shape[1], z.shape[2]
    if lp <= L + r or wp <= L + r:  # tiny inputs: sequential everywhere
        h = packed_conv(z, pk0, s0_0, cd, b0, dt)
        return packed_conv(h, pk1, s0_1, cd, b1, dt, act=act)
    if k6 is not None and lp % 2 == 0 and wp % 2 == 0:
        f32 = dt == jnp.float32
        yd = lax.conv_general_dilated(
            z.astype(dt), jnp.asarray(k6).astype(dt),
            window_strides=(2, 2), padding=((2, 2), (2, 2)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if f32 else None,
            precision=lax.Precision.HIGHEST if f32 else lax.Precision.DEFAULT,
        )
        yd = yd + jnp.tile(b9.astype(yd.dtype), 16)
        if act is not None:  # pointwise commutes with d2s: conv epilogue
            yd = act(yd)
        y = depth_to_space(yd.astype(dt))  # (N, lp, wp, 12)
    else:
        y = packed_conv(z, pk9, s0_9, cd, b9, dt, act=act)

    def seq(slab: Array) -> Array:
        h = packed_conv(slab, pk0, s0_0, cd, b0, dt)
        return packed_conv(h, pk1, s0_1, cd, b1, dt, act=act)

    # full-height W strips first (exact incl. corners), then full-width H
    # strips (also exact incl. corners — identical values where they overlap)
    y = y.at[:, :, :r].set(seq(z[:, :, :L])[:, :, :r])
    y = y.at[:, :, wp - r :].set(seq(z[:, :, wp - L :])[:, :, L - r :])
    y = y.at[:, :r].set(seq(z[:, :L])[:, :r])
    y = y.at[:, lp - r :].set(seq(z[:, lp - L :])[:, L - r :])
    return y


def packed_gam_stats(xp: Array, c: int, eps: float = 1e-5) -> Tuple[Array, Array]:
    """GAM mean/unbiased-std per ORIGINAL channel from a packed tensor."""
    n, hp, wp, _ = xp.shape
    acc = xp.astype(jnp.float32).reshape(n, hp, wp, 4, c)
    hw = hp * wp * 4
    mean = jnp.mean(acc, axis=(1, 2, 3))  # (n, c)
    sq = jnp.mean(acc * acc, axis=(1, 2, 3))
    var = (sq - mean * mean) * (hw / max(hw - 1, 1))
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    return mean, std


def packed_instance_norm(xp: Array, c: int, eps: float = 1e-5) -> Array:
    """Non-affine instance norm per ORIGINAL channel (biased var) on packed."""
    n, hp, wp, _ = xp.shape
    acc = xp.astype(jnp.float32).reshape(n, hp, wp, 4, c)
    # one-pass moments (see ops/norms.py)
    mean = jnp.mean(acc, axis=(1, 2, 3), keepdims=True)
    sq = jnp.mean(acc * acc, axis=(1, 2, 3), keepdims=True)
    var = jnp.maximum(sq - mean * mean, 0.0)
    y = (acc - mean) * lax.rsqrt(var + eps)
    return y.reshape(n, hp, wp, 4 * c).astype(xp.dtype)


# Measured SLOWER and removed (r3): Gram-matmul GAM-IN moments.  For
# y = conv1x1(x) the IN moments of y are exact functions of x's moments
# (mu_q = m_c K[c,q]; E[y_q^2] = K_q^T S K_q with S the phase-averaged
# second-moment matrix), so one (4C,4C) Gram matmul could replace the
# full-tensor reduce and make the norm a conv epilogue.  Implemented and
# e2e-exact (bf16 output bit-identical), but the extra pass over the conv
# INPUT costs more than the saved reduce on this stack: 512px B=128 base
# 608.3 img/s vs ga1-only 588.4 / ga1+ga2 578.7 / all sites 576.4.
def gam_norm_eval(x: Array, gp: Dict, dt) -> Array:
    """GAM with norm=True at inference: ``IN(conv1x1(x, W_x))`` exactly.

    The SE branch (global stats -> squeeze -> relu -> excite) and the fuse
    bias enter the 1x1 fuse conv as per-(image, channel) CONSTANTS —
    spatially uniform (reference: models.py:230-237, the broadcast
    ``out.expand_as(x)``).  The non-affine instance norm that follows
    (``norm=True`` at every GAM site in G) subtracts the per-channel mean
    and divides by the per-channel std, and constants neither survive the
    mean subtraction nor move the variance, so GAM(x) == IN(conv1x1(x, W_x))
    in exact arithmetic.  Dropping the dead branch at inference removes, per
    GAM, one full-tensor stats reduction, one full-tensor broadcast-add
    pass, and the SE matmuls (~15 ms of the 226 ms 512px B=128 step across
    ga1..ga5).  Training keeps the canonical module: the loss canary
    contract demands the original op sequence, and the SE params' gradient
    is exactly zero either way (in the torch reference too), so no
    trainable behavior differs.
    """
    from uegan_tpu.ops.norms import instance_norm

    c = x.shape[-1]
    kx = gp["fuse"]["kernel"][0, 0, :c, :].astype(dt)
    prec = lax.Precision.HIGHEST if dt == jnp.float32 else lax.Precision.DEFAULT
    y = jnp.einsum("nhwc,cq->nhwq", x.astype(dt), kx, precision=prec)
    return instance_norm(y)


# ---------------------------------------------------------------------------
# packed generator (inference fast path)
# ---------------------------------------------------------------------------
# single source for each packed layer's (kernel size, original pad) — used
# by the numpy packer, the traced packer, and the static s0 offsets so the
# three can never disagree
# Inference-path layout experiments (measured on TPU v5e, 512px B=128;
# flags so the A/B is reproducible — the defaults are the measured winners):
# - interior commute OFF: conv1x1-before-resize in up1..up3 measured 454
#   vs 573 img/s (the post-resize conv's layout feeds the decoder better);
# - up4 commute ON: conv1x1 (64->32ch at half-res) then the phase-split
#   packed resize measured 592 vs 573 img/s — it kills the fused 4-operand
#   einsum's two 2.15GB transpose copies (HLO copy.91/92, ~27ms/step).
def _flag(name: str, default: bool) -> bool:
    import os

    v = os.environ.get(name)
    return default if v is None else v not in ("0", "false", "False", "")


_COMMUTE_UP_INTERIOR = _flag("UEGAN_COMMUTE_UP_INTERIOR", False)  # conv1x1 before the x2 resize in up1..up3
_COMMUTE_UP4 = _flag("UEGAN_COMMUTE_UP4", True)  # same for up4 (vs the fused packed einsum)
_PALLAS_BOUNDARIES = _flag("UEGAN_PALLAS_BOUNDARIES", False)  # fused s2d/tail kernels (ops/pallas/s2d_fuse)


def _stage_set(name: str, default: frozenset) -> frozenset:
    """Env override for a per-stage flag: '0'/'' -> none, '1'/'all' -> all
    three interior up stages, else a comma list like 'upsample1,upsample3'."""
    import os

    v = os.environ.get(name)
    if v is None:
        return default
    if v in ("0", "false", "False", ""):
        return frozenset()
    if v in ("1", "true", "True", "all"):
        return frozenset({"upsample1", "upsample2", "upsample3"})
    return frozenset(s.strip() for s in v.split(",") if s.strip())


# Shift-ramp up4 resize (packed_resize2x_shift) instead of the
# interpolation-matrix einsum.  Measured SLOWER (r3): 485.7 vs 611.2 img/s
# at 512px B=128 with bit-identical bf16 output — the 12 shifted-slice
# reads of the lane-padded C=32 tensor cost more than the einsum staging's
# ~19 ms of layout copies.  OFF; kept for re-measurement.
_SHIFT_RESIZE = _flag("UEGAN_SHIFT_RESIZE", False)


# Pallas fused x2 resize (ops/pallas/resize2x) per interior up stage.
# RETIRED (r3, measured): standalone micro wins at up1 (8.4 vs 12.0 ms) and
# up3 (10.2 vs 11.6) but EVERY in-graph variant loses e2e (base 581.0 img/s
# vs up1 572.1 / up3 575.0 / up1+up3 560.9 / all 551.3 at 512px B=128) —
# the custom-call boundary forces default-layout copies, same class as
# int8_pallas.  Default empty; env hook kept for re-measurement.
_PALLAS_RESIZE = _stage_set("UEGAN_PALLAS_RESIZE", frozenset())

_PACK_PADS = {
    "enc1": (7, 3),
    "enc2": (3, 1),  # stride-2 consumer
    "dec4": (3, 1),
    "dec5_0": (3, 1),
    "dec5_1": (7, 3),
}


def pack_generator_params(params: Dict, conv_dim: int) -> Dict[str, np.ndarray]:
    """Transform the canonical Generator params' full-res kernels.

    Covers enc1, enc2 (stride-2 consumer), ga1 fuse, upsample4, dec4,
    dec5_0/dec5_1 — everything that touches 512-res tensors.  The interior
    keeps the canonical tree.
    """
    cd = conv_dim
    g = lambda *path: np.asarray(functools.reduce(lambda d, k: d[k], path, params))
    packed: Dict[str, np.ndarray] = {}
    packed["enc1_k"], packed["enc1_s0"] = pack_kernel_s1(
        g("enc1", "conv", "kernel"), _PACK_PADS["enc1"][1]
    )
    # NOTE: level-2 packing of the 256-res region (enc2->L2, ga2/dec3/up3)
    # was implemented and measured SLOWER (352.8 vs 363.2 img/s): at C=64 the
    # 4x FLOP overhead beats the 2x bandwidth saving.  The transforms
    # (pack_kernel_s2_packed / packed_conv_s2) remain available and tested.
    packed["enc2_k"], packed["enc2_s0"] = pack_kernel_s2(
        g("enc2", "conv", "kernel"), _PACK_PADS["enc2"][1]
    )
    # split fuse: only the x-part of ga1's fuse kernel is packed; the h-part
    # (spatially constant input) is applied as a per-image matmul at run time
    packed["ga1_fuse_x_k"] = pack_kernel_1x1(g("ga1", "fuse", "kernel")[:, :, :cd, :])
    packed["up4_k"] = pack_kernel_1x1(g("upsample4", "kernel"))
    # NOTE: splitting the dec concat convs (conv(concat([a,b])) == conv(a,Ka)
    # + conv(b,Kb)) was measured SLOWER (450 vs 459 img/s at 512px B128): the
    # split writes two full outputs plus an add, so HBM traffic is not reduced
    # and the border fix-up strips double.  Only the GAM fuse split (where the
    # second operand is spatially constant) pays.
    dec4_k, packed["dec4_s0"] = pack_kernel_s1(
        g("dec4", "conv", "kernel"), _PACK_PADS["dec4"][1]
    )
    packed["dec4_k"] = interleave_input_channels(dec4_k, [cd, cd])
    packed["dec5_0_k"], packed["dec5_0_s0"] = pack_kernel_s1(
        g("dec5_0", "kernel"), _PACK_PADS["dec5_0"][1]
    )
    packed["dec5_1_k"], packed["dec5_1_s0"] = pack_kernel_s1(
        g("dec5_1", "kernel"), _PACK_PADS["dec5_1"][1]
    )
    # composed output head (interior): one 9x9 conv replaces dec5_0+dec5_1
    # (see compose_dec5_kernels; borders use the sequential kernels above)
    k9, b9 = compose_dec5_kernels(
        g("dec5_0", "kernel"), g("dec5_0", "bias"),
        g("dec5_1", "kernel"), g("dec5_1", "bias"),
    )
    packed["dec5c_k"], packed["dec5c_s0"] = pack_kernel_s1(k9, 4)
    packed["dec5c_b"] = b9
    # stride-2 deep form of the composed head (full MXU lanes; see
    # compose_dec5_deep_kernel) — used when the packed dims are even
    packed["dec5d_k"] = compose_dec5_deep_kernel(packed["dec5c_k"])
    return packed


def pack_generator_params_traced(params, conv_dim: int) -> Dict[str, Array]:
    """Differentiable :func:`pack_generator_params` (jnp ops on live params).

    Used by the packed TRAINING forward: gradients flow back through the
    einsum packing to the canonical kernels.
    """
    cd = conv_dim
    g = lambda *path: functools.reduce(lambda d, k: d[k], path, params)
    packed: Dict[str, Array] = {}
    packed["enc1_k"] = pack_kernel_s1_traced(g("enc1", "conv", "kernel"), _PACK_PADS["enc1"][1])
    packed["enc2_k"] = pack_kernel_s2_traced(g("enc2", "conv", "kernel"), _PACK_PADS["enc2"][1])
    packed["ga1_fuse_x_k"] = pack_kernel_1x1_traced(g("ga1", "fuse", "kernel")[:, :, :cd, :])
    packed["up4_k"] = pack_kernel_1x1_traced(g("upsample4", "kernel"))
    packed["dec4_k"] = interleave_input_channels_traced(
        pack_kernel_s1_traced(g("dec4", "conv", "kernel"), _PACK_PADS["dec4"][1]), [cd, cd]
    )
    packed["dec5_0_k"] = pack_kernel_s1_traced(g("dec5_0", "kernel"), _PACK_PADS["dec5_0"][1])
    packed["dec5_1_k"] = pack_kernel_s1_traced(g("dec5_1", "kernel"), _PACK_PADS["dec5_1"][1])
    return packed


def packed_s0_statics() -> Dict[str, int]:
    """The (static) lead-pad offsets of each packed kernel, derived from the
    same _PACK_PADS geometry the packers use."""
    out = {}
    for name, (k, pad) in _PACK_PADS.items():
        if name == "enc2":  # stride-2 consumer: s0 from pack_kernel_s2's taps
            vals = [u - pad for u in range(k)]
            out[f"{name}_s0"] = -min((v - (v & 1)) // 2 for v in vals)
        else:
            out[f"{name}_s0"] = -_tap_ranges(k, pad)[0]
    return out


def make_packed_eval(bundle, packed: Dict[str, np.ndarray] = None,
                     l2_interior: bool = False, u8_out: bool = False):
    """Jittable packed forward: fn(params, x) -> enhanced.

    ``packed`` comes from :func:`pack_generator_params` and is closed over as
    compile-time constants (a few MB of transformed kernels); pass ``None``
    to pack the live params at trace time instead (differentiable — this is
    the TRAINING fast path).  Only valid for the default generator config
    (norm 'none', LeakyReLU, no spectral norm in G) — asserted at build
    time.  Numerical equivalence with the canonical forward is test-enforced.

    ``l2_interior`` (traced/training path only): run the half-res stage
    group — enc3 (stride-2 consumer), ga2, up3, dec3 — in a SECOND
    space-to-depth level (the Hp-grid maps packed to (Hp/2, Wp/2, 4C), C=64
    -> 256 lanes), kernels packed from the live params so autodiff flows.
    The same transform at inference measured slower (352.8 vs 363.2 img/s,
    see pack_generator_params' note); this flag exists to put the TRAINING
    claim under the same measure-or-retire bar (VERDICT r3 #5) via
    benchmarks/ab_train.py.
    """
    from uegan_tpu.models.blocks import ConvBlock, GAM, SNConv
    from uegan_tpu.ops.resize import upsample2x_align_corners

    gm = bundle.g_model
    assert gm.norm_fun == "none" and gm.act_fun == "LeakyReLU" and not gm.use_sn, (
        "packed inference supports the default generator config only"
    )
    cd = gm.conv_dim
    dt = gm.dtype
    s0s = packed_s0_statics()
    dec4_s0 = s0s["dec4_s0"]
    dec5_0_s0 = s0s["dec5_0_s0"]
    dec5_1_s0 = s0s["dec5_1_s0"]
    enc1_s0 = s0s["enc1_s0"]
    enc2_s0 = s0s["enc2_s0"]

    def block(features, k, s, name):
        return ConvBlock(
            features=features, kernel_size=k, stride=s, use_bias=True,
            norm_fun="none", act_fun="LeakyReLU", use_sn=False,
            dtype=dt, param_dtype=gm.param_dtype,
        )

    def gam(nc):
        # split_fuse: the broadcast+concat before the 1x1 fuse is replaced by
        # conv(x) + per-image matmul — exact same params, no full-size copy
        return GAM(out_nc=nc, reduction=8, use_bias=False, use_sn=False,
                   norm=True, split_fuse=True, dtype=dt, param_dtype=gm.param_dtype)

    def up(features):
        return SNConv(features=features, kernel_size=1, stride=1, use_bias=True,
                      use_sn=False, dtype=dt, param_dtype=gm.param_dtype)

    def conv1x1(xp, kp, bias, cout):
        y = lax.conv_general_dilated(
            xp.astype(dt), kp.astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if dt == jnp.float32 else None,
            precision=lax.Precision.HIGHEST if dt == jnp.float32 else lax.Precision.DEFAULT,
        )
        if bias is not None:
            y = y + jnp.tile(bias.astype(y.dtype), 4)
        return y.astype(dt)

    # inference (offline-packed kernels): the GAMs' SE branch + fuse bias are
    # constants the instance norm removes exactly — run IN(conv1x1(x, W_x))
    # only (see gam_norm_eval).  Training keeps the canonical module (canary).
    dead_se = packed is not None

    def fn(params, x):
        p = params
        pk = packed if packed is not None else pack_generator_params_traced(p, cd)

        def gam_apply(name, nc, t):
            if dead_se:
                return gam_norm_eval(t, p[name], dt)
            return gam(nc).apply({"params": p[name]}, t, update_sn=False)

        use_pallas_bound = False
        if dead_se and _PALLAS_BOUNDARIES and dt == jnp.bfloat16:
            from uegan_tpu.ops.pallas.s2d_fuse import eligible as _sf_ok

            use_pallas_bound = _sf_ok(x.shape[1] // 2, x.shape[2] // 2, x.shape[3])
        if use_pallas_bound:
            from uegan_tpu.ops.pallas.s2d_fuse import s2d_convert

            xp = s2d_convert(x)  # fused convert + s2d, one pass
        else:
            xp = space_to_depth(x.astype(dt))  # (N,H/2,W/2,12)
        x1p = packed_conv(xp, pk["enc1_k"], enc1_s0, 3,
                          p["enc1"]["conv"]["bias"], dt, act=leaky)
        x2 = packed_conv(x1p, pk["enc2_k"], enc2_s0, cd,
                         p["enc2"]["conv"]["bias"], dt, act=leaky)

        # interior at <=256^2: canonical modules on the canonical params
        # (or, under l2_interior, the Hp-grid stages in a second s2d level)
        l2 = (l2_interior and packed is None
              and x2.shape[1] % 2 == 0 and x2.shape[2] % 2 == 0)
        if l2:
            c2 = 2 * cd
            x2l = space_to_depth(x2)  # (N, Hp/2, Wp/2, 4*2cd)
            # enc3 is a stride-2 conv over the Hp grid — the same algebra as
            # enc2 one level down (packed-in, unpacked half-res out); (3,1)
            # geometry shares enc2's s0
            enc3_kp = pack_kernel_s2_traced(p["enc3"]["conv"]["kernel"],
                                            _PACK_PADS["enc2"][1])
            x3 = packed_conv(x2l, enc3_kp, enc2_s0, c2,
                             p["enc3"]["conv"]["bias"], dt, act=leaky)
        else:
            x3 = block(cd * 4, 3, 2, "enc3").apply({"params": p["enc3"]}, x2, False, False)
        x4 = block(cd * 8, 3, 2, "enc4").apply({"params": p["enc4"]}, x3, False, False)
        x5 = block(cd * 16, 3, 2, "enc5").apply({"params": p["enc5"]}, x4, False, False)
        x5 = gam_apply("ga5", cd * 16, x5)

        # Interior upsamples: fusing their resize+1x1 conv into one UNPACKED
        # einsum (resize2x_conv1x1) measured MUCH slower e2e (406 vs 516
        # img/s at 512px B=128) — unlike up4, where the packed phase
        # structure makes the fused einsum a win.
        # Interior rewrites that also measured SLOWER (512px B=128, v5e):
        # H-resize -> 1x1-as-einsum -> W-resize ("sandwich", 454 img/s) and
        # resize dots chained into a 1x1-as-einsum (456 img/s) vs 590 for
        # the conv_general form — the 1x1 staying a CONVOLUTION op is what
        # lets XLA's conv layout assignment avoid extra copies.
        def up_stage(name, feat, t):
            if dead_se and name in _PALLAS_RESIZE:
                from uegan_tpu.ops.pallas.resize2x import eligible as _rs_ok
                from uegan_tpu.ops.pallas.resize2x import upsample2x_ac_pallas

                if _rs_ok(t.shape[1], t.shape[2], t.shape[3]):
                    # INFERENCE: fused one-pass 2-tap lerp resize (pallas)
                    # feeding the canonical 1x1 conv
                    return up(feat).apply(
                        {"params": p[name]}, upsample2x_ac_pallas(t), update_sn=False
                    )
            if dead_se and _COMMUTE_UP_INTERIOR:
                # INFERENCE: the 1x1 conv commutes with the bilinear resize
                # (both linear; interpolation rows sum to 1 so the bias
                # passes through exactly) — conv at 1/4 the pixels, resize
                # moving Cout=Cin/2 channels.  Measured SLOWER (454 vs 573).
                t = up(feat).apply({"params": p[name]}, t, update_sn=False)
                return upsample2x_align_corners(t)
            return up(feat).apply(
                {"params": p[name]}, upsample2x_align_corners(t), update_sn=False
            )

        y1 = up_stage("upsample1", cd * 8, x5)
        y1 = jnp.concatenate([y1, gam_apply("ga4", cd * 8, x4)], -1)
        y1 = block(cd * 8, 3, 1, "dec1").apply({"params": p["dec1"]}, y1, False, False)

        y2 = up_stage("upsample2", cd * 4, y1)
        y2 = jnp.concatenate([y2, gam_apply("ga3", cd * 4, x3)], -1)
        y2 = block(cd * 4, 3, 1, "dec2").apply({"params": p["dec2"]}, y2, False, False)

        if l2:
            # up3 in the L2 domain: phase-split packed resize (emits the L2
            # layout directly) + block-diagonal packed 1x1 (the training
            # unfused form, mirroring the up4 path below)
            up3l = packed_resize2x(y2, (x2.shape[1], x2.shape[2]))
            up3l = conv1x1(up3l,
                           pack_kernel_1x1_traced(p["upsample3"]["kernel"]),
                           p["upsample3"]["bias"], c2)
            # ga2 with the LIVE SE branch in the L2 domain (split-fuse
            # algebra, same as the ga1 packed branch below: stats -> squeeze
            # -> excite, conv only the x-part, h as a per-image broadcast)
            mean2, std2 = packed_gam_stats(x2l, c2)
            stats2 = jnp.concatenate([mean2, std2], -1).astype(dt)
            sq2 = p["ga2"]["squeeze"]["kernel"][0, 0].astype(dt)
            ex2 = p["ga2"]["excite"]["kernel"][0, 0].astype(dt)
            h2 = jax.nn.relu(stats2 @ sq2) @ ex2
            kh2 = p["ga2"]["fuse"]["kernel"][0, 0, c2:, :].astype(dt)
            ga2l = conv1x1(
                x2l,
                pack_kernel_1x1_traced(p["ga2"]["fuse"]["kernel"][:, :, :c2, :]),
                p["ga2"]["fuse"]["bias"], c2)
            ga2l = ga2l + jnp.tile(h2 @ kh2, (1, 4))[:, None, None, :].astype(ga2l.dtype)
            ga2l = packed_instance_norm(ga2l, c2)
            d3k = interleave_input_channels_traced(
                pack_kernel_s1_traced(p["dec3"]["conv"]["kernel"],
                                      _PACK_PADS["dec4"][1]), [c2, c2])
            y3l = packed_conv(jnp.concatenate([up3l, ga2l], -1), d3k,
                              dec4_s0, [c2, c2],
                              p["dec3"]["conv"]["bias"], dt, act=leaky)
            y3 = depth_to_space(y3l)  # canonical (N, Hp, Wp, 2cd) for up4
        else:
            y3 = up_stage("upsample3", cd * 2, y2)
            y3 = jnp.concatenate([y3, gam_apply("ga2", cd * 2, x2)], -1)
            y3 = block(cd * 2, 3, 1, "dec3").apply({"params": p["dec3"]}, y3, False, False)

        # ga1 on the packed x1
        if dead_se:
            # SE branch + bias cancel in the IN (gam_norm_eval, packed form)
            ga1p = packed_instance_norm(
                conv1x1(x1p, jnp.asarray(pk["ga1_fuse_x_k"]), None, cd), cd)
        else:
            mean, std = packed_gam_stats(x1p, cd)  # (n, cd) each
            stats = jnp.concatenate([mean, std], -1).astype(dt)  # (n, 2cd)
            sq = p["ga1"]["squeeze"]["kernel"][0, 0].astype(dt)  # (2cd, cd//8)
            ex = p["ga1"]["excite"]["kernel"][0, 0].astype(dt)  # (cd//8, cd)
            h = jax.nn.relu(stats @ sq) @ ex  # (n, cd)
            # split fuse: conv only the x-part; h's contribution is a
            # per-image matmul broadcast like a bias (same for all 4 phases)
            kh = p["ga1"]["fuse"]["kernel"][0, 0, cd:, :].astype(dt)  # (cd, cd)
            ga1p = conv1x1(x1p, jnp.asarray(pk["ga1_fuse_x_k"]),
                           p["ga1"]["fuse"]["bias"], cd)
            ga1p = ga1p + jnp.tile(h @ kh, (1, 4))[:, None, None, :].astype(ga1p.dtype)
            ga1p = packed_instance_norm(ga1p, cd)

        h4, w4 = x.shape[1], x.shape[2]
        if packed is not None and _COMMUTE_UP4:
            # INFERENCE variant: 1x1 conv first (64->32ch at half-res), then
            # the phase-split packed resize on the narrowed tensor.
            up4k = p["upsample4"]["kernel"][0, 0].astype(dt)
            z4 = jnp.einsum(
                "nhwc,cq->nhwq", y3.astype(dt), up4k,
                precision=lax.Precision.HIGHEST if dt == jnp.float32
                else lax.Precision.DEFAULT,
            )
            z4 = z4 + p["upsample4"]["bias"].astype(dt)
            if _SHIFT_RESIZE and (h4, w4) == (2 * z4.shape[1], 2 * z4.shape[2]):
                up4 = packed_resize2x_shift(z4, (h4, w4))
            else:
                up4 = packed_resize2x(z4, (h4, w4))
        elif packed is not None:
            # INFERENCE: resize and the 1x1 conv fused into one einsum —
            # kills the conv's full-size read/write and the packed-layout
            # copy (see packed_resize2x_conv1x1; one extra bf16 rounding).
            # NOTE: materializing the resize then a PACKED conv (the old
            # form) measured 60 ms standalone vs 33 fused; conv-THEN-resize
            # through NHWC convs was also slower (335 vs 377 img/s) — the
            # einsum staging is what avoids both the layout copy and the
            # C=32 lane waste.
            up4 = packed_resize2x_conv1x1(
                y3, p["upsample4"]["kernel"], p["upsample4"]["bias"], (h4, w4)
            )
        else:
            # TRAINING (traced packing): keep the unfused form — the fused
            # einsum's different rounding point would move the loss canary
            # (the packed_train contract is 4-decimal stability)
            up4 = packed_resize2x(y3, (h4, w4))
            up4 = conv1x1(up4, jnp.asarray(pk["up4_k"]), p["upsample4"]["bias"], cd)
        # NOTE: splitting this conv (conv(up4,Ka)+conv(ga1p,Kb), killing the
        # concat + its 12.8 ms layout copy) measured EQUAL within noise
        # (465-466 vs 461-470 img/s): the saved copy is offset by the second
        # conv output write and doubled border strips.  Kept fused.
        y4p = packed_conv(
            jnp.concatenate([up4, ga1p], -1), pk["dec4_k"],
            dec4_s0, [cd, cd], p["dec4"]["conv"]["bias"], dt, act=leaky,
        )

        z = y4p * x1p
        if packed is not None:
            # INFERENCE: composed 9x9 head (one conv + sequential border
            # strips; exact up to f32 summation order — see
            # compose_dec5_kernels / packed_dec5_head)
            res = packed_dec5_head(
                z, pk["dec5c_k"], pk["dec5c_s0"], jnp.asarray(pk["dec5c_b"]),
                pk["dec5_0_k"], dec5_0_s0, p["dec5_0"]["bias"],
                pk["dec5_1_k"], dec5_1_s0, p["dec5_1"]["bias"], cd, dt,
                k6=pk.get("dec5d_k"), act=jnp.tanh,
            )
        else:
            # TRAINING (traced packing): keep the sequential head — the
            # composed kernel's different f32 summation order would move
            # the loss canary (same policy as the resize+conv fusion)
            h5 = packed_conv(z, pk["dec5_0_k"], dec5_0_s0,
                             cd, p["dec5_0"]["bias"], dt)
            res = jnp.tanh(packed_conv(h5, pk["dec5_1_k"], dec5_1_s0,
                                       cd, p["dec5_1"]["bias"], dt))
        if use_pallas_bound:
            from uegan_tpu.ops.pallas.s2d_fuse import residual_tail_d2s

            y = residual_tail_d2s(res, xp)  # fused add+clip+d2s, one pass
            if u8_out:
                from uegan_tpu.utils.image_io import device_quantize_u8

                y = device_quantize_u8(y)
            return y
        out = jnp.clip(res.astype(jnp.float32) + xp.astype(jnp.float32), -1.0, 1.0)
        if u8_out:
            # PNG-ready output: quantize AFTER the d2s (bit-identical to
            # quantizing the packed tensor — they commute — but the float
            # d2s takes the fast convT lowering; only the d2h fetch needs
            # the uint8 halving, and it still gets it)
            from uegan_tpu.utils.image_io import device_quantize_u8

            return device_quantize_u8(depth_to_space(out.astype(dt)))
        return depth_to_space(out.astype(dt))

    return fn


# keep the name used by forward
packed_resize2x = packed_resize2x_align_corners


def make_fast_eval(bundle, g_params, calib_batch=None, u8_output=False):
    """Best inference forward for this config: packed when eligible
    (default generator config), else the canonical eval step.

    Returns ``fn(g_params, g_extra, x)`` with the canonical signature either
    way (the packed path ignores ``g_extra`` — the default G has none).
    ``calib_batch`` (numpy/array in [-1,1]) feeds the int8 activation-range
    calibration when quantized inference is enabled — pass real images for
    production quality (the tester passes its first batch); ignored
    otherwise.

    ``u8_output``: return PNG-ready uint8 instead of [-1,1] float — the
    serving/tester fast path.  The quantize runs right after the final
    depth_to_space inside the jit (so the d2s takes the fast convT
    lowering — TPU has no integer conv — while the strip paths' chunk
    reassembly and the d2h fetch still move 1-byte pixels); bit-identical
    to quantizing the returned bf16 image.
    """
    from uegan_tpu.train.step import make_eval_step

    gm = bundle.g_model
    eligible = (
        getattr(bundle.config, "packed_inference", False)
        and gm.norm_fun == "none"
        and gm.act_fun == "LeakyReLU"
        and not gm.use_sn
    )
    if not eligible:
        base = make_eval_step(bundle)
        if not u8_output:
            return base
        from uegan_tpu.utils.image_io import device_quantize_u8

        return lambda p, e, x: device_quantize_u8(base(p, e, x))
    qi = getattr(bundle.config, "quantized_inference", "")
    strip_cfg = getattr(bundle.config, "strip_rows", 0)
    if qi in ("int8", "int8_pallas"):
        from uegan_tpu.infer.quantized import build_quant_tables, make_int8_eval

        tabs = build_quant_tables(bundle, g_params, calib_batch)
        int8_fn = make_int8_eval(bundle, g_params, use_pallas=qi == "int8_pallas",
                                 tables=tabs, u8_out=u8_output)

        def routed_q(params, extra, x):
            # huge images route to the int8 STRIP executor (same shape gate
            # as the bf16 routing below; the int8 scheme extends to the
            # strip exit chain — see strips.make_int8_strip_eval).
            # int8_pallas takes this branch too: the strip executor is
            # non-pallas, but that beats the full-image pallas path OOMing
            # on exactly the >=2048px shapes strips exist for (ADVICE r4).
            hp = x.shape[1] // 2
            if strip_cfg >= 0:
                from uegan_tpu.infer.strips import (
                    _M_EXIT, make_int8_strip_eval, pick_strip_rows)

                r = strip_cfg if strip_cfg > 0 else pick_strip_rows(hp, x.shape[0])
                if (r and hp % r == 0 and hp >= 2 * r and r % 2 == 0
                        and r > 2 * _M_EXIT):
                    chunks = getattr(bundle.config, "strip_chunks", 0)
                    return make_int8_strip_eval(bundle, tabs, r, chunks,
                                                u8_out=u8_output,
                                                entry_chunked=hp > 4096)(
                        params, extra, x)
            return int8_fn(params, extra, x)

        return routed_q
    packed = pack_generator_params(jax.device_get(g_params), gm.conv_dim)
    packed_fn = make_packed_eval(bundle, packed, u8_out=u8_output)

    def routed(params, extra, x):
        # huge images: route to the exact H-strip executor (infer/strips.py)
        # — XLA space-blocks >=1024-row conv maps and drowns in layout
        # copies (2048px: 10.7 -> ~25 img/s).  Shape is static under jit,
        # so the choice costs nothing and each input shape compiles its own
        # best path.
        hp = x.shape[1] // 2
        if strip_cfg >= 0:
            from uegan_tpu.infer.strips import make_strip_eval, pick_strip_rows

            from uegan_tpu.infer.strips import _M_EXIT

            r = strip_cfg if strip_cfg > 0 else pick_strip_rows(hp, x.shape[0])
            if (r and hp % r == 0 and hp >= 2 * r and r % 2 == 0
                    and r > 2 * _M_EXIT):
                chunks = getattr(bundle.config, "strip_chunks", 0)
                # past 8192px the resident entry slabs alone exceed HBM —
                # recompute the entry per exit chunk (strips.make_strip_eval
                # entry_chunked; bit-equal, ~2x entry FLOPs)
                return make_strip_eval(bundle, packed, r, chunks,
                                       u8_out=u8_output,
                                       entry_chunked=hp > 4096)(params, x)
        return packed_fn(params, x)

    return routed


# ---------------------------------------------------------------------------
# level-2 packing: stride-2 conv from packed input emitting packed output
# ---------------------------------------------------------------------------
def pack_kernel_s2_packed(kernel: np.ndarray, pad: int) -> Tuple[np.ndarray, int]:
    """Stride-2 conv kernel -> packed kernel consuming an s2d input and
    emitting an s2d (of the half-res output) result.

    out_orig[2i+e] = sum_u k[u] x_orig[4i+2e+u-P]; the packed conv runs with
    window stride 2 over the input's packed rows (tap s, input phase pi solve
    2s + pi = 2e + u - P).
    """
    kk, _, cin, cout = kernel.shape
    vals = [2 * e + u - pad for e in (0, 1) for u in range(kk)]
    ss = [(v - (v & 1)) // 2 for v in vals]
    s_min, s_max = min(ss), max(ss)
    S = s_max - s_min + 1
    out = np.zeros((S, S, 4 * cin, 4 * cout), kernel.dtype)
    for ei in (0, 1):
        for ej in (0, 1):
            for u in range(kk):
                for v in range(kk):
                    ri = 2 * ei + u - pad
                    rj = 2 * ej + v - pad
                    pi, pj = ri & 1, rj & 1
                    si = (ri - pi) // 2 - s_min
                    sj = (rj - pj) // 2 - s_min
                    pin = pi * 2 + pj
                    pout = ei * 2 + ej
                    out[si, sj, pin * cin : (pin + 1) * cin, pout * cout : (pout + 1) * cout] += kernel[u, v]
    return out, -s_min


def packed_conv_s2(
    xp: Array, kp: Array, s0: int, c_in, bias: Array = None, dtype=jnp.bfloat16
) -> Array:
    """Stride-2 packed conv (packed in -> packed out), reflect semantics."""
    S = kp.shape[0]
    s_max = S - 1 - s0
    p = max(s0, s_max, 0)
    lh, lw = xp.shape[1], xp.shape[2]
    xpad = packed_reflect_pad(xp, p, c_in) if p else xp
    r0 = p - s0
    need_h = lh + s0 + s_max - 1
    need_w = lw + s0 + s_max - 1
    xpad = xpad[:, r0 : r0 + need_h, r0 : r0 + need_w, :]
    f32 = dtype == jnp.float32
    y = lax.conv_general_dilated(
        xpad.astype(dtype),
        kp.astype(dtype),
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32 if f32 else None,
        precision=lax.Precision.HIGHEST if f32 else lax.Precision.DEFAULT,
    )
    if bias is not None:
        y = y + jnp.tile(bias.astype(y.dtype), 4)
    return y.astype(dtype)
