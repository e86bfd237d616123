"""Exact H-strip execution of the packed forward for huge images.

Why: XLA space-blocks spatial ops once feature maps reach ~1024^2 rows, and
the blocked<->linear layout copies then dominate — profiled at 2048px B=4
on v5e, 80.5% of device time was copy/layout and the direct forward ran
10.7 img/s, while the identical pixel count in <=512-row pieces ran 25-28
2048-equivalents/s (probe: (4,2048,2048) 10.7 / (16,1024,1024) 25.4 /
(16,512,2048) 25.4 / (32,512,1024) 27.8 / (64,512,512) 27.9).

How: EVERY full-height stage runs on a batch of overlapping row strips —
nothing at full height is ever materialized except the packed input and the
final output.  Strip slabs carry a reflect-extended halo — the entry chain
(enc1..enc3) uses halo ``_M_ENTRY`` wide enough that the exit chain's slabs
(halo ``_M_EXIT``) are plain SLICES of the entry outputs, not re-gathers.
Each conv contaminates at most its own receptive reach at the fake slab
edges, the margins cover the cumulative reach, and the contaminated margin
is discarded at reassembly, so the result is EXACT (test-enforced against
the direct packed forward).  W is never cut (the probe shows row extent
triggers the blocking), so packed_conv's W-border reflect fix-ups stay
correct.

Global-extent ops stay exact inside the strip chain:
- ga1/ga2 SE vectors and instance-norm moments are reduced ACROSS the strip
  batch over interior rows only (each pixel counted exactly once) — the
  strips of one image all live in the same batched tensor, so "global" is
  just a different reduction axis;
- the up3/up4 x2-resizes cross strip boundaries by one row, handled with
  per-strip (banded, for up3) slices of the global align-corners
  interpolation matrix stacked into one batched einsum.

This is the single-chip analog of the GSPMD spatial sharding in
infer/spatial.py (same halo idea, batch dimension instead of mesh axis),
covering the reference's missing native high-res story (the reference
force-resized everything to 512^2 — data_loader.py:95-101).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from uegan_tpu.infer.packed import (
    depth_to_space,
    leaky,
    pack_generator_params,
    packed_conv,
    packed_reflect_pad,
    packed_s0_statics,
    space_to_depth,
)
from uegan_tpu.ops.conv import skip_h_borders
from uegan_tpu.ops.resize import _interp_matrix_np

Array = jnp.ndarray

# Entry halo (packed rows): enc1 (7x7 packed, reach 2) + enc2 (3x3, reach 1)
# cost 3 rows of contamination; 10 leaves >=7 valid halo rows on x1/x2 so the
# exit chain's halo-6 slabs are SLICES of the entry slabs (no full-height
# re-gather).  Must be EVEN so enc3's stride-2 grid aligns with the full map.
_M_ENTRY = 10
# exit: dec3 (1) + up4 resize (1) + dec4 (1) + dec5_0 (1) + dec5_1 (7x7, 2)
_M_EXIT = 6


def pick_strip_rows(hp: int, n: int = 4, target: int = 128) -> int:
    """Packed strip rows for a Hp-row packed image of batch n; 0 = don't strip.

    Strips pay off once XLA starts space-blocking (~1024 packed rows); the
    strip height must divide Hp and leave room for the halos.  Small batches
    halve the strip height until the slab count n*(hp/r) reaches ~8 — the
    strip batch has to feed the MXU on its own (measured at 2048px batch 1:
    r=128 15.6 img/s vs r=256 10.8).  Default 128: best at batch 4 too
    (19.7 vs 19.3/19.5 for 256/512; 64 loses, 18.7 — halo overhead).
    """
    if hp < 1024:
        return 0
    r = 0
    if hp % target == 0:
        r = target
    else:
        for d in range(target, 4 * _M_EXIT, -16):
            if hp % d == 0:
                r = d
                break
    while r and n * (hp // r) < 8 and r % 2 == 0 and (r // 2) > 2 * _M_EXIT:
        r //= 2
    return r


def _pad_rows_top_bot(x: Array, pad: int):
    """Torch-reflect H pad rows for a canonical NHWC tensor."""
    return x[:, 1 : pad + 1][:, ::-1], x[:, -pad - 1 : -1][:, ::-1]


def _packed_pad_rows_top_bot(x: Array, pad: int, c):
    """Torch-reflect H pad rows for a PACKED tensor (phase-aware).

    Built by padding only a (pad+1)-row slice with packed_reflect_pad and
    slicing its W pads off — the slice is tiny, so the both-axis helper's
    extra W work is negligible.
    """
    top = packed_reflect_pad(x[:, : pad + 1], pad, c)[:, :pad, pad:-pad]
    bot = packed_reflect_pad(x[:, -pad - 1 :], pad, c)[:, -pad:, pad:-pad]
    return top, bot


def _slabs(x: Array, s: int, r: int, m: int, packed_c=None) -> Array:
    """Overlapping strip slabs with reflect-extended edges.

    (N, S*R, W, C) -> (N*S, R+2M, W, C), N-major strip order.  Interior
    halos are real rows; the first/last slab use torch-reflect pad rows
    (phase-aware when ``packed_c`` gives the packed phase group size(s)).
    Avoids materializing a padded full map — only the 2M pad rows are built.
    """
    n, hp, w, c = x.shape
    if packed_c is None:
        top, bot = _pad_rows_top_bot(x, m)
    else:
        top, bot = _packed_pad_rows_top_bot(x, m, packed_c)
    parts = []
    for i in range(s):
        lo, hi = i * r - m, (i + 1) * r + m
        piece = x[:, max(lo, 0) : min(hi, hp)]
        if lo < 0:
            piece = jnp.concatenate([top[:, lo + m :], piece], axis=1)
        if hi > hp:
            piece = jnp.concatenate([piece, bot[:, : hi - hp]], axis=1)
        parts.append(piece)
    return jnp.stack(parts, axis=1).reshape(n * s, r + 2 * m, w, c)


def _unslab(y: Array, n: int, s: int) -> Array:
    """(N*S, R, W, C) -> (N, S*R, W, C)."""
    ns, r, w, c = y.shape
    return y.reshape(n, s, r, w, c).reshape(n, s * r, w, c)


@functools.lru_cache(maxsize=16)
def _strip_resize_matrices(hp: int, s: int, r: int, m: int):
    """Per-strip slices of the phase-split x2 align-corners H matrix (up4).

    Global matrix mhp[e, o, h] (o, h in packed rows; see
    packed_resize2x_conv1x1).  Strip slab output row j maps to global row
    sR-M+j; entries whose source column falls outside the slab are zeroed —
    they only occur for margin rows, which are discarded.
    """
    mh = _interp_matrix_np(hp, 2 * hp, True)  # (2hp, hp)
    mhp = mh.reshape(hp, 2, hp).transpose(1, 0, 2)  # (2, hp, hp)
    hs = r + 2 * m
    out = np.zeros((s, 2, hs, hs), np.float32)
    for i in range(s):
        base = i * r - m
        for j in range(hs):
            o = min(max(base + j, 0), hp - 1)
            lo, hi = max(base, 0), min(base + hs, hp)
            out[i, :, j, lo - base : hi - base] = mhp[:, o, lo:hi]
    return out


@functools.lru_cache(maxsize=16)
def _strip_up3_matrices(hp: int, s: int, r: int, m: int):
    """Banded per-strip H matrices for the up3 stage (hp//2 -> hp rows).

    Strip slab output row j maps to global output row clamp(sR-M+j) (clamped
    rows are margin rows, discarded after dec3).  Each strip's rows only read
    a ~(R/2+M)-wide band of source rows, so the matrices carry just that
    window — returns (mats (s, R+2M, win), window starts, win).  Dropping
    the all-zero columns outside the band is exact.
    """
    h2 = hp // 2
    mh = _interp_matrix_np(h2, hp, True)  # (hp, h2)
    hs = r + 2 * m
    rows = [np.clip(np.arange(i * r - m, i * r - m + hs), 0, hp - 1) for i in range(s)]
    bands = []
    for i in range(s):
        nz = np.nonzero(mh[rows[i]].any(axis=0))[0]
        bands.append((int(nz[0]), int(nz[-1])))
    win = min(max(b - a + 1 for a, b in bands), h2)
    starts = tuple(min(a, h2 - win) for a, _ in bands)
    mats = np.stack([mh[rows[i], starts[i] : starts[i] + win] for i in range(s)])
    return mats.astype(np.float32), starts, win


def make_strip_eval(bundle, packed: Dict[str, np.ndarray], strip_rows: int):
    """Jittable strip-wise packed forward: fn(params, x) -> enhanced.

    Same contract and numerics as make_packed_eval's fn (exactness is
    test-enforced); only valid for the default generator config and for
    inputs whose packed height is a multiple of ``strip_rows`` with
    ``strip_rows > 2 * _M_EXIT``.
    """
    from uegan_tpu.models.blocks import ConvBlock, GAM, SNConv
    from uegan_tpu.ops.resize import upsample2x_align_corners

    gm = bundle.g_model
    assert gm.norm_fun == "none" and gm.act_fun == "LeakyReLU" and not gm.use_sn, (
        "strip inference supports the default generator config only"
    )
    cd = gm.conv_dim
    dt = gm.dtype
    s0s = packed_s0_statics()
    r = strip_rows
    assert r > 2 * _M_EXIT and r % 2 == 0

    def block(features, k, stride):
        return ConvBlock(features=features, kernel_size=k, stride=stride,
                         use_bias=True, norm_fun="none", act_fun="LeakyReLU",
                         use_sn=False, dtype=dt, param_dtype=gm.param_dtype)

    def gam(nc):
        return GAM(out_nc=nc, reduction=8, use_bias=False, use_sn=False,
                   norm=True, split_fuse=True, dtype=dt, param_dtype=gm.param_dtype)

    def up(features):
        return SNConv(features=features, kernel_size=1, stride=1, use_bias=True,
                      use_sn=False, dtype=dt, param_dtype=gm.param_dtype)

    def conv1x1(xp, kp, bias):
        y = jax.lax.conv_general_dilated(
            xp.astype(dt), jnp.asarray(kp).astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if dt == jnp.float32 else None,
            precision=jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT,
        )
        return (y + jnp.tile(bias.astype(y.dtype), 4)).astype(dt)

    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32
            else jax.lax.Precision.DEFAULT)
    eps = 1e-5

    def interior_moments(ts, n, s, off, phases, c):
        """Per-(image, ORIGINAL channel) f32 mean and mean-square over the
        strip interiors — tiny per-strip partials, no full-map reshape; the
        f32 convert fuses into the reduces."""
        t = ts[:, off : off + r].astype(jnp.float32)
        pm = jnp.mean(t, axis=(1, 2)).reshape(n, s, phases, c)
        ps = jnp.mean(t * t, axis=(1, 2)).reshape(n, s, phases, c)
        return pm.mean(axis=(1, 2)), ps.mean(axis=(1, 2))  # (n, c) each

    def se_stats(ts, n, s, off, phases, c, count):
        """GAM mean/unbiased-std (packed_gam_stats semantics) from interiors."""
        mean, sq = interior_moments(ts, n, s, off, phases, c)
        var = (sq - mean * mean) * (count / max(count - 1, 1))
        return mean, jnp.sqrt(jnp.maximum(var, 0.0) + eps)

    def strip_instance_norm(ts, n, s, off, phases, c):
        """Non-affine IN (biased var, matching packed_instance_norm) with
        moments from strip interiors, applied to the whole slab via broadcast
        scalars — the slab tensor is never reshaped or materialized in f32."""
        mean, sq = interior_moments(ts, n, s, off, phases, c)
        scale = jax.lax.rsqrt(jnp.maximum(sq - mean * mean, 0.0) + eps)

        def bcast(v):
            return jnp.repeat(jnp.tile(v, (1, phases)), s, axis=0)[:, None, None, :]

        return ((ts.astype(jnp.float32) - bcast(mean)) * bcast(scale)).astype(ts.dtype)

    def fn(params, x):
        p = params
        pk = packed
        n, h, w, _ = x.shape
        hp, wp = h // 2, w // 2
        assert hp % r == 0, f"packed height {hp} not a multiple of strip_rows {r}"
        s = hp // r
        E, m = _M_ENTRY, _M_EXIT
        hs = r + 2 * m

        xp = space_to_depth(x.astype(dt))  # (N, Hp, Wp, 12)

        # ---- entry strips: enc1, enc2, enc3 (the full-height convs) ----
        xs = _slabs(xp, s, r, E, packed_c=3)
        x1s = leaky(packed_conv(xs, pk["enc1_k"], s0s["enc1_s0"], 3,
                                p["enc1"]["conv"]["bias"], dt,
                                h_fixups=False))                    # valid halo E-2
        x2s = leaky(packed_conv(x1s, pk["enc2_k"], s0s["enc2_s0"], cd,
                                p["enc2"]["conv"]["bias"], dt,
                                h_fixups=False))                    # valid halo E-3
        with skip_h_borders():
            x3s = block(cd * 4, 3, 2).apply({"params": p["enc3"]}, x2s, False, False)
        x3 = _unslab(x3s[:, E // 2 : E // 2 + r // 2], n, s)  # (N, Hp/2, Wp/2, 4cd)

        # ---- direct middle: every map <= Hp/2 rows ----
        x4 = block(cd * 8, 3, 2).apply({"params": p["enc4"]}, x3, False, False)
        x5 = block(cd * 16, 3, 2).apply({"params": p["enc5"]}, x4, False, False)
        x5 = gam(cd * 16).apply({"params": p["ga5"]}, x5, update_sn=False)

        def up_stage(name, feat, t):
            return up(feat).apply(
                {"params": p[name]}, upsample2x_align_corners(t), update_sn=False
            )

        y1 = up_stage("upsample1", cd * 8, x5)
        y1 = jnp.concatenate(
            [y1, gam(cd * 8).apply({"params": p["ga4"]}, x4, update_sn=False)], -1)
        y1 = block(cd * 8, 3, 1).apply({"params": p["dec1"]}, y1, False, False)

        y2 = up_stage("upsample2", cd * 4, y1)
        y2 = jnp.concatenate(
            [y2, gam(cd * 4).apply({"params": p["ga3"]}, x3, update_sn=False)], -1)
        y2 = block(cd * 4, 3, 1).apply({"params": p["dec2"]}, y2, False, False)

        # ---- strip re-entry: up3 emitted directly in slab form ----
        # banded per-strip H matrices x phase-split W matrix x 1x1 kernel in
        # one einsum (packed_resize2x_conv1x1's staging, slab output)
        mats3, starts3, win3 = _strip_up3_matrices(hp, s, r, m)
        w2 = wp // 2
        y2w = jnp.stack([y2[:, o : o + win3] for o in starts3], axis=1)
        mw = _interp_matrix_np(w2, wp, True)
        mwp2 = jnp.asarray(mw.reshape(w2, 2, w2).transpose(1, 0, 2), dt)
        k3 = p["upsample3"]["kernel"][0, 0].astype(dt)
        up3s = jnp.einsum("soh,fpw,nshwc,cq->nsopfq", jnp.asarray(mats3, dt),
                          mwp2, y2w, k3, precision=prec)
        up3s = up3s.reshape(n, s, hs, wp, cd * 2).reshape(n * s, hs, wp, cd * 2)
        up3s = (up3s + p["upsample3"]["bias"].astype(up3s.dtype)).astype(dt)

        # ga2 in-chain on a SLICE of the entry x2 slabs: manual split-fuse
        # (fuse(concat[x, bcast(h)]) == x @ kx + h @ kh + b), SE vector and
        # IN moments from strip interiors
        x2gs = x2s[:, E - m : E + r + m]
        c2 = cd * 2
        mean2, std2 = se_stats(x2s, n, s, E, 1, c2, hp * wp)
        stats2 = jnp.concatenate([mean2, std2], -1).astype(dt)
        sq2 = p["ga2"]["squeeze"]["kernel"][0, 0].astype(dt)
        ex2 = p["ga2"]["excite"]["kernel"][0, 0].astype(dt)
        hvec2 = jax.nn.relu(stats2 @ sq2) @ ex2
        kx2 = p["ga2"]["fuse"]["kernel"][0, 0, :c2, :].astype(dt)
        kh2 = p["ga2"]["fuse"]["kernel"][0, 0, c2:, :].astype(dt)
        ga2s = jnp.einsum("nhwc,cq->nhwq", x2gs, kx2, precision=prec)
        ga2s = ga2s + p["ga2"]["fuse"]["bias"].astype(ga2s.dtype)
        hc2 = (hvec2 @ kh2)[:, None, None, :]
        ga2s = (ga2s + jnp.repeat(hc2, s, axis=0).astype(ga2s.dtype)).astype(dt)
        ga2s = strip_instance_norm(ga2s, n, s, m, 1, c2)

        d3s = jnp.concatenate([up3s, ga2s], -1)
        with skip_h_borders():
            y3s = block(cd * 2, 3, 1).apply({"params": p["dec3"]}, d3s, False, False)

        # up4: fused x2-resize + 1x1 conv, per-strip H matrices (see
        # packed_resize2x_conv1x1 for the einsum staging rationale)
        mats = jnp.asarray(_strip_resize_matrices(hp, s, r, m), dt)
        mwh = _interp_matrix_np(wp, 2 * wp, True)
        mwp = jnp.asarray(mwh.reshape(wp, 2, wp).transpose(1, 0, 2), dt)
        k4 = p["upsample4"]["kernel"][0, 0].astype(dt)
        y3r = y3s.reshape(n, s, hs, wp, cd * 2)
        up4s = jnp.einsum("seoh,fpw,nshwc,cq->nsopefq", mats, mwp, y3r, k4,
                          precision=prec)
        up4s = up4s.reshape(n * s, hs, wp, 4 * cd)
        up4s = (up4s + jnp.tile(p["upsample4"]["bias"].astype(up4s.dtype), 4)
                ).astype(dt)

        # ga1 in-chain on a SLICE of the entry x1 slabs (same split as ga2,
        # packed domain: 4 phase groups)
        x1es = x1s[:, E - m : E + r + m]
        mean1, std1 = se_stats(x1s, n, s, E, 4, cd, h * w)
        stats1 = jnp.concatenate([mean1, std1], -1).astype(dt)
        sq1 = p["ga1"]["squeeze"]["kernel"][0, 0].astype(dt)
        ex1 = p["ga1"]["excite"]["kernel"][0, 0].astype(dt)
        hvec = jax.nn.relu(stats1 @ sq1) @ ex1
        kh = p["ga1"]["fuse"]["kernel"][0, 0, cd:, :].astype(dt)
        ga1s = conv1x1(x1es, pk["ga1_fuse_x_k"], p["ga1"]["fuse"]["bias"])
        hc = jnp.tile(hvec @ kh, (1, 4))[:, None, None, :]
        ga1s = ga1s + jnp.repeat(hc, s, axis=0).astype(ga1s.dtype)
        ga1s = strip_instance_norm(ga1s, n, s, m, 4, cd)

        y4s = leaky(packed_conv(
            jnp.concatenate([up4s, ga1s], -1), pk["dec4_k"], s0s["dec4_s0"],
            [cd, cd], p["dec4"]["conv"]["bias"], dt, h_fixups=False))
        h5s = packed_conv(y4s * x1es, pk["dec5_0_k"], s0s["dec5_0_s0"], cd,
                          p["dec5_0"]["bias"], dt, h_fixups=False)
        ress = jnp.tanh(packed_conv(h5s, pk["dec5_1_k"], s0s["dec5_1_s0"], cd,
                                    p["dec5_1"]["bias"], dt, h_fixups=False))
        xes = xs[:, E - m : E + r + m]
        outs = jnp.clip(ress.astype(jnp.float32) + xes.astype(jnp.float32),
                        -1.0, 1.0)
        out = _unslab(outs[:, m : m + r].astype(dt), n, s)
        return depth_to_space(out)

    return fn


def make_strip_fast_eval(bundle, g_params, strip_rows: int):
    """make_fast_eval-shaped wrapper: fn(params, extra, x)."""
    packed = pack_generator_params(jax.device_get(g_params), bundle.g_model.conv_dim)
    fn = make_strip_eval(bundle, packed, strip_rows)
    return lambda params, extra, x: fn(params, x)
