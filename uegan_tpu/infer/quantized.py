"""Opt-in int8 quantized packed inference.

The packed (space-to-depth) forward pays ~4x dense FLOPs for full 128-lane
MXU utilization (infer/packed.py); its convs sit AT the bf16 MXU roofline
(OPTIMIZATION_NOTES.md).  The v5e MXU runs int8 at 2x the bf16 rate and int8
activations halve HBM traffic, so quantizing exactly those packed full-res
convs buys back the overhead.  Measured on the v5e chip (tools/bench_int8.py,
512px B=128): 650 img/s vs 632 bf16 (r3, with the int8 stride-2 deep
composed dec5 head: 650.3/650.7/647.9 vs 600.0/598.7 sequential-chain —
+8.4%; r1 history: 568 vs 516 bf16, the quantized convs themselves ~1.8x in
a chained-conv microbenchmark incl. requant ops, while the bf16 bandwidth
work bounds the end-to-end gain).  Accuracy: 45.6 dB PSNR vs the bf16
packed forward on a unit-gain (trained-magnitude) network
(tests/test_quantized.py); the deep head quantizes the composed kernel ONCE
(no h5 intermediate requant), so interior error does not grow.

Scheme (standard symmetric int8):
- weights: per-output-channel scales over the PACKED kernels, with each
  input tensor's activation scale folded into its kernel rows first (so a
  concat of differently-scaled int8 tensors needs no per-channel dequant).
- activations: per-tensor scales from a one-shot calibration forward (bf16
  packed forward instrumented with max-|x| taps); the [-1,1] network input
  is scale 1/127 by construction.
- convs accumulate in int32; dequant + bias + activation run fused in
  bf16/f32; the next conv's input is requantized to int8.
- the interior (<=quarter-res canonical stages), GAM statistics/instance
  norms, the fused resize+conv einsums, and the global residual stay
  bf16/f32 — bandwidth/VPU work where int8 buys little and risks accuracy.

This path changes outputs (quantization error vs the bf16 forward — the
equivalence test asserts >=30 dB agreement, not bitness), hence OPT-IN:
``Config.quantized_inference = "int8"`` or ``make_int8_eval`` directly.
The reference has no quantization story (pure fp32 torch); this subsystem is
a TPU-native addition.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

from uegan_tpu.infer.packed import (
    _DEC5_FIX,
    _DEC5_SLAB,
    _PACK_PADS,
    _flag,
    depth_to_space,
    leaky,
    make_packed_eval,
    pack_generator_params,
    packed_conv,
    packed_gam_stats,
    packed_instance_norm,
    packed_resize2x_conv1x1,
    packed_s0_statics,
    space_to_depth,
)

Array = jnp.ndarray

# int8 form of the stride-2 deep composed dec5 head (see packed.py's
# compose_dec5_deep_kernel): ONE int8 conv replaces the dec5_0 + requant +
# dec5_1 chain.  The composed kernel is quantized once (the sequential chain
# quantizes twice, incl. the h5 intermediate), so interior accuracy improves;
# the _DEC5_FIX border band keeps the sequential int8 chain (composed-reflect
# != sequential-reflect there), so band values carry the sequential path's
# slightly different quantization error — a sub-lsb seam on the order of the
# path's documented int8 error, not a correctness boundary.
_INT8_DEEP_HEAD = _flag("UEGAN_INT8_DEEP_HEAD", True)

INPUT_SCALE = 1.0 / 127.0  # network input is [-1, 1] by contract

# activation-scale taps, in forward order (up4 = fused resize+conv output)
SCALE_KEYS = ("x1p", "ga1p", "up4", "mod", "h5")


def quantize_weights(
    w: np.ndarray, in_scale: np.ndarray | float
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-output-channel symmetric int8 quantization of a conv kernel.

    ``in_scale`` (scalar or per-input-channel vector) is folded into the
    kernel before quantization, so int8 inputs feed the conv directly and
    one per-output-channel dequant recovers the float result:
    ``conv(x, w * s_in) == conv(x_q, w_q) * s_out`` up to rounding.
    """
    w = np.asarray(w, np.float64)
    if np.ndim(in_scale) > 0:
        w = w * np.asarray(in_scale, np.float64)[None, None, :, None]
    else:
        w = w * float(in_scale)
    s_out = np.max(np.abs(w), axis=(0, 1, 2)) / 127.0
    s_out = np.where(s_out > 0, s_out, 1.0)
    wq = np.clip(np.rint(w / s_out), -127, 127).astype(np.int8)
    return wq, s_out.astype(np.float32)


def quantize_act(x: Array, scale: float) -> Array:
    """Symmetric per-tensor int8 quantization (round-to-nearest-even)."""
    y = jnp.round(x.astype(jnp.float32) * (1.0 / scale))
    return jnp.clip(y, -127, 127).astype(jnp.int8)


def _conv_q(xq: Array, wq: Array, s0: int, c_in) -> Array:
    """int8 packed conv -> int32 accumulator (reflect semantics)."""
    return packed_conv(xq, wq, s0, c_in, bias=None, dtype=jnp.int8)


def _conv_q_fused(
    xq: Array,
    wq: np.ndarray,
    w_scale: np.ndarray,
    bias_t: Array,
    s0: int,
    c_in,
    act: str = "none",
    mul: Optional[Array] = None,
    out_scale: Optional[float] = None,
    requant: bool = False,
) -> Array:
    """int8 packed conv + fused epilogue via the Pallas kernel, with the
    reflect border fix-up strips applied by the XLA path.

    The kernel (ops/pallas/packed_conv_int8.py) keeps the s32 accumulator in
    VMEM and applies dequant+bias+act[+mul][+requant] before the single HBM
    write; its zero-pad borders are overwritten here with strips computed
    from packed-reflect-padded slabs — the same geometry as packed_conv's
    fused path (infer/packed.py).
    """
    from uegan_tpu.infer.packed import packed_reflect_pad
    from uegan_tpu.ops.pallas.packed_conv_int8 import packed_conv_int8_pallas

    kq = jnp.asarray(wq)
    ws = jnp.asarray(w_scale, jnp.float32)
    osc = jnp.asarray(out_scale if out_scale is not None else 1.0, jnp.float32)
    S = kq.shape[0]
    s1 = S - 1 - s0
    p = max(s0, s1)
    m = max(s0 + s1, p + 1)
    lp, wp = xq.shape[1], xq.shape[2]

    y = packed_conv_int8_pallas(
        xq, kq, ws, bias_t, s0, act=act, mul=mul, out_scale=osc,
        requant=requant, interpret=jax.default_backend() != "tpu",
    )
    if p == 0:
        return y  # 1x1: exact everywhere, no strips

    def conv_valid(t):
        return lax.conv_general_dilated(
            t, kq, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    def epi(y_i32, mul_slice):
        v = y_i32.astype(jnp.float32) * ws + bias_t.astype(jnp.float32)
        if act == "leaky":
            v = jnp.where(v >= 0, v, 0.2 * v)
        elif act == "tanh":
            v = jnp.tanh(v)
        if mul is not None:
            v = v * mul_slice.astype(jnp.float32)
        if requant:
            v = jnp.clip(jnp.round(v / osc), -127, 127)
        return v.astype(y.dtype)

    ms = lambda sl_r, sl_c: mul[:, sl_r, sl_c] if mul is not None else None
    wslice = slice(p - s0, p + wp + s1)
    if s0:
        slab = packed_reflect_pad(xq[:, :m], p, c_in)
        y = y.at[:, :s0].set(epi(
            conv_valid(slab[:, p - s0 : p + s0 + s1, wslice]),
            ms(slice(0, s0), slice(None)),
        ))
    if s1:
        slab = packed_reflect_pad(xq[:, lp - m :], p, c_in)
        y = y.at[:, lp - s1 :].set(epi(
            conv_valid(slab[:, p + m - s0 - s1 : p + m + s1, wslice]),
            ms(slice(lp - s1, None), slice(None)),
        ))
    if s0:
        slab = packed_reflect_pad(xq[:, :, :m], p, c_in)
        y = y.at[:, s0 : lp - s1, :s0].set(epi(
            conv_valid(slab[:, p : p + lp, p - s0 : p + s0 + s1]),
            ms(slice(s0, lp - s1), slice(0, s0)),
        ))
    if s1:
        slab = packed_reflect_pad(xq[:, :, wp - m :], p, c_in)
        y = y.at[:, s0 : lp - s1, wp - s1 :].set(epi(
            conv_valid(slab[:, p : p + lp, p + m - s0 - s1 : p + m + s1]),
            ms(slice(s0, lp - s1), slice(wp - s1, None)),
        ))
    return y


def _deq(y_i32: Array, w_scale: np.ndarray, bias: Array, tile_bias: bool) -> Array:
    """int32 conv accumulator -> bf16, folding the per-cout scales + bias.

    ``w_scale`` is per KERNEL output channel (already per-packed-channel for
    packed kernels); the bias is per ORIGINAL channel and tiles over the 4
    phase groups when the output is packed.
    """
    y = y_i32.astype(jnp.float32) * jnp.asarray(w_scale, jnp.float32)
    if bias is not None:
        b = jnp.tile(bias, 4) if tile_bias else bias
        y = y + b.astype(jnp.float32)
    return y.astype(jnp.bfloat16)


def calibrate(bundle, g_params, x_cal: Array) -> Dict[str, float]:
    """One-shot activation-range calibration.

    Runs the bf16 packed forward instrumented with max-|value| taps at every
    quantization point and returns per-tensor scales (max/127).  ``x_cal``
    should be a representative batch in [-1, 1]; shapes need not match later
    inference shapes (the generator is fully convolutional).
    """
    host = jax.device_get(g_params)
    pk = pack_generator_params(host, bundle.g_model.conv_dim)
    fn = jax.jit(lambda x: _forward_bf16_taps(bundle, pk, host, x))
    _, maxes = fn(x_cal)
    return {k: max(float(v), 1e-6) / 127.0 for k, v in maxes.items()}


def _forward_bf16_taps(bundle, pk, p, x):
    """The bf16 packed forward, also returning max-|x| at each quant tap.

    Mirrors make_packed_eval's graph (same helpers) so the collected ranges
    are exactly the tensors the int8 path will quantize.
    """
    gm = bundle.g_model
    cd = gm.conv_dim
    dt = jnp.bfloat16
    s0s = packed_s0_statics()
    maxes = {}

    def tap(name, t):
        maxes[name] = jnp.max(jnp.abs(t.astype(jnp.float32)))
        return t

    xp = space_to_depth(x.astype(dt))
    x1p = tap("x1p", leaky(packed_conv(xp, jnp.asarray(pk["enc1_k"]), s0s["enc1_s0"], 3,
                                       jnp.asarray(p["enc1"]["conv"]["bias"]), dt)))
    x2 = leaky(packed_conv(x1p, jnp.asarray(pk["enc2_k"]), s0s["enc2_s0"], cd,
                           jnp.asarray(p["enc2"]["conv"]["bias"]), dt))
    y3 = _interior(bundle, p, x2)

    mean, std = packed_gam_stats(x1p, cd)
    stats = jnp.concatenate([mean, std], -1).astype(dt)
    sq = jnp.asarray(p["ga1"]["squeeze"]["kernel"])[0, 0].astype(dt)
    ex = jnp.asarray(p["ga1"]["excite"]["kernel"])[0, 0].astype(dt)
    h = jax.nn.relu(stats @ sq) @ ex
    kh = jnp.asarray(p["ga1"]["fuse"]["kernel"])[0, 0, cd:, :].astype(dt)
    ga1p = _conv1x1_bf(x1p, jnp.asarray(pk["ga1_fuse_x_k"]),
                       jnp.asarray(p["ga1"]["fuse"]["bias"]))
    ga1p = ga1p + jnp.tile(h @ kh, (1, 4))[:, None, None, :].astype(ga1p.dtype)
    ga1p = tap("ga1p", packed_instance_norm(ga1p, cd))

    h4, w4 = x.shape[1], x.shape[2]
    up4 = tap("up4", packed_resize2x_conv1x1(
        y3, jnp.asarray(p["upsample4"]["kernel"]),
        jnp.asarray(p["upsample4"]["bias"]), (h4, w4)))
    y4p = leaky(packed_conv(jnp.concatenate([up4, ga1p], -1), jnp.asarray(pk["dec4_k"]),
                            s0s["dec4_s0"], [cd, cd], jnp.asarray(p["dec4"]["conv"]["bias"]), dt))
    mod = tap("mod", y4p * x1p)
    h5 = tap("h5", packed_conv(mod, jnp.asarray(pk["dec5_0_k"]), s0s["dec5_0_s0"], cd,
                               jnp.asarray(p["dec5_0"]["bias"]), dt))
    res = jnp.tanh(packed_conv(h5, jnp.asarray(pk["dec5_1_k"]), s0s["dec5_1_s0"], cd,
                               jnp.asarray(p["dec5_1"]["bias"]), dt))
    out = jnp.clip(res.astype(jnp.float32) + xp.astype(jnp.float32), -1.0, 1.0)
    return depth_to_space(out.astype(dt)), maxes


def _conv1x1_bf(x: Array, k: Array, bias: Array) -> Array:
    y = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return (y + jnp.tile(bias.astype(y.dtype), 4)).astype(jnp.bfloat16)


def _conv1x1_q(xq: Array, wq: Array) -> Array:
    return lax.conv_general_dilated(
        xq, wq, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _interior(bundle, p, x2):
    """Canonical bf16 interior (enc3..dec3) shared by the int8 forward and
    its calibration pass.  (Fusing the upsample resize+1x1 convs into
    unpacked einsums measured SLOWER e2e — see make_packed_eval's note.)"""
    from uegan_tpu.models.blocks import ConvBlock, GAM, SNConv
    from uegan_tpu.ops.resize import upsample2x_align_corners

    gm = bundle.g_model
    cd, dt = gm.conv_dim, jnp.bfloat16

    def block(features, k, s):
        return ConvBlock(features=features, kernel_size=k, stride=s, use_bias=True,
                         norm_fun="none", act_fun="LeakyReLU", use_sn=False,
                         dtype=dt, param_dtype=gm.param_dtype)

    def gam(nc):
        return GAM(out_nc=nc, reduction=8, use_bias=False, use_sn=False,
                   norm=True, split_fuse=True, dtype=dt, param_dtype=gm.param_dtype)

    def up_stage(name, t):
        return SNConv(features=p[name]["kernel"].shape[-1], kernel_size=1,
                      stride=1, use_bias=True, use_sn=False, dtype=dt,
                      param_dtype=gm.param_dtype).apply(
            {"params": p[name]}, upsample2x_align_corners(t), update_sn=False)

    x3 = block(cd * 4, 3, 2).apply({"params": p["enc3"]}, x2, False, False)
    x4 = block(cd * 8, 3, 2).apply({"params": p["enc4"]}, x3, False, False)
    x5 = block(cd * 16, 3, 2).apply({"params": p["enc5"]}, x4, False, False)
    x5 = gam(cd * 16).apply({"params": p["ga5"]}, x5, update_sn=False)

    y1 = up_stage("upsample1", x5)
    y1 = jnp.concatenate([y1, gam(cd * 8).apply({"params": p["ga4"]}, x4, update_sn=False)], -1)
    y1 = block(cd * 8, 3, 1).apply({"params": p["dec1"]}, y1, False, False)

    y2 = up_stage("upsample2", y1)
    y2 = jnp.concatenate([y2, gam(cd * 4).apply({"params": p["ga3"]}, x3, update_sn=False)], -1)
    y2 = block(cd * 4, 3, 1).apply({"params": p["dec2"]}, y2, False, False)

    y3 = up_stage("upsample3", y2)
    y3 = jnp.concatenate([y3, gam(cd * 2).apply({"params": p["ga2"]}, x2, update_sn=False)], -1)
    y3 = block(cd * 2, 3, 1).apply({"params": p["dec3"]}, y3, False, False)
    return y3


def build_quant_tables(bundle, g_params, calib_batch: Optional[np.ndarray] = None):
    """Quantize the packed full-res kernels + calibrate activation scales.

    Shared by the full-image int8 forward (:func:`make_int8_eval`) and the
    int8 strip executor (``infer/strips.py``): returns a dict with

    - ``q``:  int8 packed kernels (enc1/enc2/ga1/dec4/dec5_0/dec5_1/dec5d)
    - ``w``:  their per-output-channel dequant scales
    - ``sc``: per-tensor activation scales (SCALE_KEYS + the input's 1/127)
    - ``b``:  original-channel fp32 biases per conv
    - ``b9``: the composed dec5 head's 3-channel bias
    - ``se``: ga1's (squeeze, excite, fuse-h) fp kernels for the SE branch
    """
    gm = bundle.g_model
    cd = gm.conv_dim
    host = jax.device_get(g_params)
    g = lambda *path: np.asarray(_get(host, path))
    pk = pack_generator_params(host, cd)

    if calib_batch is None:
        calib_batch = np.random.default_rng(1990).uniform(
            -1, 1, (2, 64, 64, 3)
        ).astype(np.float32)
    sc = calibrate(bundle, host, jnp.asarray(calib_batch))

    q: Dict[str, np.ndarray] = {}
    w: Dict[str, np.ndarray] = {}
    q["enc1"], w["enc1"] = quantize_weights(pk["enc1_k"], INPUT_SCALE)
    q["enc2"], w["enc2"] = quantize_weights(pk["enc2_k"], sc["x1p"])
    q["ga1"], w["ga1"] = quantize_weights(pk["ga1_fuse_x_k"], sc["x1p"])
    in_sc = np.concatenate([np.full(4 * cd, sc["up4"]), np.full(4 * cd, sc["ga1p"])])
    q["dec4"], w["dec4"] = quantize_weights(pk["dec4_k"], in_sc)
    q["dec5_0"], w["dec5_0"] = quantize_weights(pk["dec5_0_k"], sc["mod"])
    q["dec5_1"], w["dec5_1"] = quantize_weights(pk["dec5_1_k"], sc["h5"])
    q["dec5d"], w["dec5d"] = quantize_weights(pk["dec5d_k"], sc["mod"])

    biases = {
        "enc1": g("enc1", "conv", "bias"), "enc2": g("enc2", "conv", "bias"),
        "ga1": g("ga1", "fuse", "bias"), "up4": g("upsample4", "bias"),
        "dec4": g("dec4", "conv", "bias"), "dec5_0": g("dec5_0", "bias"),
        "dec5_1": g("dec5_1", "bias"),
    }
    se = {
        "squeeze": g("ga1", "squeeze", "kernel")[0, 0],
        "excite": g("ga1", "excite", "kernel")[0, 0],
        "fuse_h": g("ga1", "fuse", "kernel")[0, 0, cd:, :],
    }
    # entry_int8 governs the STRIP executor only (the full-image path
    # quantizes everything).  Default False = bf16 entry chain + int8 exit
    # chain, the measured-best hybrid at 2048px B=4: full int8 17.75 /
    # bf16 19.40 / hybrid 19.76 img/s — the entry chain's
    # quantize->conv->requant passes on the big slab tensors cost more
    # than the int8 conv saves (movement-bound; OPTIMIZATION_NOTES r4),
    # while the exit chain's dec5 deep head still banks the MXU 2x.
    # NOTE: the fp32 host param tree is deliberately NOT returned — only
    # make_int8_eval needs it (fp interior + upsample4) and it re-derives it
    # from g_params, so routed closures / strip jits don't retain an extra
    # tens-of-MB host copy (ADVICE r4).  ``pk`` IS retained: the hybrid strip
    # executor's bf16 entry chain runs from the packed fp kernels.
    return {"q": q, "w": w, "sc": sc, "b": biases,
            "b9": np.asarray(pk["dec5c_b"], np.float32), "se": se,
            "pk": pk, "entry_int8": False}


def make_int8_eval(
    bundle,
    g_params,
    calib_batch: Optional[np.ndarray] = None,
    use_pallas: bool = False,
    tables: Optional[Dict] = None,
    u8_out: bool = False,
):
    """Build the int8 packed inference forward: fn(params, extra, x).

    Weights are quantized from ``g_params`` at build time (baked as
    compile-time constants; the ``params`` argument is ignored — the
    signature matches make_fast_eval for drop-in use).  ``calib_batch``
    (in [-1,1]) drives activation-range calibration; defaults to a seeded
    random batch, which is adequate because every quantized tensor sits
    behind a range-bounding op (leaky of a bounded conv, instance norm,
    tanh) — pass real images for production use.

    ``use_pallas`` routes eligible convs through the Pallas int8 kernel with
    its fused dequant/requant epilogue.  As measured on this stack that is
    the 1x1 convs ONLY (in practice: ga1; up4 has no int8 conv since the
    fused bf16 resize+conv einsum feeds the quantizer directly) — the S=2
    dec4/dec5_0 call sites below exist but are gated off by ``_pl_ok``'s
    S==1 check because Mosaic's s8 matmul runs at the bf16 rate here (see
    the comment in ``_pl_ok``; relax that check to re-measure on a future
    stack).  Ineligible shapes fall back per-conv to the XLA chain.
    """
    gm = bundle.g_model
    assert gm.norm_fun == "none" and gm.act_fun == "LeakyReLU" and not gm.use_sn, (
        "int8 packed inference supports the default generator config only"
    )
    cd = gm.conv_dim
    s0s = packed_s0_statics()

    # packed-kernel quantization (input scales folded per channel — see
    # build_quant_tables; up4 has no int8 kernel: the fused bf16 resize+conv
    # einsum feeds the quantizer directly; dec5d is the stride-2 deep
    # composed head quantized ONCE from the fp composed kernel)
    tabs = tables if tables is not None else build_quant_tables(
        bundle, g_params, calib_batch)
    q, w, sc, biases = tabs["q"], tabs["w"], tabs["sc"], tabs["b"]
    b9 = tabs["b9"]
    host, pk = jax.device_get(g_params), tabs["pk"]
    ga1_sq, ga1_ex, ga1_kh = (tabs["se"]["squeeze"], tabs["se"]["excite"],
                              tabs["se"]["fuse_h"])

    def _plq(name):  # pallas operands for conv `name`
        return (
            q[name],
            w[name],
            jnp.tile(jnp.asarray(biases[name], jnp.float32), 4),
        )

    def _pl_ok(xq_shape, name):
        # Pallas only for the 1x1 convs: measured on v5e (512px B=128), the
        # Mosaic s8 matmul runs at the bf16 MXU rate while XLA's int8
        # CONVOLUTION hits the native 2x int8 rate — so the pallas kernel
        # wins only where bandwidth dominates (1x1 + fused requant: up4
        # 1.50x, ga1 1.74x standalone) and loses on the 3x3 packed convs
        # (dec4 fused 22.4 ms vs XLA's 12.9 ms conv; the packed transform's
        # 4x FLOP overhead needs the native rate to pay).
        if not use_pallas or q[name].shape[0] != 1:
            return False
        from uegan_tpu.ops.pallas.packed_conv_int8 import eligible

        return eligible(tuple(xq_shape), q[name].shape)

    def fn(params, extra, x):
        del params, extra  # weights are baked (quantized at build time)
        dt = jnp.bfloat16
        xp = space_to_depth(x.astype(dt))
        xq = quantize_act(xp, INPUT_SCALE)  # the input's own 8-bit quantization

        x1p_bf = leaky(_deq(_conv_q(xq, jnp.asarray(q["enc1"]), s0s["enc1_s0"], 3),
                            w["enc1"], jnp.asarray(biases["enc1"]), True))
        x1q = quantize_act(x1p_bf, sc["x1p"])

        x2 = leaky(_deq(_conv_q(x1q, jnp.asarray(q["enc2"]), s0s["enc2_s0"], cd),
                        w["enc2"], jnp.asarray(biases["enc2"]), False))
        y3 = _interior(bundle, host, x2)

        # ga1 stats from the bf16 x1 (alive anyway for the modulation mul)
        mean, std = packed_gam_stats(x1p_bf, cd)
        stats = jnp.concatenate([mean, std], -1).astype(dt)
        h = jax.nn.relu(stats @ jnp.asarray(ga1_sq, dt)) @ jnp.asarray(ga1_ex, dt)
        if _pl_ok(x1q.shape, "ga1"):
            ga1p = _conv_q_fused(x1q, *_plq("ga1"), 0, cd)
        else:
            ga1p = _deq(_conv1x1_q(x1q, jnp.asarray(q["ga1"])),
                        w["ga1"], jnp.asarray(biases["ga1"]), True)
        ga1p = ga1p + jnp.tile(h @ jnp.asarray(ga1_kh, dt), (1, 4))[:, None, None, :].astype(dt)
        ga1p = packed_instance_norm(ga1p, cd)
        ga1q = quantize_act(ga1p, sc["ga1p"])

        # fused bf16 resize + 1x1 conv (see make_packed_eval) quantized
        # directly — no separate int8 up4 conv or requant pass remains
        h4, w4 = x.shape[1], x.shape[2]
        up4 = packed_resize2x_conv1x1(
            y3, jnp.asarray(host["upsample4"]["kernel"]),
            jnp.asarray(biases["up4"]), (h4, w4))
        up4q = quantize_act(up4, sc["up4"])
        d4in = jnp.concatenate([up4q, ga1q], -1)
        if _pl_ok(d4in.shape, "dec4"):
            # fused: conv + leaky + (y4 * x1) modulation + requantize — the
            # XLA chain materializes y4p bf16, mod bf16, and mod s8 separately
            modq = _conv_q_fused(d4in, *_plq("dec4"), s0s["dec4_s0"], [cd, cd],
                                 act="leaky", mul=x1p_bf,
                                 out_scale=sc["mod"], requant=True)
        else:
            y4p = leaky(_deq(_conv_q(d4in, jnp.asarray(q["dec4"]), s0s["dec4_s0"], [cd, cd]),
                             w["dec4"], jnp.asarray(biases["dec4"]), True))
            modq = quantize_act(y4p * x1p_bf, sc["mod"])

        def seq_tail(mq):
            """Sequential int8 dec5_0 -> requant -> dec5_1 + tanh chain
            (canonical border semantics; also the whole-image fallback)."""
            if _pl_ok(mq.shape, "dec5_0"):
                h5q = _conv_q_fused(mq, *_plq("dec5_0"), s0s["dec5_0_s0"], cd,
                                    out_scale=sc["h5"], requant=True)
            else:
                h5 = _deq(_conv_q(mq, jnp.asarray(q["dec5_0"]),
                                  s0s["dec5_0_s0"], cd),
                          w["dec5_0"], jnp.asarray(biases["dec5_0"]), True)
                h5q = quantize_act(h5, sc["h5"])
            return jnp.tanh(_deq(_conv_q(h5q, jnp.asarray(q["dec5_1"]),
                                         s0s["dec5_1_s0"], cd),
                                 w["dec5_1"], jnp.asarray(biases["dec5_1"]), True))

        lp, wp = modq.shape[1], modq.shape[2]
        r, L = _DEC5_FIX, _DEC5_SLAB
        if (_INT8_DEEP_HEAD and lp % 2 == 0 and wp % 2 == 0
                and lp > L + r and wp > L + r):
            # interior: ONE stride-2 int8 conv (6,6,4C,48) with dequant +
            # composed bias + tanh epilogue, then depth_to_space — replaces
            # the full-size dec5_0 conv, the h5 requant pass, and the
            # lane-starved (4,4,4C,12) dec5_1 conv.  Zero-pad contamination
            # reaches exactly the r-band the sequential strips overwrite
            # (same geometry as packed.py's packed_dec5_head).
            yd = lax.conv_general_dilated(
                modq, jnp.asarray(q["dec5d"]),
                window_strides=(2, 2), padding=((2, 2), (2, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            v = yd.astype(jnp.float32) * jnp.asarray(w["dec5d"], jnp.float32)
            v = jnp.tanh(v + jnp.tile(jnp.asarray(b9), 16))
            res = depth_to_space(v.astype(dt))  # (N, lp, wp, 12)
            res = res.at[:, :, :r].set(seq_tail(modq[:, :, :L])[:, :, :r])
            res = res.at[:, :, wp - r :].set(seq_tail(modq[:, :, wp - L :])[:, :, L - r :])
            res = res.at[:, :r].set(seq_tail(modq[:, :L])[:, :r])
            res = res.at[:, lp - r :].set(seq_tail(modq[:, lp - L :])[:, L - r :])
        else:
            res = seq_tail(modq)
        out = jnp.clip(res.astype(jnp.float32) + xp.astype(jnp.float32), -1.0, 1.0)
        if u8_out:
            # PNG-ready output: quantize AFTER the d2s (commutes
            # bit-exactly; the float d2s takes the fast convT lowering)
            from uegan_tpu.utils.image_io import device_quantize_u8

            return device_quantize_u8(depth_to_space(out.astype(dt)))
        return depth_to_space(out.astype(dt))

    return fn


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree
