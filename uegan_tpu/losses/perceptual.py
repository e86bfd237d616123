"""Instance-normalized VGG perceptual ("fidelity") loss.

Parity with PerceptualLoss (reference: losses.py:12-36): inputs in [0,1] are
ImageNet-normalized, run through VGG19, and the relu{1..5}_1 features are
instance-normalized (non-affine) before an MSE with stage weights
[1/64, 1/64, 1/32, 1/32, 1].
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from uegan_tpu.models.vgg import PERCEPTUAL_TAPS, VGG19Features, normalize_imagenet
from uegan_tpu.ops.norms import instance_norm

Array = jnp.ndarray

_WEIGHTS = {
    "relu1_1": 1.0 / 64,
    "relu2_1": 1.0 / 64,
    "relu3_1": 1.0 / 32,
    "relu4_1": 1.0 / 32,
    "relu5_1": 1.0,
}


def vgg_feature_weights() -> Dict[str, float]:
    return dict(_WEIGHTS)


def _packed_stage1_features(vgg: VGG19Features, params, xin: Array):
    """VGG stage 1 in the space-to-depth packed domain.

    The full-res stage (conv1_1 3->64, conv1_2 64->64) is the
    lane-degenerate part of VGG on TPU (3- and 64-channel tensors pad to 128
    lanes).  Packing 2x2 phases into channels makes them 12/256-channel.
    VGG convs are ZERO padded, and zero pads in the original domain are zero
    packed rows, so the packed conv just uses XLA implicit padding — no
    border fix-up.  pool1 (2x2/2 max) is exactly a max over the 4 phase
    groups, exiting the packed domain for the canonical stages 2-5.

    Returns (relu1_1 packed (N,H/2,W/2,256), pooled stage-2 input).
    """
    from uegan_tpu.infer.packed import pack_kernel_s1_traced, space_to_depth

    dt = vgg.dtype
    f32 = dt == jnp.float32

    def conv_packed(h, name):
        kp = pack_kernel_s1_traced(params[f"{name}_kernel"].astype(dt), 1)
        y = jax.lax.conv_general_dilated(
            h.astype(dt), kp, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if f32 else None,
            precision=jax.lax.Precision.HIGHEST if f32 else jax.lax.Precision.DEFAULT,
        )
        b = jnp.tile(params[f"{name}_bias"].astype(y.dtype), 4)
        return jax.nn.relu((y + b).astype(dt))

    xp = space_to_depth(xin.astype(dt))
    h1 = conv_packed(xp, "conv1_1")  # packed relu1_1
    h2 = conv_packed(h1, "conv1_2")
    n, hp, wp, _ = h2.shape
    pooled = jnp.max(h2.reshape(n, hp, wp, 4, 64), axis=-2)  # pool1
    return h1, pooled


def _tap_features(vgg: VGG19Features, vgg_variables, xin: Array, packed: bool):
    """All perceptual tap features of one (possibly batched) input.

    Returns ``(packed_relu1_1 | None, canonical-tap dict)`` — when
    ``packed``, relu1_1 stays in the space-to-depth domain (see
    :func:`_packed_stage1_features`) and is absent from the dict.
    """
    if packed:
        from uegan_tpu.models.vgg import vgg_features_from

        h1p, pooled = _packed_stage1_features(vgg, vgg_variables["params"], xin)
        f = vgg_features_from(
            vgg_variables["params"], pooled, vgg.dtype, start_stage=2, pooled_input=True
        )
        return h1p, f
    return None, vgg.apply(vgg_variables, xin)


def perceptual_loss(
    vgg: VGG19Features,
    vgg_variables,
    x01: Array,
    y01: Array,
    packed_stage1: bool = True,
    split_label: bool = False,
) -> Array:
    """MSE over instance-normalized VGG taps; x01/y01 in [0,1] NHWC.

    Gradients flow through ``x01`` (the generated image); the VGG parameters
    are frozen (callers never differentiate w.r.t. ``vgg_variables``).

    ``split_label``: run the label branch (``y01``) as its own
    stop-gradiented VGG call instead of one batched call over
    ``concat([x, y])``.  Per-sample math (convs, instance norms) is
    identical, but the batched form makes XLA's backward input-grad convs
    process both halves where only the ``x01`` half carries gradients — the
    split halves the VGG backward work.
    """
    if x01.shape[-1] != 3:
        x01 = jnp.repeat(x01, 3, axis=-1)
        y01 = jnp.repeat(y01, 3, axis=-1)
    b = x01.shape[0]
    packed = (
        packed_stage1
        and x01.shape[1] % 2 == 0
        and x01.shape[2] % 2 == 0
        and tuple(vgg.taps) == tuple(PERCEPTUAL_TAPS)
    )
    if split_label:
        hx, fx = _tap_features(vgg, vgg_variables, normalize_imagenet(x01), packed)
        hy, fy = _tap_features(
            vgg, vgg_variables,
            jax.lax.stop_gradient(normalize_imagenet(y01)), packed,
        )
    else:
        # one batched VGG call for both inputs (per-sample network:
        # equivalent to two calls, half the kernel launches)
        xin = normalize_imagenet(jnp.concatenate([x01, y01], axis=0))
        hb, fboth = _tap_features(vgg, vgg_variables, xin, packed)
        hx = hb[:b] if hb is not None else None
        hy = hb[b:] if hb is not None else None
        fx = {k: v[:b] for k, v in fboth.items()}
        fy = {k: v[b:] for k, v in fboth.items()}
    loss = jnp.float32(0.0)
    if packed:
        from uegan_tpu.infer.packed import packed_instance_norm

        # relu1_1 term directly in the packed domain (per-original-channel
        # instance norm = per-phase-group stats; MSE is over the same set)
        a = packed_instance_norm(hx.astype(jnp.float32), 64)
        c = packed_instance_norm(hy.astype(jnp.float32), 64)
        loss = loss + _WEIGHTS["relu1_1"] * jnp.mean((a - c) ** 2)
        taps = [t for t in PERCEPTUAL_TAPS if t != "relu1_1"]
    else:
        taps = list(PERCEPTUAL_TAPS)
    for tap in taps:
        a = instance_norm(fx[tap].astype(jnp.float32))
        c = instance_norm(fy[tap].astype(jnp.float32))
        loss = loss + _WEIGHTS[tap] * jnp.mean((a - c) ** 2)
    return loss
