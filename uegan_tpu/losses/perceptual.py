"""Instance-normalized VGG perceptual ("fidelity") loss.

Parity with PerceptualLoss (reference: losses.py:12-36): inputs in [0,1] are
ImageNet-normalized, run through VGG19, and the relu{1..5}_1 features are
instance-normalized (non-affine) before an MSE with stage weights
[1/64, 1/64, 1/32, 1/32, 1].
"""

from __future__ import annotations

from typing import Dict

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


def perceptual_loss(
    vgg: VGG19Features,
    vgg_variables,
    x01: Array,
    y01: Array,
) -> Array:
    """MSE over instance-normalized VGG taps; x01/y01 in [0,1] NHWC.

    Gradients flow through ``x01`` (the generated image); the VGG parameters
    are frozen (callers never differentiate w.r.t. ``vgg_variables``).
    """
    if x01.shape[-1] != 3:
        x01 = jnp.repeat(x01, 3, axis=-1)
        y01 = jnp.repeat(y01, 3, axis=-1)
    # one batched VGG call for both inputs (per-sample network: equivalent
    # to two calls, half the kernel launches)
    b = x01.shape[0]
    fboth = vgg.apply(vgg_variables, normalize_imagenet(jnp.concatenate([x01, y01], axis=0)))
    fx = {k: v[:b] for k, v in fboth.items()}
    fy = {k: v[b:] for k, v in fboth.items()}
    loss = jnp.float32(0.0)
    for tap in PERCEPTUAL_TAPS:
        a = instance_norm(fx[tap].astype(jnp.float32))
        b = instance_norm(fy[tap].astype(jnp.float32))
        loss = loss + _WEIGHTS[tap] * jnp.mean((a - b) ** 2)
    return loss
