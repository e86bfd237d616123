"""VGG19 feature extractor for the perceptual ("fidelity") loss.

Parity with VGG19_relu (reference: losses.py:39-164): the torchvision VGG19
feature trunk, tapped at relu1_1 / relu2_1 / relu3_1 / relu4_1 / relu5_1
(only those five feed the loss, losses.py:30-34).  Convs are 3x3 stride 1
zero-padded ("SAME"), max-pool 2x2 between stages.

The reference downloads pretrained torchvision weights; in this zero-egress
environment :func:`uegan_tpu.convert.torch_import.import_vgg19` converts a
local ``vgg19-*.pth`` when provided (``--vgg_weights``), otherwise the
extractor is seeded deterministically — training still runs; perceptual
numbers then differ from the pretrained-weight reference (documented
deviation, revisit when weights are supplied).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# (name, out_channels); pools sit before conv*_1 of stages 2-5.
VGG19_CFG: List[Tuple[str, int]] = [
    ("conv1_1", 64),
    ("conv1_2", 64),
    ("conv2_1", 128),
    ("conv2_2", 128),
    ("conv3_1", 256),
    ("conv3_2", 256),
    ("conv3_3", 256),
    ("conv3_4", 256),
    ("conv4_1", 512),
    ("conv4_2", 512),
    ("conv4_3", 512),
    ("conv4_4", 512),
    ("conv5_1", 512),
    ("conv5_2", 512),
    ("conv5_3", 512),
    ("conv5_4", 512),
]
# taps used by the perceptual loss (reference: losses.py:30-34)
PERCEPTUAL_TAPS = ("relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1")
_POOL_BEFORE = {"conv2_1", "conv3_1", "conv4_1", "conv5_1"}

# torchvision vgg19.features indices of each conv, for weight conversion
TORCH_FEATURE_INDEX = {
    "conv1_1": 0, "conv1_2": 2,
    "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14, "conv3_4": 16,
    "conv4_1": 19, "conv4_2": 21, "conv4_3": 23, "conv4_4": 25,
    "conv5_1": 28, "conv5_2": 30, "conv5_3": 32, "conv5_4": 34,
}

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), padding="VALID"
    )


class VGG19Features(nn.Module):
    """Frozen VGG19 trunk returning the relu*_1 taps (NHWC).

    ``max_stage`` lets callers stop early; the perceptual loss needs all 5.
    """

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    taps: Tuple[str, ...] = PERCEPTUAL_TAPS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        needed_stage = max(int(t[4]) for t in self.taps)
        out: Dict[str, jnp.ndarray] = {}
        h = x.astype(self.dtype)
        for name, feats in VGG19_CFG:
            stage = int(name[4])
            if stage > needed_stage:
                break
            if name in _POOL_BEFORE:
                h = _max_pool_2x2(h)
            cin = h.shape[-1]
            kernel = self.param(
                f"{name}_kernel",
                jax.nn.initializers.he_normal(),
                (3, 3, cin, feats),
                self.param_dtype,
            )
            bias = self.param(
                f"{name}_bias", jax.nn.initializers.zeros, (feats,), self.param_dtype
            )
            f32 = self.dtype == jnp.float32
            h = lax.conv_general_dilated(
                h,
                kernel.astype(self.dtype),
                window_strides=(1, 1),
                padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32 if f32 else None,
                precision=lax.Precision.HIGHEST if f32 else lax.Precision.DEFAULT,
            )
            h = (h + bias.astype(h.dtype)).astype(self.dtype)
            h = nn.relu(h)
            tap = "relu" + name[4:]
            if tap in self.taps:
                out[tap] = h
        return out


def vgg_features_from(
    params: Dict[str, jnp.ndarray],
    h: jnp.ndarray,
    dtype: Dtype,
    taps: Tuple[str, ...] = PERCEPTUAL_TAPS,
    start_stage: int = 1,
    pooled_input: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Run the VGG trunk from ``start_stage`` on an explicit param dict.

    Same math as :class:`VGG19Features.__call__`; used by the packed
    perceptual fast path to resume after a stage executed in the
    space-to-depth domain (``pooled_input=True`` means the pool preceding
    ``conv<start_stage>_1`` was already applied by the caller).
    """
    if pooled_input and start_stage < 2:
        raise ValueError(
            "pooled_input=True implies the pool before conv<start_stage>_1 "
            "was already applied, but stage 1 has no preceding pool"
        )
    needed_stage = max(int(t[4]) for t in taps)
    out: Dict[str, jnp.ndarray] = {}
    h = h.astype(dtype)
    skip_pool = pooled_input
    f32 = dtype == jnp.float32
    for name, feats in VGG19_CFG:
        stage = int(name[4])
        if stage < start_stage:
            continue
        if stage > needed_stage:
            break
        if name in _POOL_BEFORE:
            if skip_pool:
                skip_pool = False
            else:
                h = _max_pool_2x2(h)
        h = lax.conv_general_dilated(
            h,
            params[f"{name}_kernel"].astype(dtype),
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32 if f32 else None,
            precision=lax.Precision.HIGHEST if f32 else lax.Precision.DEFAULT,
        )
        h = nn.relu((h + params[f"{name}_bias"].astype(h.dtype)).astype(dtype))
        tap = "relu" + name[4:]
        if tap in taps:
            out[tap] = h
    return out


def normalize_imagenet(x01: jnp.ndarray) -> jnp.ndarray:
    """[0,1] RGB -> ImageNet-normalized (reference: losses.py:19-20,26-27)."""
    mean = jnp.asarray(IMAGENET_MEAN, dtype=jnp.float32)
    std = jnp.asarray(IMAGENET_STD, dtype=jnp.float32)
    return (x01.astype(jnp.float32) - mean) / std
