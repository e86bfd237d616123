"""NIMA aesthetic scorer: MobileNetV2 backbone + 10-bucket softmax head.

Parity targets (reference: metrics/NIMA/CalcNIMA.py:23-42 and
metrics/NIMA/mobile_net_v2.py:57-120): width-1.0 MobileNetV2 (classifier
stripped; global 7x7 average pool) feeding [ReLU, Dropout .75, Linear
1280 -> 10, Softmax].  Inputs are Resize(short side 256) -> CenterCrop(224)
-> [0,1] floats with NO ImageNet normalization (CalcNIMA.py:45-55).

Runs batched on-device here — the reference scored one PIL image at a time.
Pretrained weights (absent from the reference mount) convert via
:func:`uegan_tpu.convert.torch_import.import_nima`.
"""

from __future__ import annotations

from typing import Any, List, Tuple

import jax
import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn

from uegan_tpu.ops.pooling import avg_pool

Dtype = Any

# (expand_ratio t, out_channels c, repeats n, stride s)
INVERTED_RESIDUAL_SETTING: List[Tuple[int, int, int, int]] = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]
LAST_CHANNEL = 1280


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    groups: int = 1
    relu6: bool = False
    relu: bool = True
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel
        pad = (k - 1) // 2
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            jax.nn.initializers.he_normal(),
            (k, k, cin // self.groups, self.features),
            self.param_dtype,
        )
        f32 = self.dtype == jnp.float32
        y = lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups,
            preferred_element_type=jnp.float32 if f32 else None,
            precision=lax.Precision.HIGHEST if f32 else lax.Precision.DEFAULT,
        )
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(y)
        if self.relu:
            y = jnp.clip(y, 0.0, 6.0) if self.relu6 else nn.relu(y)
        return y.astype(self.dtype)


class InvertedResidual(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        hidden = cin * self.expand_ratio
        use_res = self.stride == 1 and cin == self.features
        h = _ConvBN(hidden, 1, 1, relu6=True, dtype=self.dtype, param_dtype=self.param_dtype, name="pw")(x, train)
        h = _ConvBN(hidden, 3, self.stride, groups=hidden, relu6=True, dtype=self.dtype, param_dtype=self.param_dtype, name="dw")(h, train)
        h = _ConvBN(self.features, 1, 1, relu=False, dtype=self.dtype, param_dtype=self.param_dtype, name="pw_linear")(h, train)
        return x + h if use_res else h


class MobileNetV2Features(nn.Module):
    """MobileNetV2 trunk ending after the global average pool, (N,1280)."""

    input_size: int = 224
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = _ConvBN(32, 3, 2, relu6=False, dtype=self.dtype, param_dtype=self.param_dtype, name="stem")(x, train)
        i = 0
        for t, c, n, s in INVERTED_RESIDUAL_SETTING:
            for j in range(n):
                h = InvertedResidual(
                    features=c,
                    stride=s if j == 0 else 1,
                    expand_ratio=t,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"block{i}",
                )(h, train)
                i += 1
        h = _ConvBN(LAST_CHANNEL, 1, 1, relu6=False, dtype=self.dtype, param_dtype=self.param_dtype, name="head_conv")(h, train)
        h = avg_pool(h, h.shape[1], h.shape[1])  # global pool (input//32)
        return h.reshape(h.shape[0], -1)


class NIMA(nn.Module):
    """MobileNetV2 features + [ReLU, Dropout .75, Linear 1280->10, Softmax]."""

    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32
    dropout_rate: float = 0.75

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = MobileNetV2Features(dtype=self.dtype, param_dtype=self.param_dtype, name="base")(x, train)
        h = nn.relu(h)
        h = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(h)
        h = nn.Dense(10, dtype=self.dtype, param_dtype=self.param_dtype, name="fc")(h)
        return nn.softmax(h.astype(jnp.float32), axis=-1)


def score_stats(probs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mean = sum j*p_j (j=1..10); std = sqrt(sum p_j (j-mean)^2)
    (reference: metrics/NIMA/CalcNIMA.py:86-91)."""
    buckets = jnp.arange(1, 11, dtype=jnp.float32)
    mean = jnp.sum(probs * buckets, axis=-1)
    std = jnp.sqrt(jnp.sum(probs * (buckets - mean[:, None]) ** 2, axis=-1))
    return mean, std
