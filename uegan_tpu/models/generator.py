"""UEGAN generator: fully-convolutional U-Net with GAM-modulated skips.

Architecture parity with the reference Generator (reference: models.py:10-74):

- encoder: 5 ConvBlocks — k7/s1 then 4x k3/s2 (3 -> 32 -> 64 -> 128 -> 256 -> 512)
- bottleneck GAM on x5
- decoder: 4x [bilinear x2 (align_corners=True) + 1x1 conv], each concatenated
  with GAM(skip) and refined by a k3/s1 ConvBlock
- output head dec5: k3 conv + k7 conv + tanh on (y4 * x1), no SN regardless of
  ``use_sn`` (reference: models.py:32-36)
- global residual: out = clamp(dec5(y4*x1) + x, -1, 1)

Input must have H, W divisible by 16 (4 stride-2 stages).  NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from uegan_tpu.models.blocks import ConvBlock, GAM, SNConv, get_act_fun
from uegan_tpu.ops.resize import upsample2x_align_corners

Dtype = Any


class Generator(nn.Module):
    conv_dim: int = 32
    norm_fun: str = "none"
    act_fun: str = "LeakyReLU"
    use_sn: bool = False
    remat: bool = False  # rematerialize conv blocks (trades FLOPs for HBM)
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    def _block(self, features: int, k: int, s: int, name: str) -> ConvBlock:
        cls = nn.remat(ConvBlock, static_argnums=(2, 3)) if self.remat else ConvBlock
        return cls(
            features=features,
            kernel_size=k,
            stride=s,
            use_bias=True,
            norm_fun=self.norm_fun,
            act_fun=self.act_fun,
            use_sn=self.use_sn,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

    def _up(self, features: int, name: str) -> SNConv:
        return SNConv(
            features=features,
            kernel_size=1,
            stride=1,
            use_bias=True,
            use_sn=self.use_sn,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

    def _gam(self, nc: int, name: str) -> GAM:
        return GAM(
            out_nc=nc,
            reduction=8,
            use_bias=False,
            use_sn=self.use_sn,
            norm=True,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name=name,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True, update_sn: bool = True) -> jnp.ndarray:
        cd = self.conv_dim

        # encoder (reference: models.py:16-20,46-50); train/update_sn are
        # positional so nn.remat can treat them as static
        x1 = self._block(cd * 1, 7, 1, "enc1")(x, train, update_sn)
        x2 = self._block(cd * 2, 3, 2, "enc2")(x1, train, update_sn)
        x3 = self._block(cd * 4, 3, 2, "enc3")(x2, train, update_sn)
        x4 = self._block(cd * 8, 3, 2, "enc4")(x3, train, update_sn)
        x5 = self._block(cd * 16, 3, 2, "enc5")(x4, train, update_sn)
        x5 = self._gam(cd * 16, "ga5")(x5, update_sn=update_sn)

        # decoder (reference: models.py:23-31,54-68)
        y1 = self._up(cd * 8, "upsample1")(upsample2x_align_corners(x5), update_sn=update_sn)
        y1 = jnp.concatenate([y1, self._gam(cd * 8, "ga4")(x4, update_sn=update_sn)], axis=-1)
        y1 = self._block(cd * 8, 3, 1, "dec1")(y1, train, update_sn)

        y2 = self._up(cd * 4, "upsample2")(upsample2x_align_corners(y1), update_sn=update_sn)
        y2 = jnp.concatenate([y2, self._gam(cd * 4, "ga3")(x3, update_sn=update_sn)], axis=-1)
        y2 = self._block(cd * 4, 3, 1, "dec2")(y2, train, update_sn)

        y3 = self._up(cd * 2, "upsample3")(upsample2x_align_corners(y2), update_sn=update_sn)
        y3 = jnp.concatenate([y3, self._gam(cd * 2, "ga2")(x2, update_sn=update_sn)], axis=-1)
        y3 = self._block(cd * 2, 3, 1, "dec3")(y3, train, update_sn)

        y4 = self._up(cd * 1, "upsample4")(upsample2x_align_corners(y3), update_sn=update_sn)
        y4 = jnp.concatenate([y4, self._gam(cd * 1, "ga1")(x1, update_sn=update_sn)], axis=-1)
        y4 = self._block(cd * 1, 3, 1, "dec4")(y4, train, update_sn)

        # output head: modulation by the first feature map, then global
        # residual with clamp (reference: models.py:32-36,70-72)
        h = y4 * x1
        h = SNConv(
            features=cd,
            kernel_size=3,
            use_bias=True,
            use_sn=False,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="dec5_0",
        )(h)
        h = SNConv(
            features=3,
            kernel_size=7,
            use_bias=True,
            use_sn=False,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="dec5_1",
        )(h)
        res = nn.tanh(h)
        out = jnp.clip(res.astype(jnp.float32) + x.astype(jnp.float32), -1.0, 1.0)
        return out.astype(self.dtype)
