"""Multi-scale PatchGAN discriminator.

Parity with the reference Discriminator (reference: models.py:104-155):
5 stride-2 stages (k7,k7,k7,k5,k5; 3 -> 32 -> 64 -> 128 -> 256 -> 512), each with
a bias-free 1-channel prediction head (k7/k7/k7/k5/k5, stride 1) whose output
activation is tanh for hinge/rahinge and sigmoid for ls/rals.  Returns the
list of 5 prediction maps at input/2 ... input/32.  Spectral norm on by default
(reference: config.py:24).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from uegan_tpu.models.blocks import ConvBlock, PredConvBlock

Dtype = Any


class Discriminator(nn.Module):
    conv_dim: int = 32
    norm_fun: str = "none"
    act_fun: str = "LeakyReLU"
    use_sn: bool = True
    adv_loss_type: str = "rahinge"
    remat: bool = False
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        update_sn: bool = True,
        sn_branches: int = 1,
    ) -> List[jnp.ndarray]:
        """``sn_branches`` > 1: ``x`` batch-concats that many branches torch
        would run sequentially; each SN conv scales each branch by its own
        per-iteration sigma (exact fused-forward SN semantics — see SNConv)."""
        cd = self.conv_dim
        stage_cfg = [  # (features, stage kernel) — reference: models.py:109-126
            (cd * 1, 7),
            (cd * 2, 7),
            (cd * 4, 7),
            (cd * 8, 5),
            (cd * 16, 5),
        ]
        preds = []
        h = x
        block_cls = nn.remat(ConvBlock, static_argnums=(2, 3, 4)) if self.remat else ConvBlock
        for i, (feat, k) in enumerate(stage_cfg, start=1):
            h = block_cls(
                features=feat,
                kernel_size=k,
                stride=2,
                use_bias=True,
                norm_fun=self.norm_fun,
                act_fun=self.act_fun,
                use_sn=self.use_sn,
                kernel_init=self.kernel_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"d{i}",
            )(h, train, update_sn, sn_branches)
            preds.append(
                PredConvBlock(
                    kernel_size=k,
                    adv_loss_type=self.adv_loss_type,
                    kernel_init=self.kernel_init,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"d{i}_pred",
                )(h)
            )
        return preds
