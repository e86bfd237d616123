"""NN building blocks (Flax, NHWC) with reference-block parity.

Maps the reference's block library (reference: models.py:77-281) onto
TPU-idiomatic primitives:

- ``SNConv``        = ReflectionPad + (optionally spectrally normalized) conv
                      (reference: models.py:77-86)
- ``ConvBlock``     = SNConv + norm + activation (reference: models.py:88-101)
- ``GAM``           = global attention module: per-channel mean/std over H,W ->
                      1x1 squeeze-excite -> broadcast concat -> 1x1 fuse ->
                      InstanceNorm (reference: models.py:215-237)
- ``NormLayer``     = BatchNorm / InstanceNorm (affine, running stats) / none
                      (reference: models.py:272-281)
- ``get_act_fun``   = LeakyReLU(0.2) / ReLU / Swish / SELU / none
                      (reference: models.py:249-264)

Convs run in ``dtype`` (bfloat16 by default on TPU) with float32 accumulation
on the MXU; params stay in ``param_dtype``.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.lax as lax
import jax.numpy as jnp
from flax import linen as nn

from uegan_tpu.ops.norms import feature_mean_std, instance_norm
from uegan_tpu.ops.spectral_norm import init_uv, spectral_normalize, spectral_sigmas
from uegan_tpu.models.initializers import get_initializer

Dtype = Any


def get_act_fun(act_fun_type: str = "LeakyReLU") -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation factory (reference: models.py:249-264)."""
    if act_fun_type == "LeakyReLU":
        return lambda x: nn.leaky_relu(x, negative_slope=0.2)
    if act_fun_type == "ReLU":
        return nn.relu
    if act_fun_type == "Swish":
        return lambda x: x * nn.sigmoid(x)
    if act_fun_type == "SELU":
        return nn.selu
    if act_fun_type == "none":
        return lambda x: x
    raise NotImplementedError(f"activation function [{act_fun_type}] is not found")


# conv2d_nhwc re-exported for backwards compatibility; the pad+conv pair in
# SNConv goes through conv2d_reflect (zero-pad conv + border fix-up — no
# materialized pad tensor; see ops/conv.py).
from uegan_tpu.ops.conv import conv2d_nhwc, conv2d_reflect  # noqa: E402


class SNConv(nn.Module):
    """Reflect-pad + conv with optional spectral norm (reference: models.py:77-86).

    Padding is self-computed as ``(k + (k-1)(d-1) - 1)//2`` so any kernel size
    keeps spatial dims (for stride 1).  Spectral-norm power-iteration state
    lives in the 'spectral' variable collection and is updated only when
    ``update_sn=True`` and the collection is mutable (i.e. inside the train
    step) — torch runs one iteration per forward in train mode.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    use_sn: bool = False
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        update_sn: bool = True,
        aux: Optional[jnp.ndarray] = None,
        sn_branches: int = 1,
    ) -> jnp.ndarray:
        """``aux``: optional (N, 1, 1, Ca) spatially-constant extra input.

        Equivalent to calling the conv on ``concat([x, broadcast(aux)], -1)``
        (the kernel keeps the concat shape), but the aux contribution is a
        per-image (N, Ca) @ (Ca, F) matmul added as a bias — the broadcast
        tensor and the concat copy are never materialized.  1x1/stride-1
        only (the GAM fuse geometry).

        ``sn_branches`` > 1: ``x`` is a batch-concat of that many equal-size
        branches that torch would have run as sequential forwards.  With
        spectral norm this runs ONE conv on the raw kernel and scales each
        branch's output by its own 1/sigma_i (sigma after i power iterations)
        — exact torch-SN semantics for the fused discriminator phases.
        """
        k = self.kernel_size
        caux = 0 if aux is None else aux.shape[-1]
        cin = x.shape[-1] + caux
        kinit = self.kernel_init or get_initializer("orthogonal", 0.02)
        kernel = self.param("kernel", kinit, (k, k, cin, self.features), self.param_dtype)
        post_scale = None
        if self.use_sn:
            kshape = (k, k, cin, self.features)
            uv0 = lambda: init_uv(self.make_rng("params"), kshape)
            u = self.variable("spectral", "u", lambda: uv0()[0])
            v = self.variable("spectral", "v", lambda: uv0()[1])
            if sn_branches > 1:
                sig, u_new, v_new = spectral_sigmas(
                    kernel, u.value, v.value, sn_branches, update=update_sn
                )
                w, post_scale = kernel, sig
            else:
                w, u_new, v_new = spectral_normalize(kernel, u.value, v.value, update=update_sn)
            if update_sn and not self.is_initializing() and self.is_mutable_collection("spectral"):
                u.value = u_new
                v.value = v_new
        else:
            w = kernel
        if aux is None:
            y = conv2d_reflect(x, w, self.stride, self.dilation, self.dtype)
        else:
            assert k == 1 and self.stride == 1 and self.dilation == 1, (
                "aux (split-concat) input requires a 1x1 stride-1 conv"
            )
            cx = x.shape[-1]
            y = conv2d_reflect(x, w[:, :, :cx, :], 1, 1, self.dtype)
            hv = jnp.einsum(
                "nc,cf->nf",
                aux.reshape(aux.shape[0], caux).astype(self.dtype),
                w[0, 0, cx:, :].astype(self.dtype),
            )
            y = y + hv[:, None, None, :].astype(y.dtype)
        if post_scale is not None:
            n = x.shape[0]
            assert n % sn_branches == 0, "sn_branches must divide the batch"
            scale = jnp.repeat(1.0 / post_scale, n // sn_branches)  # (N,) f32
            y = (y.astype(jnp.float32) * scale[:, None, None, None]).astype(self.dtype)
        if self.use_bias:
            b = self.param("bias", jax.nn.initializers.zeros, (self.features,), self.param_dtype)
            y = y + b.astype(y.dtype)
        return y.astype(self.dtype)


class NormLayer(nn.Module):
    """BatchNorm / InstanceNorm (affine=True, track_running_stats=True) / none.

    Torch parity (reference: models.py:272-281): momentum 0.1, eps 1e-5;
    normalization uses biased variance, running_var stores the unbiased
    estimate; eval uses the running statistics.
    """

    kind: str  # 'BatchNorm' | 'InstanceNorm' | 'none'
    features: int
    momentum: float = 0.1
    eps: float = 1e-5
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        if self.kind == "none":
            return x
        if self.kind not in ("BatchNorm", "InstanceNorm"):
            raise NotImplementedError(f"normalization function [{self.kind}] is not found")
        c = self.features
        scale = self.param("scale", jax.nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", jax.nn.initializers.zeros, (c,), self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        acc = x.astype(jnp.float32)
        n, h, w, _ = acc.shape
        if train:
            if self.kind == "BatchNorm":
                mean = jnp.mean(acc, axis=(0, 1, 2))
                var = jnp.mean(jnp.square(acc - mean), axis=(0, 1, 2))
                cnt = n * h * w
                norm_mean, norm_var = mean, var  # broadcast over (N,H,W,C)
                run_mean, run_var = mean, var * cnt / max(cnt - 1, 1)
            else:  # InstanceNorm: per-instance stats, running = batch average
                mean = jnp.mean(acc, axis=(1, 2), keepdims=True)  # (N,1,1,C)
                var = jnp.mean(jnp.square(acc - mean), axis=(1, 2), keepdims=True)
                cnt = h * w
                norm_mean, norm_var = mean, var
                run_mean = jnp.mean(mean, axis=(0, 1, 2))
                run_var = jnp.mean(var, axis=(0, 1, 2)) * cnt / max(cnt - 1, 1)
            if not self.is_initializing() and self.is_mutable_collection("batch_stats"):
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * run_mean
                ra_var.value = (1 - m) * ra_var.value + m * run_var
        else:
            norm_mean, norm_var = ra_mean.value, ra_var.value

        y = (acc - norm_mean) * lax.rsqrt(norm_var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class ConvBlock(nn.Module):
    """ReflectionPad + (SN)Conv + norm + activation (reference: models.py:88-101).

    Also used for the discriminator stages (``dis_conv_block``,
    reference: models.py:158-167 — identical structure).
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    norm_fun: str = "none"
    act_fun: str = "LeakyReLU"
    use_sn: bool = False
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True, update_sn: bool = True, sn_branches: int = 1
    ) -> jnp.ndarray:
        y = SNConv(
            features=self.features,
            kernel_size=self.kernel_size,
            stride=self.stride,
            dilation=self.dilation,
            use_bias=self.use_bias,
            use_sn=self.use_sn,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x, update_sn=update_sn, sn_branches=sn_branches)
        y = NormLayer(
            kind=self.norm_fun,
            features=self.features,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="norm",
        )(y, train=train)
        return get_act_fun(self.act_fun)(y)


class PredConvBlock(nn.Module):
    """Discriminator prediction head (reference: models.py:170-182).

    ReflectionPad + conv (no bias) + tanh (hinge/rahinge) or sigmoid (ls/rals).
    """

    kernel_size: int
    adv_loss_type: str = "rahinge"
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = SNConv(
            features=1,
            kernel_size=self.kernel_size,
            stride=1,
            use_bias=False,
            use_sn=False,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="conv",
        )(x)
        if self.adv_loss_type in ("ls", "rals"):
            return nn.sigmoid(y)
        if self.adv_loss_type in ("hinge", "rahinge"):
            return nn.tanh(y)
        if self.adv_loss_type in ("original", "w"):
            # raw logits: the reference only builds heads for the 4 saturating
            # types (models.py:175-180); logits are the natural extension for
            # the BCE-with-logits ('original') and wasserstein ('w') modes.
            return y
        raise NotImplementedError(f"Adversarial loss [{self.adv_loss_type}] is not found")


class GAM(nn.Module):
    """Global attention module (reference: models.py:215-237).

    Statistics (mean/unbiased-std over H*W) are a global-extent reduction; in
    spatially sharded inference GSPMD turns them into cross-device psums —
    the spatial analog of sequence-parallel attention statistics.
    """

    out_nc: int
    reduction: int = 8
    use_bias: bool = False
    use_sn: bool = False
    norm: bool = True
    # split_fuse skips materializing the broadcast+concat before the 1x1 fuse
    # conv: fuse(concat([x, bcast(h)])) == conv(x, W_x) + h @ W_h + b exactly
    # (same params; only f32-summation order differs).  Saves a full-size HBM
    # write+read per GAM — used by the packed fast paths.
    split_fuse: bool = False
    kernel_init: Optional[Callable] = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, update_sn: bool = True) -> jnp.ndarray:
        in_nc = x.shape[-1]
        mean, std = feature_mean_std(x)  # (N,1,1,C) each
        stats = jnp.concatenate([mean, std], axis=-1)  # (N,1,1,2C)
        h = SNConv(
            features=in_nc // self.reduction,
            kernel_size=1,
            use_bias=self.use_bias,
            use_sn=False,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="squeeze",
        )(stats)
        h = nn.relu(h)
        h = SNConv(
            features=self.out_nc,
            kernel_size=1,
            use_bias=self.use_bias,
            use_sn=False,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="excite",
        )(h)
        fuse = SNConv(
            features=self.out_nc,
            kernel_size=1,
            use_bias=True,
            use_sn=self.use_sn,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="fuse",
        )
        if self.split_fuse:
            out = fuse(x, update_sn=update_sn, aux=h)
        else:
            hb = jnp.broadcast_to(h, x.shape[:3] + (h.shape[-1],))
            out = jnp.concatenate([x, hb], axis=-1)
            out = fuse(out, update_sn=update_sn)
        if self.norm:
            out = instance_norm(out)  # non-affine, eps=1e-5 (models.py:227)
        return out
