"""Normalization primitives (NHWC).

- ``instance_norm``: torch ``nn.InstanceNorm2d`` parity (biased variance,
  eps=1e-5), used non-affine inside GAM (reference: models.py:227,236) and
  inside the perceptual loss (reference: losses.py:18,30-34).
- ``feature_mean_std``: the GAM statistics op — per-(N,C) mean and *unbiased*
  std over H*W (torch ``.var(dim=2)`` default; reference: models.py:204-212).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp


def instance_norm(
    x: jnp.ndarray,
    eps: float = 1e-5,
    scale: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Per-instance, per-channel normalization over H,W (biased variance)."""
    acc = x.astype(jnp.float32)
    # one HBM pass for both moments (like feature_mean_std): the centered
    # two-pass form re-reads the full feature map for the variance.
    # f32 E[x^2]-E[x]^2 loses ~2*log10(|mean|/std) digits to cancellation —
    # still within a few % at |mean|/std ~ 3e2 (test-pinned); conv/VGG
    # features stay orders of magnitude below that ratio
    mean = jnp.mean(acc, axis=(1, 2), keepdims=True)
    sq = jnp.mean(acc * acc, axis=(1, 2), keepdims=True)
    var = jnp.maximum(sq - mean * mean, 0.0)
    y = (acc - mean) * jax_rsqrt(var + eps)
    if scale is not None:
        y = y * scale
    if bias is not None:
        y = y + bias
    return y.astype(x.dtype)


def jax_rsqrt(v):
    import jax.lax as lax

    return lax.rsqrt(v)


def feature_mean_std(x: jnp.ndarray, eps: float = 1e-5) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GAM global statistics: mean/std over H*W per (N, C).

    Matches ``calc_mean_std`` (reference: models.py:204-212): variance is
    *unbiased* (N-1 denominator, torch ``.var`` default), eps added to the
    variance before sqrt.  Returns tensors shaped (N, 1, 1, C).
    """
    n, h, w, c = x.shape
    acc = x.astype(jnp.float32)
    # single HBM pass: both moments reduce in one fused loop (the two-pass
    # centered form re-read the full feature map and was ~10x slower on TPU)
    hw = h * w
    mean = jnp.mean(acc, axis=(1, 2), keepdims=True)
    sq = jnp.mean(acc * acc, axis=(1, 2), keepdims=True)
    var = (sq - mean * mean) * (hw / max(hw - 1, 1))
    std = jnp.sqrt(jnp.maximum(var, 0.0) + eps)
    return mean.astype(x.dtype), std.astype(x.dtype)
