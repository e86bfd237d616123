"""Adversarial losses as pure functions.

Covers every mode of the reference GANLoss (reference: losses.py:255-411):
``ls`` / ``original`` (BCE-with-logits) / ``w`` (wasserstein) / ``hinge`` /
``rahinge`` (relativistic average hinge — the default, config.py:12) /
``rals`` (relativistic average least squares).

Call contract matches the trainer's usage (reference: trainer.py:92,104):
``multiscale_gan_loss(real_preds, fake_preds, mode, for_discriminator)`` where
the preds are the 5-scale lists produced by the discriminator; per-scale
losses are summed.

Note: the reference trainer always passes ``for_real=None, for_fake=None``,
which makes the non-relativistic modes raise at runtime (losses.py:300-320
dispatch on ``for_real``/``for_fake``).  Here the non-relativistic modes are
given the standard D/G composition (real hinge + fake hinge, etc.) instead of
reproducing that crash — a documented deliberate deviation.
"""

from __future__ import annotations

from typing import List, Sequence, Union

import jax.numpy as jnp
from jax.nn import relu

Array = jnp.ndarray


def _bce(logits: Array, target: float) -> Array:
    # numerically stable mean binary cross entropy with logits
    return jnp.mean(relu(logits) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def gan_loss(
    real_preds: Array,
    fake_preds: Array,
    mode: str = "rahinge",
    for_discriminator: bool = True,
) -> Array:
    """Single-scale adversarial loss.

    Relativistic modes follow losses.py:348-377 exactly; classic modes use
    the standard compositions over (real, fake) prediction maps.
    """
    r = real_preds.astype(jnp.float32)
    f = fake_preds.astype(jnp.float32)
    if mode == "rahinge":
        r_f = r - jnp.mean(f)
        f_r = f - jnp.mean(r)
        if for_discriminator:
            return (jnp.mean(relu(1.0 - r_f)) + jnp.mean(relu(1.0 + f_r))) / 2.0
        return (jnp.mean(relu(1.0 + r_f)) + jnp.mean(relu(1.0 - f_r))) / 2.0
    if mode == "rals":
        r_f = r - jnp.mean(f)
        f_r = f - jnp.mean(r)
        if for_discriminator:
            return (jnp.mean((r_f - 1.0) ** 2) + jnp.mean((f_r + 1.0) ** 2)) / 2.0
        return (jnp.mean((r_f + 1.0) ** 2) + jnp.mean((f_r - 1.0) ** 2)) / 2.0
    if mode == "hinge":
        if for_discriminator:
            # -mean(min(r-1, 0)) - mean(min(-f-1, 0))  (losses.py:321-345)
            return jnp.mean(relu(1.0 - r)) + jnp.mean(relu(1.0 + f))
        return -jnp.mean(f)
    if mode == "ls":
        if for_discriminator:
            return jnp.mean((r - 1.0) ** 2) + jnp.mean(f**2)
        return jnp.mean((f - 1.0) ** 2)
    if mode == "original":
        if for_discriminator:
            return _bce(r, 1.0) + _bce(f, 0.0)
        return _bce(f, 1.0)
    if mode == "w":
        if for_discriminator:
            return jnp.mean(f) - jnp.mean(r)
        return -jnp.mean(f)
    raise ValueError(f"Unexpected gan_mode {mode}")


def multiscale_gan_loss(
    real_preds: Union[Array, Sequence[Array]],
    fake_preds: Union[Array, Sequence[Array]],
    mode: str = "rahinge",
    for_discriminator: bool = True,
) -> Array:
    """Sum of per-scale losses over the 5 D scales (reference: losses.py:393-409)."""
    if not isinstance(real_preds, (list, tuple)):
        return gan_loss(real_preds, fake_preds, mode, for_discriminator)
    total = jnp.float32(0.0)
    for r, f in zip(real_preds, fake_preds):
        total = total + gan_loss(r, f, mode, for_discriminator)
    return total
