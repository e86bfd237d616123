"""Learning-rate schedules and optimizer construction.

LR parity (reference: trainer.py:335-351 + config.py:37-45):
- TTUR Adam: g_lr 1e-4 / d_lr 4e-4, betas (0.5, 0.999), eps 1e-8, and torch
  Adam-style L2 weight decay 1e-4 (added to the gradient *before* the moment
  updates — not decoupled AdamW).
- LambdaLR linear decay: lr(epoch) = base * (1 - max(0, epoch+1-50)/50),
  applied from the start of each epoch (the reference steps the scheduler at
  the first step of every epoch with epoch = step // steps_per_epoch).
- RMSprop option: alpha 0.9 (reference: trainer.py:339-342).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def lambda_linear_decay(epoch, num_epochs_decay: int = 50, decay_ratio: int = 50):
    """The reference's LambdaLR rule (reference: trainer.py:348-349)."""
    e = jnp.asarray(epoch, jnp.float32)
    factor = 1.0 - jnp.maximum(0.0, e + 1.0 - num_epochs_decay) / decay_ratio
    return jnp.maximum(factor, 0.0)


def make_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    lr_decay: bool = True,
    num_epochs_decay: int = 50,
    decay_ratio: int = 50,
):
    def schedule(step):
        if not lr_decay:
            return jnp.asarray(base_lr, jnp.float32)
        epoch = jnp.asarray(step, jnp.int32) // max(steps_per_epoch, 1)
        return base_lr * lambda_linear_decay(epoch, num_epochs_decay, decay_ratio)

    return schedule


def make_optimizer(
    optimizer_type: str,
    base_lr: float,
    steps_per_epoch: int,
    beta1: float = 0.5,
    beta2: float = 0.999,
    alpha: float = 0.9,
    weight_decay: float = 1e-4,
    lr_decay: bool = True,
    num_epochs_decay: int = 50,
    decay_ratio: int = 50,
) -> optax.GradientTransformation:
    schedule = make_lr_schedule(base_lr, steps_per_epoch, lr_decay, num_epochs_decay, decay_ratio)
    if optimizer_type == "adam":
        return optax.chain(
            # torch-Adam weight_decay: L2 term enters the gradient first
            optax.add_decayed_weights(weight_decay),
            optax.scale_by_adam(b1=beta1, b2=beta2, eps=1e-8),
            optax.scale_by_learning_rate(schedule),
        )
    if optimizer_type == "rmsprop":
        return optax.chain(
            optax.scale_by_rms(decay=alpha, eps=1e-8),
            optax.scale_by_learning_rate(schedule),
        )
    raise NotImplementedError(f"Optimizer [{optimizer_type}] is not found")
