"""NIMA training: EMD loss over MobileNetV2, jitted train step.

Parity with the vendored trainer (reference: metrics/NIMA/nima/nima/train/
main.py:81-121 and emd_loss.py:6-18): squared-EMD (r=2) loss between
predicted and ground-truth 10-bucket distributions, Adam, per-epoch
validation.  Differences by design: single jitted step with BatchNorm state
threaded functionally, batched device pipeline, orbax checkpoints.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uegan_tpu.losses.extra import emd_loss
from uegan_tpu.models.nima import NIMA
from uegan_tpu.nima_train.dataset import AVADataset


def make_nima_train_step(model: NIMA, tx: optax.GradientTransformation):
    def step(params, batch_stats, opt_state, rng, images, targets):
        def loss_fn(p):
            probs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
                rngs={"dropout": rng},
            )
            return emd_loss(targets, probs), mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step


def validate_nima(model: NIMA, variables, dataset: AVADataset, batch_size: int = 16) -> float:
    fn = jax.jit(lambda b: model.apply(variables, b, train=False))
    batch_size = max(1, min(batch_size, len(dataset)))
    losses = []
    for images, targets in dataset.batches(batch_size, shuffle=False):
        probs = fn(jnp.asarray(images))
        losses.append(float(emd_loss(jnp.asarray(targets), probs)))
    return float(np.mean(losses)) if losses else float("nan")


def train_nima(
    train_csv: str,
    val_csv: str,
    out_dir: str,
    epochs: int = 5,
    batch_size: int = 32,
    lr: float = 3e-4,
    seed: int = 1990,
    init_weights: str = "",
    verbose: bool = True,
    compute_dtype: str = "float32",
) -> Dict[str, float]:
    os.makedirs(out_dir, exist_ok=True)
    # bfloat16 compute runs the MBv2 convs at the native MXU rate — v5e
    # emulates f32 matmuls ~8x slower (params/optimizer state stay f32)
    model = NIMA(dtype=jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32)
    rng = jax.random.PRNGKey(seed)
    if init_weights and os.path.exists(init_weights):
        from uegan_tpu.convert.torch_import import import_nima

        variables = import_nima(init_weights)
    else:
        variables = model.init(rng, jnp.zeros((1, 224, 224, 3)))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step_fn = jax.jit(make_nima_train_step(model, tx))

    train_ds = AVADataset(train_csv, train=True, seed=seed)
    val_ds = AVADataset(val_csv, train=False, seed=seed)

    best_val = float("inf")
    history = {}
    batch_size = max(1, min(batch_size, len(train_ds)))
    for epoch in range(epochs):
        losses = []
        for images, targets in train_ds.batches(batch_size, epoch=epoch):
            rng, sub = jax.random.split(rng)
            params, batch_stats, opt_state, loss = step_fn(
                params, batch_stats, opt_state, sub, jnp.asarray(images), jnp.asarray(targets)
            )
            losses.append(float(loss))
        val_loss = validate_nima(model, {"params": params, "batch_stats": batch_stats}, val_ds)
        history[f"epoch{epoch}"] = val_loss
        if verbose:
            print(f"[nima] epoch {epoch}: train EMD {np.mean(losses):.4f}, val EMD {val_loss:.4f}")
        if val_loss < best_val:
            best_val = val_loss
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(
                os.path.join(os.path.abspath(out_dir), "nima_best"),
                {"params": params, "batch_stats": batch_stats},
                force=True,
            )
            ckptr.wait_until_finished()
    history["best_val"] = best_val
    return history
