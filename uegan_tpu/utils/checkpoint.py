"""Checkpointing with the reference's logical schema, on orbax.

Reference checkpoints are epoch-granular 7-key dicts
{G_net, D_net, epoch, g_optimizer, d_optimizer, lr_scheduler_g,
lr_scheduler_d} named ``{version}_{adv_loss_type}_{epoch}.pth``
(reference: trainer.py:186-208); resume restores everything and recomputes
the start step (trainer.py:60-64,402-423).  Here a checkpoint directory
``{version}_{adv_loss_type}_{epoch}/`` holds the full TrainState pytree
(params, optimizer states, SN u/v, running stats, image pool, PRNG key) plus
the config JSON — scheduler state needs no storage because the LR is a pure
function of the step counter.

Torch ``.pth`` checkpoints published for the reference convert via
:mod:`uegan_tpu.convert.torch_import`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from uegan_tpu.config import Config


def ckpt_name(version: str, adv_loss_type: str, epoch) -> str:
    return f"{version}_{adv_loss_type}_{Config.epoch_tag(epoch)}"


def restore_eval_state(path: str, state_template: Any, use_ema: bool = True) -> Any:
    """Restore a TrainState from an orbax dir for INFERENCE consumers
    (serving, model export) that take a direct checkpoint path.

    Accepts checkpoints written with or without the Polyak/EMA slot
    regardless of the template's config (the one legitimate structure
    mismatch — see :meth:`CheckpointManager.restore`), and by default swaps
    the EMA copy in as the eval weights when the checkpoint carries one
    (``Config.ema_eval`` semantics)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    sds = ocp.utils.to_shape_dtype_struct
    try:
        state = ckptr.restore(path, jax.tree_util.tree_map(sds, state_template))
    except Exception:
        if not hasattr(state_template, "g_ema"):
            raise
        alt = state_template.replace(
            g_ema=None if state_template.g_ema is not None
            else state_template.g_params
        )
        state = ckptr.restore(path, jax.tree_util.tree_map(sds, alt))
    if use_ema and getattr(state, "g_ema", None) is not None:
        state = state.replace(g_params=state.g_ema)
    return state


class CheckpointManager:
    def __init__(self, model_save_path: str, config: Config):
        self.root = os.path.abspath(model_save_path)
        os.makedirs(self.root, exist_ok=True)
        self.config = config
        self._ckptr = ocp.StandardCheckpointer()
        if config.checkpoint_async:
            # async saves commit on a background thread; if the process
            # exits first, the commit races interpreter teardown ("cannot
            # schedule new futures after interpreter shutdown") and the
            # checkpoint is lost.  The Trainer waits explicitly at train
            # end; this guards every other exit path and direct API user.
            import atexit

            atexit.register(self._ckptr.wait_until_finished)

    def path(self, epoch) -> str:
        return os.path.join(self.root, ckpt_name(self.config.version, self.config.adv_loss_type, epoch))

    def save(self, state: Any, epoch) -> str:
        """Save the full state; with ``Config.checkpoint_async`` the orbax
        write proceeds in the background (training resumes immediately —
        the state passed in is a host copy, so no device buffer is held);
        call :meth:`wait_until_finished` before reading the checkpoint or
        exiting.  Synchronous when checkpoint_async=False."""
        path = self.path(epoch)
        self._ckptr.save(path, state, force=True)
        with open(path + ".config.json", "w") as f:
            f.write(self.config.to_json())
        if not self.config.checkpoint_async:
            self._ckptr.wait_until_finished()
        return path

    def wait_until_finished(self) -> None:
        """Block until any in-flight async save has committed."""
        self._ckptr.wait_until_finished()

    def restore(self, state_template: Any, epoch) -> Any:
        self._ckptr.wait_until_finished()  # don't race an async save
        path = self.path(epoch)
        if not os.path.exists(path):
            raise FileNotFoundError(f"checkpoint not found: {path}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, state_template)
        try:
            return self._ckptr.restore(path, abstract)
        except Exception:
            # The one legitimate structure mismatch: the EMA slot.  A run
            # config with g_ema_decay off builds a template whose ``g_ema``
            # is None, but the checkpoint on disk may carry the EMA copy
            # (trained with EMA on) — or the reverse.  Toggle the slot to
            # match the disk and retry; the caller decides what to do with
            # the extra/missing average (Trainer re-seeds it, Tester uses it
            # under ema_eval).
            if not hasattr(state_template, "g_ema"):
                raise
            alt = state_template.replace(
                g_ema=None if state_template.g_ema is not None
                else state_template.g_params
            )
            abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, alt)
            return self._ckptr.restore(path, abstract)

    def latest_epoch(self) -> Optional[str]:
        prefix = f"{self.config.version}_{self.config.adv_loss_type}_"
        epochs = []
        for name in os.listdir(self.root):
            if name.startswith(prefix) and not name.endswith(".json"):
                tag = name[len(prefix):]
                try:
                    epochs.append(float(tag))
                except ValueError:
                    continue
        if not epochs:
            return None
        return Config.epoch_tag(max(epochs))
