"""Train state: one pytree holding everything a training step mutates.

Logical schema mirrors the reference checkpoint dict {G_net, D_net, epoch,
g_optimizer, d_optimizer, lr_scheduler_g, lr_scheduler_d}
(reference: trainer.py:186-208) — the schedulers need no stored state here
because the LR is a pure function of ``step`` — plus the TPU-native extras:
spectral-norm u/v, norm running stats, the on-device image pool, and the
threaded PRNG key.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from uegan_tpu.config import Config
from uegan_tpu.models.generator import Generator
from uegan_tpu.models.discriminator import Discriminator
from uegan_tpu.models.initializers import get_initializer
from uegan_tpu.models.vgg import VGG19Features
from uegan_tpu.train.image_pool import PoolState, pool_init
from uegan_tpu.train.schedules import make_optimizer


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32
    g_params: Any
    d_params: Any
    g_extra: Any  # non-param collections of G: spectral / batch_stats
    d_extra: Any
    g_opt: Any
    d_opt: Any
    pool: PoolState
    rng: jax.Array
    # Polyak/EMA copy of g_params (Config.g_ema_decay > 0), else None — the
    # None default keeps the pytree structure (and checkpoints) of EMA-less
    # runs unchanged.
    g_ema: Any = None

    @property
    def epoch(self):
        return self.step  # epoch bookkeeping happens in the Trainer


class ModelBundle(NamedTuple):
    """Static (non-pytree) pieces the train step closes over."""

    g_model: Generator
    d_model: Discriminator
    vgg_model: VGG19Features
    vgg_vars: Any
    g_tx: optax.GradientTransformation
    d_tx: optax.GradientTransformation
    config: Config
    steps_per_epoch: int


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32, "float16": jnp.float16}[name]


def build_models(config: Config) -> Tuple[Generator, Discriminator, VGG19Features]:
    kinit = get_initializer(config.init_type or "none", 0.02)
    dt = _dtype(config.compute_dtype)
    pt = _dtype(config.param_dtype)
    g = Generator(
        conv_dim=config.g_conv_dim,
        norm_fun=config.g_norm_fun,
        act_fun=config.g_act_fun,
        use_sn=config.g_use_sn,
        remat=config.remat,
        kernel_init=kinit,
        dtype=dt,
        param_dtype=pt,
    )
    d = Discriminator(
        conv_dim=config.d_conv_dim,
        norm_fun=config.d_norm_fun,
        act_fun=config.d_act_fun,
        use_sn=config.d_use_sn,
        adv_loss_type=config.adv_loss_type,
        remat=config.remat,
        kernel_init=kinit,
        dtype=dt,
        param_dtype=pt,
    )
    vgg = VGG19Features(dtype=dt, param_dtype=pt)
    return g, d, vgg


def split_collections(variables) -> Tuple[Any, Any]:
    """(params, extra-collections) from a flax init/apply variables dict."""
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return params, extra


def create_train_state(
    config: Config,
    rng: jax.Array,
    image_hw: Tuple[int, int],
    steps_per_epoch: int,
    vgg_vars: Any = None,
) -> Tuple[TrainState, ModelBundle]:
    import contextlib

    g_model, d_model, vgg_model = build_models(config)
    h, w = image_hw

    g_tx = make_optimizer(
        config.optimizer_type, config.g_lr, steps_per_epoch,
        beta1=config.beta1, beta2=config.beta2, alpha=config.alpha,
        weight_decay=config.weight_decay, lr_decay=config.lr_decay,
        num_epochs_decay=config.lr_num_epochs_decay, decay_ratio=config.lr_decay_ratio,
    )
    d_tx = make_optimizer(
        config.optimizer_type, config.d_lr, steps_per_epoch,
        beta1=config.beta1, beta2=config.beta2, alpha=config.alpha,
        weight_decay=config.weight_decay, lr_decay=config.lr_decay,
        num_epochs_decay=config.lr_num_epochs_decay, decay_ratio=config.lr_decay_ratio,
    )

    def _make_state(key):
        # param shapes are resolution-independent (fully convolutional), so
        # init at 32x32 regardless of the training resolution.
        dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
        k_g, k_d, k_vgg, k_state = jax.random.split(key, 4)
        g_vars = g_model.init(k_g, dummy, train=False, update_sn=False)
        d_vars = d_model.init(k_d, dummy, train=False, update_sn=False)
        v_vars = vgg_model.init(k_vgg, dummy)
        g_params, g_extra = split_collections(g_vars)
        d_params, d_extra = split_collections(d_vars)
        # EMA starts as a distinct COPY of the init params (jnp.copy forces
        # separate output buffers — the train step donates the state, and two
        # donated leaves must not alias one buffer)
        g_ema = (
            jax.tree_util.tree_map(jnp.copy, g_params)
            if config.g_ema_decay > 0 else None
        )
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params,
            d_params=d_params,
            g_extra=g_extra,
            d_extra=d_extra,
            g_opt=g_tx.init(g_params),
            d_opt=d_tx.init(d_params),
            pool=pool_init(config.pool_size, (h, w, 3)),
            rng=k_state,
            g_ema=g_ema,
        )
        return state, v_vars

    # One jitted init program on CPU (persistently cacheable): eager init is
    # thousands of tiny op dispatches — minutes on this host, and far worse
    # when dispatched over a remote-TPU tunnel.  Callers device_put the state
    # onto the mesh/chip in one transfer.
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
        ctx = jax.default_device(cpu0)
    except RuntimeError:
        ctx = contextlib.nullcontext()
    with ctx:
        state, vgg_inited = jax.jit(_make_state)(rng)
    if vgg_vars is None:
        vgg_vars = vgg_inited
    bundle = ModelBundle(
        g_model=g_model,
        d_model=d_model,
        vgg_model=vgg_model,
        vgg_vars=vgg_vars,
        g_tx=g_tx,
        d_tx=d_tx,
        config=config,
        steps_per_epoch=steps_per_epoch,
    )
    return state, bundle


def count_params(tree) -> int:
    import numpy as np

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))
