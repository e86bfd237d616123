"""Every advertised config option compiles and runs one train step.

The reference crashed at runtime on its non-default GAN modes
(losses.py:411 arity bug) and never exercised norm/optimizer variants; here
each advertised enum value is a first-class, tested path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.config import ADV_LOSS_TYPES, Config
from uegan_tpu.train.state import create_train_state
from uegan_tpu.train.step import make_train_step

pytestmark = pytest.mark.slow

TINY = Config(g_conv_dim=8, d_conv_dim=8, train_batch_size=2, pool_size=2, compute_dtype="float32")


def _one_step(cfg):
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 5)
    step = jax.jit(make_train_step(bundle))
    raw = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3), minval=-1, maxval=1)
    exp = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3), minval=-1, maxval=1)
    _, metrics, _ = step(state, raw, exp)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (cfg.adv_loss_type, k, float(v))


@pytest.mark.parametrize("mode", ADV_LOSS_TYPES)
def test_all_gan_modes_train(mode):
    _one_step(TINY.replace(adv_loss_type=mode))


def test_rmsprop_optimizer():
    _one_step(TINY.replace(optimizer_type="rmsprop"))


@pytest.mark.parametrize("norm", ["InstanceNorm", "BatchNorm"])
def test_norm_variants_train(norm):
    _one_step(TINY.replace(g_norm_fun=norm, d_norm_fun=norm))


def test_g_with_spectral_norm():
    _one_step(TINY.replace(g_use_sn=True))


@pytest.mark.parametrize("idt", ["l2", "smoothl1"])
def test_idt_loss_variants(idt):
    _one_step(TINY.replace(idt_loss_type=idt))


def test_swish_selu_activations():
    _one_step(TINY.replace(g_act_fun="Swish", d_act_fun="SELU"))


def test_pool_size_zero():
    _one_step(TINY.replace(pool_size=0))


def test_invalid_enum_rejected():
    with pytest.raises(ValueError):
        Config(adv_loss_type="nope").validate()
    with pytest.raises(ValueError):
        Config(g_act_fun="nope").validate()
