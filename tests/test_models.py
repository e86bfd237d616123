"""Model structure tests: parameter counts, output contracts, conv parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from uegan_tpu.models.blocks import ConvBlock, GAM, SNConv
from uegan_tpu.models.generator import Generator
from uegan_tpu.models.discriminator import Discriminator


def count_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_generator_param_count():
    """BASELINE.md: G has exactly 4,158,435 parameters."""
    g = Generator(conv_dim=32)
    variables = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert count_params(variables["params"]) == 4_158_435


def test_discriminator_param_count():
    """BASELINE.md: D has exactly 4,633,632 parameters."""
    d = Discriminator(conv_dim=32, use_sn=True, adv_loss_type="rahinge")
    variables = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert count_params(variables["params"]) == 4_633_632


def test_discriminator_scale_contract():
    """256^2 input -> prediction maps at 128/64/32/16/8 (BASELINE.md)."""
    d = Discriminator(conv_dim=8, use_sn=True, adv_loss_type="rahinge")
    x = jnp.zeros((2, 256, 256, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    preds, _ = d.apply(variables, x, mutable=["spectral"])
    sizes = [p.shape[1] for p in preds]
    assert sizes == [128, 64, 32, 16, 8]
    assert all(p.shape == (2, s, s, 1) for p, s in zip(preds, sizes))
    # tanh heads for rahinge
    assert all(float(jnp.max(jnp.abs(p))) <= 1.0 for p in preds)


def test_generator_output_contract():
    g = Generator(conv_dim=8)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 48, 3), minval=-1, maxval=1)
    variables = g.init(jax.random.PRNGKey(0), x)
    y = g.apply(variables, x, train=False, update_sn=False)
    assert y.shape == x.shape
    assert float(jnp.min(y)) >= -1.0 and float(jnp.max(y)) <= 1.0


def test_generator_resolution_agnostic():
    """Fully convolutional: same params work at any /16 resolution."""
    g = Generator(conv_dim=8)
    variables = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    for hw in ((1, 64, 64, 3), (1, 96, 128, 3)):
        y = g.apply(variables, jnp.zeros(hw), train=False, update_sn=False)
        assert y.shape == hw


def _torch_refpad_conv(x_nhwc, kernel_hwio, bias, stride, pad):
    xt = torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))
    wt = torch.from_numpy(np.asarray(kernel_hwio).transpose(3, 2, 0, 1))
    xt = torch.nn.ReflectionPad2d(pad)(xt)
    y = torch.nn.functional.conv2d(xt, wt, torch.from_numpy(np.asarray(bias)), stride=stride)
    return y.detach().numpy().transpose(0, 2, 3, 1)


@pytest.mark.parametrize("k,s", [(7, 1), (3, 2), (7, 2), (5, 2), (1, 1)])
def test_snconv_matches_torch_refpad_conv(rng, k, s):
    x = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)
    m = SNConv(features=6, kernel_size=k, stride=s, use_bias=True, use_sn=False)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kern = np.asarray(variables["params"]["kernel"])
    bias = np.asarray(variables["params"]["bias"])
    ours = np.asarray(m.apply(variables, jnp.asarray(x)))
    theirs = _torch_refpad_conv(x, kern, bias, s, (k - 1) // 2)
    # XLA-CPU and torch use different conv accumulation orders; 1e-3 absolute
    # on unit-variance inputs is float32 reduction noise, not a semantic gap.
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_gam_matches_torch(rng):
    """GAM numerical parity against a torch reimplementation of models.py:215-237."""
    C = 16
    x = rng.standard_normal((2, 8, 8, C)).astype(np.float32)
    m = GAM(out_nc=C, reduction=8, use_bias=False, use_sn=False, norm=True)
    variables = m.init(jax.random.PRNGKey(3), jnp.asarray(x))
    p = variables["params"]

    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    n, c = xt.shape[:2]
    var = xt.reshape(n, c, -1).var(dim=2) + 1e-5
    std = var.sqrt().reshape(n, c, 1, 1)
    mean = xt.reshape(n, c, -1).mean(dim=2).reshape(n, c, 1, 1)
    stats = torch.cat([mean, std], dim=1)
    w1 = torch.from_numpy(np.asarray(p["squeeze"]["kernel"]).transpose(3, 2, 0, 1))
    w2 = torch.from_numpy(np.asarray(p["excite"]["kernel"]).transpose(3, 2, 0, 1))
    h = torch.nn.functional.conv2d(stats, w1)
    h = torch.relu(h)
    h = torch.nn.functional.conv2d(h, w2)
    wf = torch.from_numpy(np.asarray(p["fuse"]["kernel"]).transpose(3, 2, 0, 1))
    bf = torch.from_numpy(np.asarray(p["fuse"]["bias"]))
    out = torch.nn.functional.conv2d(torch.cat([xt, h.expand_as(xt)], dim=1), wf, bf)
    out = torch.nn.InstanceNorm2d(C)(out)
    theirs = out.detach().numpy().transpose(0, 2, 3, 1)

    ours = np.asarray(m.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


def test_convblock_instance_norm_running_stats(rng):
    """InstanceNorm(affine, track_running_stats) train/eval parity vs torch."""
    x = rng.standard_normal((4, 6, 6, 8)).astype(np.float32)
    m = ConvBlock(features=8, kernel_size=3, stride=1, norm_fun="InstanceNorm", act_fun="none")
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kern = np.asarray(variables["params"]["conv"]["kernel"])
    bias = np.asarray(variables["params"]["conv"]["bias"])

    tnorm = torch.nn.InstanceNorm2d(8, affine=True, track_running_stats=True)
    conv_out = _torch_refpad_conv(x, kern, bias, 1, 1)
    t_in = torch.from_numpy(conv_out.transpose(0, 3, 1, 2))
    tnorm.train()
    t_train = tnorm(t_in).detach().numpy().transpose(0, 2, 3, 1)
    tnorm.eval()
    t_eval = tnorm(t_in).detach().numpy().transpose(0, 2, 3, 1)

    ours_train, mutated = m.apply(variables, jnp.asarray(x), train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ours_train), t_train, rtol=1e-3, atol=1e-4)
    stats = mutated["batch_stats"]["norm"]
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), tnorm.running_mean.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), tnorm.running_var.numpy(), rtol=1e-4, atol=1e-5
    )
    variables2 = {"params": variables["params"], "batch_stats": mutated["batch_stats"]}
    ours_eval = m.apply(variables2, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(ours_eval), t_eval, rtol=1e-3, atol=1e-4)


def test_sn_state_advances_only_when_mutable():
    # NOTE: with orthogonal init all singular values are equal, so power
    # iteration would be stationary — use a generic normal init here.
    d = SNConv(features=4, kernel_size=3, use_sn=True, kernel_init=jax.nn.initializers.normal(1.0))
    x = jnp.ones((1, 8, 8, 3))
    variables = d.init(jax.random.PRNGKey(0), x)
    u0 = np.asarray(variables["spectral"]["u"])
    _, mut = d.apply(variables, x, update_sn=True, mutable=["spectral"])
    u1 = np.asarray(mut["spectral"]["u"])
    assert not np.allclose(u0, u1)
    # eval path: no mutation requested, update_sn=False
    y = d.apply(variables, x, update_sn=False)
    assert y.shape == (1, 8, 8, 4)


def test_gam_split_fuse_equivalent(rng):
    """split_fuse=True (no broadcast/concat materialization) == the concat
    formulation, on identical params."""
    C = 16
    x = jnp.asarray(rng.standard_normal((2, 8, 8, C)).astype(np.float32))
    base = GAM(out_nc=C, reduction=8, use_bias=False, use_sn=False, norm=True)
    variables = base.init(jax.random.PRNGKey(3), x)
    split = GAM(out_nc=C, reduction=8, use_bias=False, use_sn=False, norm=True, split_fuse=True)
    a = np.asarray(base.apply(variables, x))
    b = np.asarray(split.apply(variables, x))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
