"""Torch-checkpoint converter tests.

Builds synthetic torch state dicts with the reference's module names/shapes
(no reference code involved) and checks they land in the right slots of the
flax trees, with correct OIHW->HWIO layout and functional forward parity for
a single conv path.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from uegan_tpu.convert.torch_import import (
    import_discriminator,
    import_generator,
    import_nima,
    import_vgg19,
)
from uegan_tpu.models.discriminator import Discriminator
from uegan_tpu.models.generator import Generator


def _t(*shape):
    return torch.randn(*shape)


def _gen_state_dict(cd=8):
    """Synthetic G_net state dict with the reference names (models.py:10-42)."""
    sd = {}
    enc_io = [(3, cd, 7), (cd, cd * 2, 3), (cd * 2, cd * 4, 3), (cd * 4, cd * 8, 3), (cd * 8, cd * 16, 3)]
    for i, (ci, co, k) in enumerate(enc_io, 1):
        sd[f"enc{i}.main.1.weight"] = _t(co, ci, k, k)
        sd[f"enc{i}.main.1.bias"] = _t(co)
    up_io = [(cd * 16, cd * 8), (cd * 8, cd * 4), (cd * 4, cd * 2), (cd * 2, cd)]
    for i, (ci, co) in enumerate(up_io, 1):
        sd[f"upsample{i}.1.main.1.weight"] = _t(co, ci, 1, 1)
        sd[f"upsample{i}.1.main.1.bias"] = _t(co)
        sd[f"dec{i}.main.1.weight"] = _t(co, ci, 3, 3)
        sd[f"dec{i}.main.1.bias"] = _t(co)
    sd["dec5.0.main.1.weight"] = _t(cd, cd, 3, 3)
    sd["dec5.0.main.1.bias"] = _t(cd)
    sd["dec5.1.main.1.weight"] = _t(3, cd, 7, 7)
    sd["dec5.1.main.1.bias"] = _t(3)
    for i, c in enumerate([cd, cd * 2, cd * 4, cd * 8, cd * 16], 1):
        sd[f"ga{i}.conv.0.weight"] = _t(c // 8, c * 2, 1, 1)
        sd[f"ga{i}.conv.2.weight"] = _t(c, c // 8, 1, 1)
        sd[f"ga{i}.fuse.0.weight"] = _t(c, c * 2, 1, 1)
        sd[f"ga{i}.fuse.0.bias"] = _t(c)
    return sd


def _dis_state_dict(cd=8):
    """Synthetic D_net with spectral-norm buffer names (models.py:104-137)."""
    sd = {}
    io = [(3, cd, 7), (cd, cd * 2, 7), (cd * 2, cd * 4, 7), (cd * 4, cd * 8, 5), (cd * 8, cd * 16, 5)]
    for i, (ci, co, k) in enumerate(io, 1):
        sd[f"d{i}.0.1.weight_orig"] = _t(co, ci, k, k)
        sd[f"d{i}.0.1.bias"] = _t(co)
        sd[f"d{i}.0.1.weight_u"] = torch.nn.functional.normalize(_t(co), dim=0)
        sd[f"d{i}.0.1.weight_v"] = torch.nn.functional.normalize(_t(ci * k * k), dim=0)
        sd[f"d{i}_pred.0.1.weight"] = _t(1, co, k, k)
    return sd


def test_generator_conversion_structure_and_forward():
    cd = 8
    sd = _gen_state_dict(cd)
    g_vars = import_generator(sd, use_sn=False)
    model = Generator(conv_dim=cd)
    ref_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    # identical tree structure
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, ref_vars["params"])
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, g_vars["params"])
    assert ref_shapes == got_shapes
    # layout check: enc1 kernel
    np.testing.assert_allclose(
        g_vars["params"]["enc1"]["conv"]["kernel"],
        sd["enc1.main.1.weight"].numpy().transpose(2, 3, 1, 0),
    )
    # converted weights run
    out = model.apply({"params": g_vars["params"]}, jnp.zeros((1, 32, 32, 3)), train=False, update_sn=False)
    assert out.shape == (1, 32, 32, 3)


def test_discriminator_conversion_with_spectral_norm():
    cd = 8
    sd = _dis_state_dict(cd)
    d_vars = import_discriminator(sd, use_sn=True)
    model = Discriminator(conv_dim=cd, use_sn=True, adv_loss_type="rahinge")
    ref_vars = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert jax.tree_util.tree_map(lambda x: x.shape, ref_vars["params"]) == jax.tree_util.tree_map(
        lambda x: x.shape, d_vars["params"]
    )
    assert jax.tree_util.tree_map(lambda x: x.shape, ref_vars["spectral"]) == jax.tree_util.tree_map(
        lambda x: x.shape, d_vars["spectral"]
    )
    preds = model.apply(
        {"params": d_vars["params"], "spectral": d_vars["spectral"]},
        jnp.zeros((1, 32, 32, 3)),
        train=False,
        update_sn=False,
    )
    assert len(preds) == 5


def test_converted_snconv_matches_torch_forward(rng):
    """Eval-mode spectral-norm conv: torch vs converted, same u/v buffers."""
    from uegan_tpu.models.blocks import SNConv

    cin, cout, k = 3, 8, 7
    conv = torch.nn.Conv2d(cin, cout, k, stride=2, bias=True)
    conv = torch.nn.utils.spectral_norm(conv)
    conv.eval()
    x = rng.standard_normal((1, 12, 12, cin)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = torch.nn.ReflectionPad2d(3)(xt)
    with torch.no_grad():
        ref = conv(xt).numpy().transpose(0, 2, 3, 1)

    m = SNConv(features=cout, kernel_size=k, stride=2, use_bias=True, use_sn=True)
    variables = {
        "params": {
            "kernel": jnp.asarray(conv.weight_orig.detach().numpy().transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(conv.bias.detach().numpy()),
        },
        "spectral": {
            "u": jnp.asarray(conv.weight_u.detach().numpy()),
            "v": jnp.asarray(conv.weight_v.detach().numpy()),
        },
    }
    ours = np.asarray(m.apply(variables, jnp.asarray(x), update_sn=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_vgg19_conversion(tmp_path):
    """Synthetic torchvision-style vgg19 dict converts and runs."""
    from uegan_tpu.models.vgg import TORCH_FEATURE_INDEX, VGG19_CFG, VGG19Features

    sd = {}
    cin = 3
    for name, cout in VGG19_CFG:
        idx = TORCH_FEATURE_INDEX[name]
        sd[f"features.{idx}.weight"] = _t(cout, cin, 3, 3)
        sd[f"features.{idx}.bias"] = _t(cout)
        cin = cout
    p = tmp_path / "vgg19.pth"
    torch.save(sd, str(p))
    variables = import_vgg19(str(p))
    model = VGG19Features()
    feats = model.apply(variables, jnp.zeros((1, 32, 32, 3)))
    assert set(feats.keys()) == {"relu1_1", "relu2_1", "relu3_1", "relu4_1", "relu5_1"}
    assert feats["relu5_1"].shape == (1, 2, 2, 512)


def test_nima_conversion(tmp_path):
    """Synthetic NIMA .pth (reference names) converts and runs."""
    from uegan_tpu.models.nima import NIMA, INVERTED_RESIDUAL_SETTING

    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = _t(c)
        sd[f"{prefix}.bias"] = _t(c)
        sd[f"{prefix}.running_mean"] = _t(c)
        sd[f"{prefix}.running_var"] = torch.rand(c) + 0.5

    sd["base_model.0.0.0.weight"] = _t(32, 3, 3, 3)
    bn("base_model.0.0.1", 32)
    cin, idx = 32, 1
    for t, c, n, s in INVERTED_RESIDUAL_SETTING:
        for j in range(n):
            hid = cin * t
            sd[f"base_model.0.{idx}.conv.0.weight"] = _t(hid, cin, 1, 1)
            bn(f"base_model.0.{idx}.conv.1", hid)
            sd[f"base_model.0.{idx}.conv.3.weight"] = _t(hid, 1, 3, 3)
            bn(f"base_model.0.{idx}.conv.4", hid)
            sd[f"base_model.0.{idx}.conv.6.weight"] = _t(c, hid, 1, 1)
            bn(f"base_model.0.{idx}.conv.7", c)
            cin = c
            idx += 1
    sd["base_model.0.18.0.weight"] = _t(1280, cin, 1, 1)
    bn("base_model.0.18.1", 1280)
    sd["head.2.weight"] = _t(10, 1280)
    sd["head.2.bias"] = _t(10)
    p = tmp_path / "nima.pth"
    torch.save(sd, str(p))
    variables = import_nima(str(p))
    model = NIMA()
    probs = model.apply(variables, jnp.zeros((2, 224, 224, 3)), train=False)
    assert probs.shape == (2, 10)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), [1.0, 1.0], rtol=1e-5)
