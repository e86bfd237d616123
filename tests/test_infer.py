"""High-res inference paths: overlap tiling, GSPMD spatial sharding, Pallas."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.infer.tiles import _feather_window, _starts, enhance_tiled
from uegan_tpu.ops.norms import feature_mean_std


def test_tile_starts_cover_image():
    s = _starts(100, 32, 16)
    assert s[0] == 0 and s[-1] == 68
    assert all(b - a <= 16 for a, b in zip(s, s[1:]))


def test_feather_window_partition_of_unity_interior():
    w = _feather_window(32, 8)
    assert w[16] == 1.0 and w[0] < 1.0


def test_enhance_tiled_identity_function_is_seamless(rng):
    """With f = identity, tiled+stitched output must equal the input."""
    img = rng.standard_normal((80, 96, 3)).astype(np.float32)
    out = enhance_tiled(lambda b: b, img, tile=48, overlap=8)
    assert out.shape == img.shape
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-6)


def test_enhance_tiled_smaller_than_tile(rng):
    img = rng.standard_normal((32, 32, 3)).astype(np.float32)
    out = enhance_tiled(lambda b: b * 0.5, img, tile=48, overlap=8)
    assert out.shape == img.shape
    np.testing.assert_allclose(out, img * 0.5, rtol=1e-5)


def test_device_tiled_matches_host_tiled(rng):
    """On-device tile/stitch == host tile/stitch (same windows, one fetch)."""
    import jax as _jax

    from uegan_tpu.config import Config
    from uegan_tpu.infer.tiles import make_device_tiled_enhancer
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step

    cfg = Config(g_conv_dim=8, d_conv_dim=8, compute_dtype="float32", init_type="kaiming")
    state, bundle = create_train_state(cfg, _jax.random.PRNGKey(3), (32, 32), 1)
    ev = _jax.jit(make_eval_step(bundle))
    host_fn = lambda b: np.asarray(ev(state.g_params, state.g_extra, b))
    img = rng.uniform(-1, 1, (80, 64, 3)).astype(np.float32)
    host_out = enhance_tiled(host_fn, img, tile=32, overlap=8)
    dev_fn = make_device_tiled_enhancer(bundle, (80, 64), tile=32, overlap=8)
    dev_out = np.asarray(dev_fn(state.g_params, state.g_extra, jnp.asarray(img)))
    assert dev_out.shape == img.shape
    np.testing.assert_allclose(dev_out, host_out, rtol=1e-4, atol=1e-4)


def test_spatial_sharded_matches_single_device(rng):
    """GSPMD spatial sharding is numerically the single-device program."""
    from uegan_tpu.config import Config
    from uegan_tpu.parallel.mesh import make_mesh
    from uegan_tpu.infer.spatial import enhance_spatial_sharded
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step

    cfg = Config(g_conv_dim=8, d_conv_dim=8, compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64), 1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    ref = make_eval_step(bundle)(state.g_params, state.g_extra, x)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    out = enhance_spatial_sharded(bundle, mesh, state.g_params, state.g_extra, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_spatial_sharded_fast_path_matches_single_device(rng):
    """The PACKED forward under GSPMD spatial sharding == single-device
    packed (the tester's multi-chip high-res path uses fast=True)."""
    from uegan_tpu.config import Config
    from uegan_tpu.parallel.mesh import make_mesh
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.infer.spatial import enhance_spatial_sharded
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(1), (64, 64), 1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    ref = jax.jit(make_fast_eval(bundle, state.g_params))(
        state.g_params, state.g_extra, x)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    out = enhance_spatial_sharded(bundle, mesh, state.g_params, state.g_extra,
                                  x, fast=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_tester_spatial_path_cached_and_correct(rng, tmp_path):
    """Tester.enhance with mesh_spatial > 1 builds the GSPMD program ONCE
    (packing/calibration/compile were previously redone per batch) and
    matches the single-device packed forward."""
    from uegan_tpu.config import Config
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.parallel.mesh import make_mesh
    from uegan_tpu.train.tester import Tester

    cfg = Config(
        compute_dtype="float32", test_img_size=64,
        save_root_dir=str(tmp_path), num_workers=1,
    )
    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    tester = Tester({"tes": []}, cfg, mesh=mesh)
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    out1 = tester.enhance(x)
    fn_after_first = tester._spatial_fn
    assert fn_after_first is not None
    out2 = tester.enhance(x)
    assert tester._spatial_fn is fn_after_first  # no rebuild on batch 2
    ref = jax.jit(make_fast_eval(tester.bundle, tester.state.g_params))(
        tester.state.g_params, tester.state.g_extra, jnp.asarray(x))
    np.testing.assert_allclose(out1, np.asarray(ref), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out2, out1, rtol=0, atol=0)


def test_spatial_sharded_int8_matches_single_device(rng):
    """int8 quantized inference under spatial sharding == single-device int8
    (quantize rounding is elementwise; GAM reductions psum; DUS strips
    shard) — multi-chip high-res serving can use the quantized path."""
    from uegan_tpu.config import Config
    from uegan_tpu.parallel.mesh import make_mesh
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.infer.spatial import enhance_spatial_sharded
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="bfloat16", quantized_inference="int8")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(2), (64, 64), 1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    ref = jax.jit(make_fast_eval(bundle, state.g_params))(
        state.g_params, state.g_extra, x)

    mesh = make_mesh(1, 4, devices=jax.devices()[:4])
    out = enhance_spatial_sharded(bundle, mesh, state.g_params, state.g_extra,
                                  x, fast=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_gam_stats_pallas_matches_reference(rng):
    """Pallas fused mean/std kernel == jnp feature_mean_std (interpret mode)."""
    from uegan_tpu.ops.pallas.gam_stats import gam_mean_std_pallas

    x = jnp.asarray(rng.standard_normal((2, 16, 8, 32)).astype(np.float32))
    m_ref, s_ref = feature_mean_std(x)
    m, s = gam_mean_std_pallas(x, interpret=True)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4, atol=1e-5)


def test_gaussian_filters_match_torch(rng):
    """GaussianSmoothing parity (reference: utils.py:158-208)."""
    import torch

    from uegan_tpu.ops.filters import gaussian_smoothing

    x = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    ours = np.asarray(gaussian_smoothing(jnp.asarray(x), kernel_size=5, sigma=1.5))

    k = 5
    ax = torch.arange(k, dtype=torch.float32)
    g = torch.exp(-(((ax - (k - 1) / 2) / 1.5) ** 2) / 2) / (1.5 * np.sqrt(2 * np.pi))
    k2 = torch.outer(g, g)
    k2 = (k2 / k2.sum()).reshape(1, 1, k, k).repeat(3, 1, 1, 1)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    xt = torch.nn.ReflectionPad2d(k // 2)(xt)
    ref = torch.nn.functional.conv2d(xt, k2, groups=3).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
