"""Checkpoint save/restore roundtrip and naming contract."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.config import Config
from uegan_tpu.train.state import create_train_state
from uegan_tpu.utils.checkpoint import CheckpointManager, ckpt_name


def test_ckpt_name_epoch_tags():
    assert ckpt_name("UEGAN-FiveK", "rahinge", 92) == "UEGAN-FiveK_rahinge_92"
    assert ckpt_name("UEGAN-FiveK", "rahinge", 92.0) == "UEGAN-FiveK_rahinge_92"
    assert ckpt_name("UEGAN-FiveK", "rahinge", 1.5) == "UEGAN-FiveK_rahinge_1.5"


def test_save_restore_roundtrip(tmp_path):
    cfg = Config(g_conv_dim=8, d_conv_dim=8, pool_size=2, compute_dtype="float32")
    state, _ = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), steps_per_epoch=4)
    mgr = CheckpointManager(str(tmp_path / "models"), cfg)
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    path = mgr.save(jax.device_get(state), 3)
    # checkpoint_async (the default) commits in the background; the path is
    # only guaranteed on disk after the wait (r5: the flag is now wired)
    mgr.wait_until_finished()
    assert os.path.exists(path)
    assert os.path.exists(path + ".config.json")

    fresh, _ = create_train_state(cfg, jax.random.PRNGKey(1), (32, 32), steps_per_epoch=4)
    restored = mgr.restore(jax.device_get(fresh), 3)
    assert int(restored.step) == 7
    for a, b in zip(
        jax.tree_util.tree_leaves(state.g_params), jax.tree_util.tree_leaves(restored.g_params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert mgr.latest_epoch() == "3"


def test_restore_missing_raises(tmp_path):
    cfg = Config(g_conv_dim=8, d_conv_dim=8)
    mgr = CheckpointManager(str(tmp_path / "m"), cfg)
    with pytest.raises(FileNotFoundError):
        mgr.restore({}, 42)


def test_center_crop_tool(tmp_path):
    from PIL import Image

    from uegan_tpu.tools.center_crop import center_crop_multiple, main

    src, dst = tmp_path / "src", tmp_path / "dst"
    src.mkdir()
    Image.new("RGB", (70, 50)).save(src / "a.png")
    out = center_crop_multiple(Image.new("RGB", (70, 50)))
    assert out.size == (64, 48)
    main(["--src", str(src), "--dst", str(dst)])
    assert Image.open(dst / "a.png").size == (64, 48)


def test_export_model_roundtrip(tmp_path):
    """jax.export artifact: serialize the packed forward with baked weights,
    reload from bytes only, match the live forward exactly."""
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.tools.export_model import export_generator, load_exported

    out = str(tmp_path / "g.jaxexport")
    n = export_generator(out, hw=32, batch=2, compute_dtype="float32")
    assert n > 1000 and os.path.getsize(out) == n

    fn = load_exported(out)
    x = np.random.default_rng(0).uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    got = np.asarray(fn(x))

    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 1)
    ref = np.asarray(make_fast_eval(bundle, state.g_params)(
        state.g_params, state.g_extra, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_export_model_u8_io_roundtrip(tmp_path):
    """--u8_io serving artifact: uint8 pixels in and out, byte-identical to
    the tester's u8 chain (device normalize -> forward -> fused quantize)."""
    from uegan_tpu.data.pipeline import device_normalize
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.tools.export_model import export_generator, load_exported

    out = str(tmp_path / "g_u8.jaxexport")
    export_generator(out, hw=32, batch=2, compute_dtype="float32", u8_io=True)
    fn = load_exported(out)
    xu = np.random.default_rng(1).integers(0, 256, (2, 32, 32, 3), np.uint8)
    got = np.asarray(fn(xu))
    assert got.dtype == np.uint8

    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 1)
    base = make_fast_eval(bundle, state.g_params, u8_output=True)
    want = np.asarray(base(state.g_params, state.g_extra,
                           device_normalize(jnp.asarray(xu))))
    np.testing.assert_array_equal(got, want)


def test_default_dataset(tmp_path):
    from PIL import Image

    from uegan_tpu.data.dataset import DefaultDataset

    for i in range(3):
        Image.new("RGB", (8, 8)).save(tmp_path / f"x{i}.png")
    ds = DefaultDataset(tmp_path)
    assert len(ds) == 3
    assert ds.load(0).size == (8, 8)
