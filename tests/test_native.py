"""Native-resolution inference (--test_keep_aspect): the dead-flag wiring.

The reference squashes every test image to test_img_size²
(reference: data_loader.py:95-101); keep_aspect keeps native sizes — loader
buckets batches by shape, the enhance path reflect-pads to the bucketed /16
grid and crops back (infer/native.py), and the Tester routes through it.
"""

import os

import jax
import numpy as np
import pytest
from PIL import Image

from uegan_tpu.config import Config
from uegan_tpu.infer.native import crop_back, enhance_native, pad_to_grid, round_up


# ---------------------------------------------------------------------------
# unit: pad / crop geometry
# ---------------------------------------------------------------------------
def test_round_up_buckets():
    assert round_up(1, 64) == 64
    assert round_up(64, 64) == 64
    assert round_up(65, 64) == 128
    assert round_up(500, 64) == 512
    # non-multiple bucket falls back to /16 rounding
    assert round_up(17, bucket=10, mult=16) == 32


def test_pad_to_grid_roundtrip(rng):
    x = rng.uniform(0, 1, (2, 70, 41, 3)).astype(np.float32)
    padded, hw = pad_to_grid(x, bucket=64)
    assert padded.shape == (2, 128, 64, 3)
    assert hw == (70, 41)
    np.testing.assert_array_equal(crop_back(padded, hw), x)
    # reflect content: row h+k mirrors row h-2-k around the last row
    np.testing.assert_array_equal(padded[:, 70, :41], x[:, 68])


def test_pad_to_grid_tiny_input(rng):
    """Inputs smaller than the pad amount chain reflect pads."""
    x = rng.uniform(0, 1, (1, 5, 3, 3)).astype(np.float32)
    padded, hw = pad_to_grid(x, bucket=64)
    assert padded.shape == (1, 64, 64, 3)
    np.testing.assert_array_equal(crop_back(padded, hw), x)


def test_enhance_native_identity_fn(rng):
    """With an identity enhancer, native enhance is the identity."""
    x = (rng.uniform(0, 255, (3, 50, 90, 3))).astype(np.uint8)
    out = enhance_native(lambda b: b, x, bucket=64)
    np.testing.assert_array_equal(out, x)


# ---------------------------------------------------------------------------
# loader: shape-bucketed native batches
# ---------------------------------------------------------------------------
def _write_folder(root, sizes, label_sizes=None):
    """FiveK-ish test dir: label/ + raw/ with the given (h, w) sizes."""
    rng = np.random.default_rng(7)
    label_sizes = label_sizes or sizes
    for d, szs in (("label", label_sizes), ("raw", sizes)):
        os.makedirs(os.path.join(root, d), exist_ok=True)
        for i, (h, w) in enumerate(szs):
            arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(root, d, f"img{i:02d}.png"))


def test_keep_native_loader_buckets_by_shape(tmp_path):
    from uegan_tpu.data.pipeline import get_test_loader

    sizes = [(48, 80), (48, 80), (64, 48), (48, 80), (64, 48), (32, 32)]
    _write_folder(str(tmp_path), sizes)
    loader = get_test_loader(str(tmp_path), img_size=512, batch_size=2,
                             keep_native=True, emit="uint8")
    seen = {}
    n = 0
    for batch in loader:
        shp = batch["img_raw"].shape
        assert batch["img_raw"].dtype == np.uint8
        assert batch["img_exp"].shape == shp  # paired label, same native size
        seen.setdefault(shp[1:3], 0)
        seen[shp[1:3]] += shp[0]
        assert shp[0] <= 2
        n += shp[0]
    assert n == 6
    assert seen == {(48, 80): 3, (64, 48): 2, (32, 32): 1}


def test_keep_native_train_loader_rejected():
    from uegan_tpu.data.pipeline import _Loader

    with pytest.raises(ValueError):
        _Loader(object(), batch_size=2, train=True, keep_native=True)


# ---------------------------------------------------------------------------
# exactness: bucket-aligned native sizes == direct packed forward
# ---------------------------------------------------------------------------
def test_native_aligned_matches_direct_forward(rng):
    """A non-square image already on the bucket grid takes the pad path as a
    no-op, so enhance_native == the direct forward EXACTLY."""
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 128), 1)
    gp = jax.device_get(state.g_params)
    fn = make_fast_eval(bundle, gp)
    direct = lambda b: np.asarray(fn(gp, state.g_extra, b))
    x = rng.uniform(-1, 1, (1, 64, 128, 3)).astype(np.float32)
    np.testing.assert_array_equal(
        enhance_native(direct, x, bucket=64), direct(x))


def test_native_unaligned_shapes_and_border(rng):
    """Non-/16 native size: output is native-shaped and the interior (beyond
    the receptive reach of the pad seam) matches the forward of any larger
    padding — i.e. padding only perturbs the seam border, never the bulk."""
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64), 1)
    gp = jax.device_get(state.g_params)
    fn = make_fast_eval(bundle, gp)
    direct = lambda b: np.asarray(fn(gp, state.g_extra, b))
    x = rng.uniform(-1, 1, (1, 50, 41, 3)).astype(np.float32)
    out = enhance_native(direct, x, bucket=64)
    assert out.shape == x.shape
    # larger bucket -> more padding; interior far from the seam agrees
    out2 = enhance_native(direct, x, bucket=128)
    np.testing.assert_allclose(out[:, :32, :32], out2[:, :32, :32],
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# e2e: CLI test mode over a mixed-size folder emits native-res outputs
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_cli_native_resolution_e2e(tmp_path):
    from uegan_tpu import cli
    from uegan_tpu.config import get_config

    data = tmp_path / "test"
    _write_folder(str(data), [(40, 56), (40, 56), (72, 48)])
    save = tmp_path / "results"
    cfg = get_config([
        "--mode", "test", "--test_img_dir", str(data),
        "--test_label_dir", str(data / "label") + os.sep,
        "--save_root_dir", str(save),
        "--g_conv_dim", "8", "--d_conv_dim", "8",
        "--test_img_size", "32", "--val_batch_size", "2",
        "--pretrained_model", "0",
        "--compute_dtype", "float32",
        # native-size labels (the _write_folder label/ mirror): the disk
        # PSNR/SSIM protocol must work at native resolution too
        "--is_test_nima", "false", "--is_test_psnr_ssim", "true",
        "--test_keep_aspect", "true", "--is_print_network", "false",
    ])
    cli.main(cfg)
    psnr_csvs = list((save / "psnr_test_results").glob("*.csv"))
    assert psnr_csvs, "native-res PSNR protocol produced no CSV"
    outdir = save / "UEGAN-FiveK" / "test" / "test_results"
    outs = sorted(os.listdir(outdir))
    assert len(outs) == 3
    shapes = {}
    for f in outs:
        with Image.open(outdir / f) as im:
            shapes[f.split("_")[0]] = (im.size[1], im.size[0])
    # native sizes preserved — NOT the reference's 32x32 squash
    assert shapes == {"img00": (40, 56), "img01": (40, 56), "img02": (72, 48)}
