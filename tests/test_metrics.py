"""Metric tests: on-device vs reference formulations, disk protocol."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from uegan_tpu.metrics.psnr import calc_psnr, gt_name_from_generated, psnr_batch
from uegan_tpu.metrics.ssim import calc_ssim, ssim_batch
from uegan_tpu.models.nima import score_stats
from uegan_tpu.utils.image_io import save_image, to_uint8


def test_psnr_batch_matches_formula(rng):
    a = rng.random((2, 16, 16, 3)).astype(np.float32) * 255
    b = rng.random((2, 16, 16, 3)).astype(np.float32) * 255
    ours = np.asarray(psnr_batch(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        mse = np.mean((a[i] - b[i]) ** 2)
        np.testing.assert_allclose(ours[i], 10 * np.log10(255**2 / mse), rtol=1e-4)


def test_gt_name_parsing():
    assert gt_name_from_generated("/x/a4690-DSC_0005-1-2_92.00_testFakeExp.png") == "a4690-DSC_0005-1-2.png"
    assert gt_name_from_generated("img00_1.00_valFakeExp.png") == "img00.png"


def _reference_ssim_numpy(x, y, data_range=255.0, win=7):
    """skimage structural_similarity algorithm, scipy-free reimplementation."""
    from numpy.lib.stride_tricks import sliding_window_view

    def uf(img):  # valid uniform filter per channel
        v = sliding_window_view(img, (win, win), axis=(0, 1))
        return v.mean(axis=(-2, -1))

    NP = win * win
    cov_norm = NP / (NP - 1)
    res = []
    for c in range(x.shape[2]):
        X, Y = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        ux, uy = uf(X), uf(Y)
        vx = cov_norm * (uf(X * X) - ux * ux)
        vy = cov_norm * (uf(Y * Y) - uy * uy)
        vxy = cov_norm * (uf(X * Y) - ux * uy)
        C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
        S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
        res.append(S.mean())
    return float(np.mean(res))


def test_ssim_batch_matches_skimage_algorithm(rng):
    x = (rng.random((20, 24, 3)) * 255).astype(np.float32)
    y = np.clip(x + rng.normal(0, 20, x.shape), 0, 255).astype(np.float32)
    ours = float(ssim_batch(jnp.asarray(x[None]), jnp.asarray(y[None]))[0])
    # NOTE: args swapped intentionally — SSIM is symmetric
    ref = _reference_ssim_numpy(y, x)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
    same = float(ssim_batch(jnp.asarray(x[None]), jnp.asarray(x[None]))[0])
    assert same > 0.9999


def _reference_ssim_matlab_numpy(x, y, data_range=255.0):
    """The reference's dead MATLAB-equivalent SSIM (CalcSSIM.py:93-114):
    11x11 Gaussian sigma=1.5 window, valid region, biased covariance."""
    from numpy.lib.stride_tricks import sliding_window_view

    g = np.exp(-((np.arange(11) - 5.0) ** 2) / (2 * 1.5**2))
    g /= g.sum()
    w = np.outer(g, g)

    def gf(img):  # valid gaussian filter, single channel
        v = sliding_window_view(img, (11, 11), axis=(0, 1))
        return (v * w).sum(axis=(-2, -1))

    C1, C2 = (0.01 * data_range) ** 2, (0.03 * data_range) ** 2
    res = []
    for c in range(x.shape[2]):
        X, Y = x[..., c].astype(np.float64), y[..., c].astype(np.float64)
        mu1, mu2 = gf(X), gf(Y)
        s1 = gf(X * X) - mu1**2
        s2 = gf(Y * Y) - mu2**2
        s12 = gf(X * Y) - mu1 * mu2
        S = ((2 * mu1 * mu2 + C1) * (2 * s12 + C2)) / ((mu1**2 + mu2**2 + C1) * (s1 + s2 + C2))
        res.append(S.mean())
    return float(np.mean(res))


def test_ssim_batch_gaussian_matches_matlab_variant(rng):
    x = (rng.random((26, 30, 3)) * 255).astype(np.float32)
    y = np.clip(x + rng.normal(0, 15, x.shape), 0, 255).astype(np.float32)
    ours = float(
        ssim_batch(jnp.asarray(x[None]), jnp.asarray(y[None]), win_size=11, window="gaussian")[0]
    )
    ref = _reference_ssim_matlab_numpy(x, y)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


@pytest.fixture
def metric_dirs(tmp_path, rng):
    gen = tmp_path / "gen"
    gt = tmp_path / "gt"
    gen.mkdir(), gt.mkdir()
    for i in range(3):
        img = rng.random((32, 32, 3)).astype(np.float32)
        noisy = np.clip(img + rng.normal(0, 0.05, img.shape), 0, 1).astype(np.float32)
        save_image(img, str(gt / f"img{i:02d}.png"))
        save_image(noisy, str(gen / f"img{i:02d}_92.00_testFakeExp.png"))
    return str(gen), str(gt)


def test_calc_psnr_disk_protocol(metric_dirs, tmp_path):
    gen, gt = metric_dirs
    out = str(tmp_path / "psnr_results") + os.sep
    avg = calc_psnr(gen, gt, out, 92, verbose=False)
    assert 15 < avg < 40
    files = os.listdir(out.rstrip(os.sep))
    assert "PSNR_epoch_92.csv" in files
    assert "PSNR_total_results_epoch_avgpsnr.csv" in files
    lines = open(os.path.join(out, "PSNR_epoch_92.csv")).read().strip().splitlines()
    assert lines[0] == "image_name,psnr"
    assert lines[-1].startswith("Average,")
    assert len(lines) == 5  # header + 3 images + average


def test_calc_psnr_legacy_average(metric_dirs, tmp_path):
    gen, gt = metric_dirs
    a = calc_psnr(gen, gt, str(tmp_path / "a") + os.sep, 1, verbose=False)
    b = calc_psnr(gen, gt, str(tmp_path / "b") + os.sep, 1, legacy_average=True, verbose=False)
    np.testing.assert_allclose(b, a * 3 / 2, rtol=1e-6)  # ÷(N-1) quirk


def test_calc_ssim_disk_protocol(metric_dirs, tmp_path):
    gen, gt = metric_dirs
    out = str(tmp_path / "ssim_results") + os.sep
    avg = calc_ssim(gen, gt, out, 92, verbose=False)
    assert 0.2 < avg <= 1.0
    assert "SSIM_epoch_92.csv" in os.listdir(out.rstrip(os.sep))


def test_nima_score_stats():
    probs = jnp.asarray([[0.0] * 9 + [1.0], [1.0] + [0.0] * 9])
    mean, std = score_stats(probs)
    np.testing.assert_allclose(np.asarray(mean), [10.0, 1.0])
    np.testing.assert_allclose(np.asarray(std), [0.0, 0.0], atol=1e-6)
    uniform = jnp.full((1, 10), 0.1)
    mean, std = score_stats(uniform)
    np.testing.assert_allclose(float(mean[0]), 5.5)


def test_nima_bf16_scores_close_to_f32(rng):
    """Opt-in bf16 NIMA scoring tracks f32 on the 1-10 scale.

    At RANDOM init the logits are noise, so softmax amplifies bf16 deltas
    (measured ~0.15 worst-case); trained weights produce confident
    distributions where the deviation is far smaller.  The bound here is
    the random-init worst case."""
    import jax

    from uegan_tpu.metrics.nima import init_nima, nima_scores

    x = jnp.asarray(rng.random((4, 224, 224, 3)).astype(np.float32))
    m32, v32 = init_nima()
    m16, v16 = init_nima(compute_dtype="bfloat16")
    mean32, _ = jax.jit(lambda b: nima_scores(m32, v32, b))(x)
    mean16, _ = jax.jit(lambda b: nima_scores(m16, v16, b))(x)
    assert float(np.abs(np.asarray(mean32) - np.asarray(mean16)).max()) < 0.3


def test_to_uint8_matches_torchvision_rounding():
    vals = np.asarray([0.0, 0.4999 / 255, 0.5001 / 255, 1.0, 1.5])
    out = to_uint8(vals)
    assert list(out) == [0, 0, 1, 255, 255]
