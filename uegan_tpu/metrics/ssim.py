"""SSIM — batched on-device and in the reference's disk/CSV protocol.

The reference computes skimage ``structural_similarity(multichannel=True,
data_range=255)`` after a 4-px border crop (reference: metrics/CalcSSIM.py:63).
skimage is not in this image, so the exact algorithm is reimplemented:
win_size=7 uniform filter, K1=0.01, K2=0.03, unbiased covariance
normalization NP/(NP-1) with NP=49, per-channel maps cropped by
pad=(win-1)//2 then averaged, channel results averaged.

On TPU the uniform filters are depthwise convs; the interior ("valid")
windows are exactly skimage's cropped region, so no reflect padding is
needed.  The reference also carries a Gaussian-window MATLAB-equivalent
variant as dead code (CalcSSIM.py:93-134: 11x11 Gaussian sigma=1.5, valid
region, biased covariance) — available here as ``window="gaussian"``.
"""

from __future__ import annotations

import datetime
import glob
import os

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _gaussian_window(win: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel outer product (reference: CalcSSIM.py:99-100)."""
    g = np.exp(-((np.arange(win) - (win - 1) / 2.0) ** 2) / (2.0 * sigma * sigma))
    g = (g / g.sum()).astype(np.float32)
    return np.outer(g, g)


def _window_filter_valid(x: Array, win: int, sigma: float | None = None) -> Array:
    """Mean (or Gaussian, if sigma) filter, VALID, per channel.  x: NHWC f32."""
    c = x.shape[-1]
    if sigma is None:
        kernel = jnp.full((win, win, 1, 1), 1.0 / (win * win), jnp.float32)
    else:
        kernel = jnp.asarray(_gaussian_window(win, sigma))[:, :, None, None]
    kernel = jnp.tile(kernel, (1, 1, 1, c))  # depthwise: HWIO with I/groups=1
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )


def ssim_batch(
    pred: Array,
    target: Array,
    data_range: float = 255.0,
    win_size: int | None = None,
    k1: float = 0.01,
    k2: float = 0.03,
    crop_border: int = 0,
    window: str = "uniform",
) -> Array:
    """Per-image SSIM for NHWC batches.

    window="uniform": skimage-default semantics (the reference's live path;
    win_size defaults to 7).
    window="gaussian": the MATLAB-equivalent variant (reference dead code,
    CalcSSIM.py:93-114) — Gaussian sigma=1.5 window, biased covariance;
    win_size defaults to the MATLAB 11.
    """
    if win_size is None:
        win_size = 11 if window == "gaussian" else 7
    if crop_border > 0:
        cb = crop_border
        pred = pred[:, cb:-cb, cb:-cb, :]
        target = target[:, cb:-cb, cb:-cb, :]
    x = pred.astype(jnp.float32)
    y = target.astype(jnp.float32)
    if window == "gaussian":
        sigma, cov_norm = 1.5, 1.0
    elif window == "uniform":
        np_win = win_size * win_size
        sigma, cov_norm = None, np_win / (np_win - 1.0)
    else:
        raise ValueError(f"unknown SSIM window {window!r}")
    ux = _window_filter_valid(x, win_size, sigma)
    uy = _window_filter_valid(y, win_size, sigma)
    uxx = _window_filter_valid(x * x, win_size, sigma)
    uyy = _window_filter_valid(y * y, win_size, sigma)
    uxy = _window_filter_valid(x * y, win_size, sigma)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    # skimage: per-channel mean over the pad-cropped map (== the VALID region),
    # then mean over channels
    return jnp.mean(s, axis=(1, 2, 3))


def calc_ssim(
    folder_gen: str,
    folder_gt: str,
    result_save_path: str,
    epoch,
    crop_border: int = 4,
    legacy_average: bool = False,
    verbose: bool = True,
) -> float:
    """Disk/CSV protocol parity (reference: metrics/CalcSSIM.py:11-80)."""
    from uegan_tpu.metrics.psnr import _imread_01, gt_name_from_generated

    os.makedirs(result_save_path, exist_ok=True)
    epoch_csv = os.path.join(result_save_path, f"SSIM_epoch_{epoch}.csv")
    total_csv = os.path.join(result_save_path, "SSIM_total_results_epoch_avgssim.csv")

    img_list = sorted(glob.glob(os.path.join(folder_gen, "*")))
    ssim_fn = jax.jit(lambda a, b: ssim_batch(a, b, data_range=255.0))
    total, n = 0.0, 0
    start = datetime.datetime.now()
    with open(epoch_csv, "w") as ef:
        ef.write("image_name,ssim\n")
        for i, img_path in enumerate(img_list):
            gen = _imread_01(img_path)
            gt_name = gt_name_from_generated(img_path)
            gt = _imread_01(os.path.join(folder_gt, gt_name))
            c = crop_border
            gen_c = (gen[c:-c, c:-c] * 255.0).astype(np.float32)[None]
            gt_c = (gt[c:-c, c:-c] * 255.0).astype(np.float32)[None]
            val = float(ssim_fn(jnp.asarray(gt_c), jnp.asarray(gen_c))[0])
            ef.write(f"{gt_name},{round(val, 6)}\n")
            total += val
            n += 1
            if verbose and i % 50 == 0:
                print(f"=== SSIM is processing {i:>3d}-th image ===")
        denom = max(n - 1, 1) if legacy_average else max(n, 1)
        avg = total / denom
        ef.write(f"Average,{round(avg, 6)}\n")
    with open(total_csv, "a+") as tf:
        tf.write(f"{epoch},{round(avg, 6)}\n")
    if verbose:
        secs = (datetime.datetime.now() - start).seconds
        print(f"======= Complete the SSIM test of {n:>3d} images, take {secs} seconds =======")
    return avg
