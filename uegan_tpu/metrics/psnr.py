"""PSNR — batched on-device and in the reference's disk/CSV protocol.

Disk protocol parity (reference: metrics/CalcPSNR.py:11-92): generated PNGs
are matched to ground truth by stripping the last two '_'-separated fields of
the filename stem; both images get a 4-pixel border crop; PSNR is
10*log10(255^2 / MSE) over RGB float64.  Per-image values land in
``PSNR_epoch_<epoch>.csv`` and the epoch average is appended to
``PSNR_total_results_epoch_avgpsnr.csv``.

The reference divides the epoch average by the last index (N-1, an off-by-one
— CalcPSNR.py:77); the correct ÷N is the default here, with
``legacy_average=True`` replicating the quirk for bit-parity comparisons.
"""

from __future__ import annotations

import datetime
import glob
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def psnr_batch(pred: Array, target: Array, data_range: float = 255.0, crop_border: int = 0) -> Array:
    """Per-image PSNR for NHWC batches (any float dtype, same range)."""
    if crop_border > 0:
        c = crop_border
        pred = pred[:, c:-c, c:-c, :]
        target = target[:, c:-c, c:-c, :]
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-12))


def gt_name_from_generated(path: str) -> str:
    """'a4690-X_92.00_testFakeExp.png' -> 'a4690-X.png' (CalcPSNR.py:39-45)."""
    base = os.path.splitext(os.path.basename(path))[0]
    img_name = base.rsplit("_", 2)[0]
    return img_name + ".png"


def _imread_01(path: str) -> np.ndarray:
    import cv2

    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return img.astype(np.float64) / 255.0


def bgr_to_y(img01: np.ndarray) -> np.ndarray:
    """MATLAB rgb2ycbcr Y channel for [0,1] float BGR input
    (reference: metrics/CalcPSNR.py:139-160, only_y path)."""
    return (img01 @ np.asarray([24.966, 128.553, 65.481])) / 255.0 + 16.0 / 255.0


def calc_psnr(
    folder_gen: str,
    folder_gt: str,
    result_save_path: str,
    epoch,
    crop_border: int = 4,
    legacy_average: bool = False,
    test_y: bool = False,
    verbose: bool = True,
) -> float:
    os.makedirs(result_save_path, exist_ok=True)
    epoch_csv = os.path.join(result_save_path, f"PSNR_epoch_{epoch}.csv")
    total_csv = os.path.join(result_save_path, "PSNR_total_results_epoch_avgpsnr.csv")

    img_list = sorted(glob.glob(os.path.join(folder_gen, "*")))
    total, n = 0.0, 0
    start = datetime.datetime.now()
    with open(epoch_csv, "w") as ef:
        ef.write("image_name,psnr\n")
        for i, img_path in enumerate(img_list):
            gen = _imread_01(img_path)
            gt_name = gt_name_from_generated(img_path)
            gt = _imread_01(os.path.join(folder_gt, gt_name))
            if test_y:  # Y-channel mode (off by default, as in the reference)
                gen, gt = bgr_to_y(gen), bgr_to_y(gt)
            c = crop_border
            gen_c, gt_c = gen[c:-c, c:-c], gt[c:-c, c:-c]
            mse = np.mean((gt_c * 255.0 - gen_c * 255.0) ** 2, dtype=np.float64)
            val = float("inf") if mse == 0 else 10.0 * np.log10(255.0**2 / mse)
            ef.write(f"{gt_name},{round(val, 6)}\n")
            total += val
            n += 1
            if verbose and i % 50 == 0:
                print(f"=== PSNR is processing {i:>3d}-th image ===")
        denom = max(n - 1, 1) if legacy_average else max(n, 1)
        avg = total / denom
        ef.write(f"Average,{round(avg, 6)}\n")
    with open(total_csv, "a+") as tf:
        tf.write(f"{epoch},{round(avg, 6)}\n")
    if verbose:
        secs = (datetime.datetime.now() - start).seconds
        print(f"======= Complete the PSNR test of {n:>3d} images, take {secs} seconds =======")
    return avg
