"""Native-resolution enhancement: pad-reflect to /16, enhance, crop back.

The reference squashes every test image to ``test_img_size²``
(reference: data_loader.py:95-101, tester.py:41-103) — destroying detail and
aspect ratio.  ``--test_keep_aspect`` (Config:test_keep_aspect) keeps the
native size instead: the generator is fully convolutional but its 4 stride-2
stages need H, W divisible by 16, so inputs are reflect-padded bottom/right
up to a BUCKETED /16 size, enhanced (the fast path auto-routes huge inputs
to the exact strip executor — infer/packed.py:make_fast_eval), and cropped
back to native.

Bucketing (``round_up``): padded dims round up to a multiple of ``bucket``
(default 64), so a folder of mixed photo sizes compiles O(sizes/64) programs
instead of one per distinct size — the serve micro-batcher's power-of-two
trick applied to spatial dims, with a linear bucket because conv cost scales
with area (a pow2 bucket would pad 513 -> 1024 = 4x the pixels).

Reflect padding (not zeros) keeps border statistics natural for the
normalization-free G; the pad region is discarded by the final crop, and
the enhancement of the kept region is NOT exactly independent of the pad
content (the receptive field crosses the seam) — same contract as every
convolutional pad-and-crop pipeline.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def round_up(n: int, bucket: int = 64, mult: int = 16) -> int:
    """Smallest size >= n that is a multiple of lcm-ish(bucket, mult).

    bucket is expected to be a multiple of ``mult`` (both default 64/16);
    falls back to mult-rounding if not.
    """
    step = bucket if bucket % mult == 0 else mult
    return -(-n // step) * step


def pad_to_grid(batch: np.ndarray, bucket: int = 64) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Reflect-pad an NHWC batch bottom/right to the bucketed /16 size.

    Returns (padded, (H, W) native size).  Handles images smaller than the
    pad amount by chaining reflect pads (np.pad reflect requires
    pad < dim; tiny inputs just re-reflect repeatedly).
    """
    n, h, w, c = batch.shape
    th, tw = round_up(h, bucket), round_up(w, bucket)
    ph, pw = th - h, tw - w
    out = np.asarray(batch)
    while ph > 0 or pw > 0:
        # reflect pad caps at dim-1 per application; loop for tiny inputs
        dh = min(ph, out.shape[1] - 1)
        dw = min(pw, out.shape[2] - 1)
        out = np.pad(out, ((0, 0), (0, dh), (0, dw), (0, 0)), mode="reflect")
        ph -= dh
        pw -= dw
    return out, (h, w)


def crop_back(batch: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Crop the padded enhancement back to the native size."""
    h, w = hw
    return batch[:, :h, :w]


def enhance_native(enhance_fn, batch: np.ndarray, bucket: int = 64) -> np.ndarray:
    """Run ``enhance_fn`` (a same-shape NHWC batch enhancer, e.g.
    Tester.enhance_u8) at native resolution via pad -> enhance -> crop."""
    padded, hw = pad_to_grid(np.asarray(batch), bucket)
    out = np.asarray(enhance_fn(padded))
    return crop_back(out, hw)
