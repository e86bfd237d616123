"""Synthetic-operator convergence fixture: ``exp = enhance_op(raw)``.

The reference's deliverable is a trained enhancer (reference: trainer.py:39-146
producing the epoch-92 checkpoint, README.md:71-74).  Every training test in
this repo up to round 4 was a 1-2 step canary — mechanics, not learning.  This
fixture makes learning *testable in-environment*: a fixed, known, global
enhancement operator (tone curve + color matrix, FiveK-retoucher-ish) defines
the target domain, so "did training work" becomes a measurable number — PSNR
of G(raw) against the operator's output on held-out raws.

Layout written (FiveK directory contract, reference data_loader.py:39-69):

    root/train/raw   N underexposed synthetic photos
    root/train/exp   enhance_op() of N *different* photos (unpaired domains,
                     like the real FiveK raw/expert split)
    root/val/raw     held-out raws
    root/val/label   enhance_op(val raw) — PAIRED, the measurement target

Because the operator is global and deterministic, an ideal G reaches
PSNR = inf; a G that learned nothing stays at its init value; a G that merely
copies its input scores PSNR(raw, op(raw)) — reported as ``identity_psnr`` so
runs can show G beat the copy baseline, i.e. actually enhanced.

Used by benchmarks/convergence.py (the recorded run) and
tests/test_convergence.py (the slow regression gate).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

# ---------------------------------------------------------------------------
# the fixed enhancement operator (the "expert retoucher")
# ---------------------------------------------------------------------------
# Mild warm color matrix (rows ~sum to slightly >1: global lift), applied
# after a tone curve.  Coefficients are frozen — changing them moves every
# recorded convergence number.
_COLOR_M = np.array(
    [
        [1.06, 0.03, -0.03],
        [0.00, 1.04, 0.01],
        [-0.04, 0.02, 1.03],
    ],
    np.float32,
)


def enhance_op(img01: np.ndarray) -> np.ndarray:
    """The known global enhancement: gamma lift + S-curve + color matrix.

    ``img01`` float32 in [0,1], (..., 3).  FiveK-ish: brightens shadows
    (gamma 0.65), adds midtone contrast (smoothstep S-curve blended 35%),
    then a gentle warm color matrix.  Global + smooth, so a 4.2M-param
    generator can represent it almost exactly.
    """
    x = np.clip(img01.astype(np.float32), 0.0, 1.0)
    x = x ** 0.65  # shadow lift
    s = x * x * (3.0 - 2.0 * x)  # smoothstep S-curve
    x = 0.65 * x + 0.35 * s
    x = x @ _COLOR_M.T
    return np.clip(x, 0.0, 1.0)


# ---------------------------------------------------------------------------
# diverse synthetic "photos"
# ---------------------------------------------------------------------------
def synth_photo(rng: np.random.Generator, size: int) -> np.ndarray:
    """One underexposed synthetic photo, float32 [0,1] (size, size, 3).

    Low-frequency Fourier fields (scene structure) + a couple of soft
    elliptic blobs (subjects) + vignette + sensor-ish noise, exposure-scaled
    down into the raw-photo range.  Diversity comes from the rng: every
    image has its own spectrum, blobs, and exposure.
    """
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / max(size - 1, 1)
    img = np.zeros((size, size, 3), np.float32)
    # scene: 4 random low-frequency plane waves per channel, random phase
    for c in range(3):
        acc = np.zeros((size, size), np.float32)
        for _ in range(4):
            fx, fy = rng.uniform(-3, 3, 2)
            ph = rng.uniform(0, 2 * np.pi)
            acc += rng.uniform(0.2, 1.0) * np.sin(
                2 * np.pi * (fx * xx + fy * yy) + ph
            )
        img[..., c] = acc
    img = (img - img.min()) / max(float(np.ptp(img)), 1e-6)
    # subjects: 1-3 soft elliptical blobs, each tinting all channels
    for _ in range(int(rng.integers(1, 4))):
        cy, cx = rng.uniform(0.15, 0.85, 2)
        ry, rx = rng.uniform(0.05, 0.25, 2)
        blob = np.exp(-(((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2))
        tint = rng.uniform(-0.35, 0.35, 3).astype(np.float32)
        img += blob[..., None] * tint
    # vignette (radial falloff) — photographic, and gives the operator's
    # shadow lift something spatially varying to act on
    r2 = (yy - 0.5) ** 2 + (xx - 0.5) ** 2
    img *= (1.0 - rng.uniform(0.2, 0.5) * r2 * 2.0)[..., None]
    img = np.clip(img, 0.0, 1.0)
    # underexpose: random exposure in [0.35, 0.65] plus a small pedestal
    img = img * rng.uniform(0.35, 0.65) + rng.uniform(0.01, 0.05)
    img += rng.normal(0, 0.008, img.shape)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def make_convergence_fixture(
    root: str,
    n_train: int = 60,
    n_val: int = 8,
    train_size: int = 288,
    val_size: int = 256,
    seed: int = 2025,
) -> Path:
    """Write the fixture tree; returns the root path.

    train/exp uses a DISJOINT raw set from train/raw (unpaired, like FiveK);
    val/label is the paired operator output of val/raw.
    """
    from PIL import Image

    rng = np.random.default_rng(seed)
    root_p = Path(root)

    def _save(arr01: np.ndarray, path: Path) -> None:
        path.parent.mkdir(parents=True, exist_ok=True)
        Image.fromarray(
            (np.clip(arr01, 0, 1) * 255.0 + 0.5).astype(np.uint8)
        ).save(path)

    for i in range(n_train):
        _save(synth_photo(rng, train_size), root_p / "train" / "raw" / f"conv{i:03d}.png")
    for i in range(n_train):  # disjoint source set for the expert domain
        _save(
            enhance_op(synth_photo(rng, train_size)),
            root_p / "train" / "exp" / f"conv{n_train + i:03d}.png",
        )
    for i in range(n_val):
        raw = synth_photo(rng, val_size)
        _save(raw, root_p / "val" / "raw" / f"val{i:03d}.png")
        _save(enhance_op(raw), root_p / "val" / "label" / f"val{i:03d}.png")
    return root_p


def identity_psnr(root: str) -> float:
    """PSNR(val raw, val label): the score of a G that copies its input.

    A trained G must beat this to have *enhanced* rather than memorized the
    identity; recorded next to every convergence run.
    """
    from PIL import Image

    root_p = Path(root)
    vals = []
    for rawp in sorted((root_p / "val" / "raw").glob("*.png")):
        lblp = root_p / "val" / "label" / rawp.name
        raw = np.asarray(Image.open(rawp), np.float32)
        lbl = np.asarray(Image.open(lblp), np.float32)
        mse = float(np.mean((raw - lbl) ** 2))
        vals.append(10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12)))
    return float(np.mean(vals))
