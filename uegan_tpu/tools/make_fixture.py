"""Generate a deterministic synthetic FiveK-layout fixture dataset.

The e2e verify recipe (.claude/skills/verify/SKILL.md) and manual smoke runs
drive the CLI against a tiny dataset with the reference's directory contract
(reference: README.md:77-103, data_loader.py:39-69):

    root/train/{exp,raw}   unpaired domains, any size >= the train crop
    root/val/{label,raw}   paired, exactly --test_img_size
    root/test/{label,raw}  paired, exactly --test_img_size

Images are smooth gradients + seeded noise so enhancement/metrics produce
stable, nontrivial numbers.  Deterministic for a given seed: the loss canary
values in the verify skill assume seed 7.

Usage: python -m uegan_tpu.tools.make_fixture [--root /tmp/verify_fivek]
       [--train_size 48] [--eval_size 32] [--n_train 4] [--n_eval 2]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _img(rng: np.random.Generator, size: int, kind: str, i: int) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / max(size - 1, 1)
    base = np.stack(
        [
            0.5 + 0.4 * np.sin(2 * np.pi * (xx + 0.13 * i)),
            yy,
            0.5 + 0.4 * np.cos(2 * np.pi * (yy + 0.07 * i)),
        ],
        axis=-1,
    )
    if kind in ("exp", "label"):  # "retouched": higher contrast
        base = np.clip((base - 0.5) * 1.3 + 0.55, 0, 1)
    else:  # raw: darker + noisier
        base = np.clip(base * 0.8, 0, 1)
    noise = rng.normal(0, 0.02, base.shape).astype(np.float32)
    return (np.clip(base + noise, 0, 1) * 255).astype(np.uint8)


def make_fixture(root: str, train_size: int = 48, eval_size: int = 32,
                 n_train: int = 4, n_eval: int = 2, seed: int = 7) -> Path:
    from PIL import Image

    rng = np.random.default_rng(seed)
    root_p = Path(root)
    for split, dirs, n, size in (
        ("train", ("exp", "raw"), n_train, train_size),
        ("val", ("label", "raw"), n_eval, eval_size),
        ("test", ("label", "raw"), n_eval, eval_size),
    ):
        for d in dirs:
            out = root_p / split / d
            out.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                Image.fromarray(_img(rng, size, d, i)).save(out / f"img{i:02d}.png")
    return root_p


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="make-fixture")
    ap.add_argument("--root", default="/tmp/verify_fivek")
    ap.add_argument("--train_size", type=int, default=48)
    ap.add_argument("--eval_size", type=int, default=32)
    ap.add_argument("--n_train", type=int, default=4)
    ap.add_argument("--n_eval", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--generate", action="store_true",
                    help="synthesize new images instead of copying the "
                    "vendored canonical fixture (new pixels = new canary "
                    "values — the verify skill's numbers assume the vendored "
                    "set)")
    args = ap.parse_args(argv)
    vendored = Path(__file__).resolve().parents[2] / "tests" / "fixtures" / "verify_fivek"
    if not args.generate and vendored.is_dir():
        import shutil

        shutil.copytree(vendored, args.root, dirs_exist_ok=True)
        print(f"vendored fixture copied to {args.root}")
        return
    p = make_fixture(args.root, args.train_size, args.eval_size,
                     args.n_train, args.n_eval, args.seed)
    print(f"fixture written to {p}")


if __name__ == "__main__":
    main()
