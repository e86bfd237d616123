"""Offline training-data prep: pre-resize huge originals once, not per epoch.

The training transform (reference: data_loader.py:74-87; here
data/pipeline.py:_train_transform) random-crops ``image_size``² then resizes
to ``resize_size``² — so everything BEYOND ~image_size of resolution is pure
decode cost paid every epoch.  FiveK originals are 3-6 Mpx; on a weak host
the PNG decode dominates the whole input pipeline (measured:
benchmarks/INPUT_PIPELINE_r5.json).  This tool is the training analog of
``tools/center_crop.py``: run once, point ``--train_img_dir`` at the output.

Default ``--short_side 768`` (1.5x the 512 crop) keeps crop-position
diversity while cutting decoded pixels ~8-16x; ``--short_side 512`` (= crop
size) maximizes speed but makes every crop nearly the full frame — a
documented distribution tradeoff, not a silent one.  Images already at or
below the target are copied through untouched.

Usage:
  python -m uegan_tpu.tools.prep_train_data --src data/fivek/train \
      --dst data/fivek/train_prepped [--short_side 768]
"""

from __future__ import annotations

import argparse
import os
import shutil
from pathlib import Path

from PIL import Image

from uegan_tpu.data.files import list_image_files


def prep_folder(src: str, dst: str, short_side: int = 768) -> int:
    """Resize every image under src (recursing one domain level, e.g.
    train/{exp,raw}) so its short side is <= short_side; returns count."""
    n = 0
    src_p, dst_p = Path(src), Path(dst)
    domains = [d for d in sorted(os.listdir(src_p)) if (src_p / d).is_dir()]
    for domain in domains or ["."]:
        out_dir = dst_p / domain
        out_dir.mkdir(parents=True, exist_ok=True)
        for f in sorted(list_image_files(src_p / domain)):
            f = Path(f)
            out = out_dir / f.name
            with Image.open(f) as im:
                w, h = im.size
                s = min(w, h)
                if s <= short_side:
                    shutil.copyfile(f, out)
                else:
                    scale = short_side / s
                    im = im.convert("RGB").resize(
                        (max(1, round(w * scale)), max(1, round(h * scale))),
                        Image.BILINEAR,
                    )
                    im.save(out)
            n += 1
    return n


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="prep-train-data")
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    ap.add_argument("--short_side", type=int, default=768)
    args = ap.parse_args(argv)
    n = prep_folder(args.src, args.dst, args.short_side)
    print(f"prepped {n} images into {args.dst} (short side <= {args.short_side})")


if __name__ == "__main__":
    main()
