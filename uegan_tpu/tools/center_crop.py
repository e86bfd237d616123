"""Center-crop ground-truth images to multiple-of-16 dimensions.

Python replacement for the reference's offline MATLAB prep step
(reference: metrics/CenterCrop.m:10-34): the generator downsamples 16x, so
GT label images are center-cropped to the largest multiple-of-16 box for
fair metric comparison.

Usage: python -m uegan_tpu.tools.center_crop --src DIR --dst DIR [--factor 16]
"""

from __future__ import annotations

import argparse
import os

from PIL import Image

from uegan_tpu.data.files import list_image_files


def center_crop_multiple(img: Image.Image, factor: int = 16) -> Image.Image:
    w, h = img.size
    nw, nh = (w // factor) * factor, (h // factor) * factor
    if nw == 0 or nh == 0:
        raise ValueError(f"image {w}x{h} smaller than factor {factor}")
    left, top = (w - nw) // 2, (h - nh) // 2
    return img.crop((left, top, left + nw, top + nh))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="center-crop")
    p.add_argument("--src", required=True)
    p.add_argument("--dst", required=True)
    p.add_argument("--factor", type=int, default=16)
    args = p.parse_args(argv)
    os.makedirs(args.dst, exist_ok=True)
    files = sorted(list_image_files(args.src))
    for f in files:
        img = Image.open(f).convert("RGB")
        out = center_crop_multiple(img, args.factor)
        out.save(os.path.join(args.dst, os.path.basename(str(f))))
    print(f"center-cropped {len(files)} images to multiples of {args.factor} in {args.dst}")


if __name__ == "__main__":
    main()
