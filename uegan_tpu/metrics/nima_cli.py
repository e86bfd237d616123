"""Standalone NIMA batch scorer CLI.

Parity with the reference's folder scorer (reference: metrics/NIMA/test.py:
15-116): score every image under ``--test_images`` and write a CSV of
mean/std per file.  Runs batched on device instead of per-image.

Usage:  python -m uegan_tpu.metrics.nima_cli --test_images DIR \
            [--model PATH.pth] [--out results.csv] [--batch 16]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="nima-score")
    p.add_argument("--test_images", type=str, required=True, help="folder of images to score")
    p.add_argument("--model", type=str, default="", help="NIMA .pth weights (converted on load)")
    p.add_argument("--out", type=str, default="nima_result.csv")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--platform", type=str, default="", help="jax platform override (e.g. cpu)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   help="float32 (reference parity) or bfloat16 (MXU rate)")
    args = p.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from uegan_tpu.metrics.nima import init_nima, nima_scores, prepare_image_np

    model, variables = init_nima(args.model, compute_dtype=args.compute_dtype)
    score_fn = jax.jit(lambda b: nima_scores(model, variables, b))

    files = sorted(
        f for f in os.listdir(args.test_images)
        if f.lower().endswith((".png", ".jpg", ".jpeg"))
    )
    rows = []
    for i in range(0, len(files), args.batch):
        chunk = files[i : i + args.batch]
        arrs = [prepare_image_np(Image.open(os.path.join(args.test_images, f))) for f in chunk]
        batch = np.stack(arrs)
        if len(chunk) < args.batch:
            batch = np.concatenate(
                [batch, np.zeros((args.batch - len(chunk), 224, 224, 3), np.float32)]
            )
        means, stds = score_fn(jnp.asarray(batch))
        for j, f in enumerate(chunk):
            rows.append((f, round(float(means[j]), 6), round(float(stds[j]), 6)))
        print(f"scored {min(i + args.batch, len(files))}/{len(files)}", file=sys.stderr)

    with open(args.out, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["image_name", "mean", "std"])
        w.writerows(rows)
    print(f"wrote {len(rows)} scores to {args.out}")


if __name__ == "__main__":
    main()
