"""NIMA sub-project CLI.

Command parity with the vendored click CLI (reference:
metrics/NIMA/nima/nima/cli.py:10-74):

  prepare-dataset   clean AVA.txt against the image folder, write splits
  train-model       EMD-loss training with per-epoch validation
  validate-model    EMD on the validation split
  get-image-score   score one image

Usage: python -m uegan_tpu.nima_train.cli <command> [options]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="nima")
    p.add_argument("--platform", type=str, default="", help="jax platform override")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("prepare-dataset")
    sp.add_argument("--path_to_ava_txt", required=True)
    sp.add_argument("--path_to_save_csv", required=True)
    sp.add_argument("--path_to_images", required=True)
    sp.add_argument("--val_frac", type=float, default=0.1)
    sp.add_argument("--test_frac", type=float, default=0.05)

    st = sub.add_parser("train-model")
    st.add_argument("--path_to_save_csv", required=True, help="dir with train/val csv")
    st.add_argument("--experiment_dir", required=True)
    st.add_argument("--batch_size", type=int, default=32)
    st.add_argument("--num_epoch", type=int, default=5)
    st.add_argument("--init_lr", type=float, default=3e-4)
    st.add_argument("--init_weights", type=str, default="")
    st.add_argument("--compute_dtype", type=str, default="float32",
                    help="float32 or bfloat16 (native MXU rate on v5e)")

    sv = sub.add_parser("validate-model")
    sv.add_argument("--path_to_model_weight", required=True, help=".pth or orbax dir")
    sv.add_argument("--path_to_save_csv", required=True)
    sv.add_argument("--batch_size", type=int, default=16)

    sg = sub.add_parser("get-image-score")
    sg.add_argument("--path_to_model_weight", default="")
    sg.add_argument("--path_to_image", required=True)

    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import os

    if args.cmd == "prepare-dataset":
        from uegan_tpu.nima_train.dataset import clean_and_split

        paths = clean_and_split(
            args.path_to_ava_txt, args.path_to_images, args.path_to_save_csv,
            val_frac=args.val_frac, test_frac=args.test_frac,
        )
        print("wrote:", *paths)
    elif args.cmd == "train-model":
        from uegan_tpu.nima_train.train import train_nima

        hist = train_nima(
            os.path.join(args.path_to_save_csv, "train.csv"),
            os.path.join(args.path_to_save_csv, "val.csv"),
            args.experiment_dir,
            epochs=args.num_epoch,
            batch_size=args.batch_size,
            lr=args.init_lr,
            init_weights=args.init_weights,
            compute_dtype=args.compute_dtype,
        )
        print("best val EMD:", hist["best_val"])
    elif args.cmd == "validate-model":
        import jax

        from uegan_tpu.models.nima import NIMA
        from uegan_tpu.nima_train.dataset import AVADataset
        from uegan_tpu.nima_train.train import validate_nima

        model = NIMA()
        if args.path_to_model_weight.endswith(".pth"):
            from uegan_tpu.convert.torch_import import import_nima

            variables = import_nima(args.path_to_model_weight)
        else:
            import orbax.checkpoint as ocp

            import jax.numpy as jnp

            template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
            variables = ocp.StandardCheckpointer().restore(
                os.path.abspath(args.path_to_model_weight),
                jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template),
            )
        ds = AVADataset(os.path.join(args.path_to_save_csv, "val.csv"), train=False)
        print("val EMD:", validate_nima(model, variables, ds, args.batch_size))
    elif args.cmd == "get-image-score":
        import jax
        import jax.numpy as jnp
        import numpy as np
        from PIL import Image

        from uegan_tpu.metrics.nima import init_nima, nima_scores, prepare_image_np

        model, variables = init_nima(args.path_to_model_weight)
        batch = jnp.asarray(prepare_image_np(Image.open(args.path_to_image))[None])
        mean, std = nima_scores(model, variables, batch)
        print(f"mean: {float(mean[0]):.6f}  std: {float(std[0]):.6f}")


if __name__ == "__main__":
    main()
