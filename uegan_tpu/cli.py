"""CLI entrypoint: ``python -m uegan_tpu --mode train|test ...``.

Flag-for-flag parity with the reference CLI (reference: main.py:14-60,
config.py:7-83): seeds, creates the results tree, builds loaders, and
dispatches to Trainer/Tester.
"""

from __future__ import annotations

import os
from typing import List, Optional

from uegan_tpu.config import Config, get_config


def main(args: Config) -> None:
    # The axon TPU plugin registers itself regardless of JAX_PLATFORMS; honor
    # an explicit backend request (e.g. UEGAN_TPU_PLATFORM=cpu for CI).
    platform = os.environ.get("UEGAN_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    # persistent compilation cache: this jax build ignores the
    # JAX_COMPILATION_CACHE_DIR env var, so wire it via the config API
    # (repeat CLI runs then skip the multi-minute train-step compile)
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_uegan")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
    except Exception:
        pass

    from uegan_tpu.data.pipeline import get_test_loader, get_train_loader
    from uegan_tpu.parallel.distributed import initialize_distributed
    from uegan_tpu.utils.folders import create_folder
    from uegan_tpu.utils.seed import setup_seed

    # multi-host bootstrap (no-op single-process); must run before any
    # backend query so every process sees the full pod's devices.  After
    # this, the loaders shard each global batch across processes
    # automatically (data/pipeline.py resolves jax.process_index lazily).
    initialize_distributed()
    setup_seed(args.seed)
    # reference layout: results/<version>/<sub> (trainer.py:29-32, main.py:21-25)
    for sub in (args.model_save_path, args.sample_path, args.log_path,
                args.val_result_path, args.test_result_path):
        create_folder(args.save_root_dir, args.version, sub)

    if args.mode == "train":
        from uegan_tpu.train.trainer import Trainer

        loaders = {
            "ref": get_train_loader(
                args.train_img_dir,
                img_size=args.image_size,
                resize_size=args.resize_size,
                batch_size=args.train_batch_size,
                shuffle=args.shuffle,
                num_workers=args.num_workers,
                drop_last=args.drop_last,
                seed=args.seed,
                cache_decoded=args.cache_data,
                emit="uint8" if args.device_image_io else "float32",
            ),
            "val": get_test_loader(
                args.val_img_dir,
                img_size=args.test_img_size,
                batch_size=args.val_batch_size,
                shuffle=False,
                num_workers=args.num_workers,
                seed=args.seed,
            ),
        }
        Trainer(loaders, args).train()
    elif args.mode == "test":
        from uegan_tpu.train.tester import Tester

        loaders = {
            "tes": get_test_loader(
                args.test_img_dir,
                img_size=args.test_img_size,
                batch_size=args.val_batch_size,
                shuffle=False,
                num_workers=args.num_workers,
                seed=args.seed,
                emit="uint8" if args.device_image_io else "float32",
                # --test_keep_aspect: native-resolution outputs (no square
                # resize); batches bucket by shape, the Tester pads to /16
                # and crops back (infer/native.py)
                keep_native=args.test_keep_aspect,
            )
        }
        Tester(loaders, args).test()
    else:
        raise ValueError(f"unknown mode [{args.mode}]")


def run(argv: Optional[List[str]] = None) -> None:
    main(get_config(argv))


if __name__ == "__main__":
    run()
