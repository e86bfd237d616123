"""Inference/eval engine.

Mirrors the reference Tester (reference: tester.py:19-146): load the
epoch checkpoint, enhance the whole test set, save outputs plus side-by-side
compare PNGs, then run NIMA (and optionally PSNR/SSIM) over the saved files.
Accepts both native orbax checkpoints and the published torch ``.pth``
(converted on the fly).

TPU specifics: inference batches are jit-compiled once per shape (the tail
batch is padded to the compiled batch size); with ``mesh_spatial > 1`` or a
multi-device mesh, high-res inputs are spatially sharded via GSPMD
(BASELINE config #5), and ``tile_size > 0`` selects the single-device
overlap-tile path instead.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from uegan_tpu.config import Config
from uegan_tpu.metrics.nima import calc_nima
from uegan_tpu.metrics.psnr import calc_psnr
from uegan_tpu.metrics.ssim import calc_ssim
from uegan_tpu.parallel.mesh import default_mesh
from uegan_tpu.parallel.sharding import batch_sharding, replicated
from uegan_tpu.train.state import create_train_state, count_params
from uegan_tpu.train.step import make_eval_step
from uegan_tpu.utils.checkpoint import CheckpointManager
from uegan_tpu.utils.image_io import device_quantize_u8 as _quantize_u8
from uegan_tpu.utils.image_io import save_image, save_image_grid
from uegan_tpu.utils.logging import Logger, ProgressMeter
from uegan_tpu.utils.seed import setup_seed


def _denorm_np(x) -> np.ndarray:
    return np.clip((np.asarray(x, dtype=np.float32) + 1.0) / 2.0, 0.0, 1.0)




def _host_norm_u8(u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32 [-1,1] on host (for the rare non-jitted paths)."""
    return (np.asarray(u8, np.float32) / 255.0 - 0.5) / 0.5


class Tester:
    def __init__(self, loaders, args: Config, mesh=None):
        self.loaders = loaders
        self.args = args
        self.mesh = mesh if mesh is not None else default_mesh(args)

        root = os.path.join(args.save_root_dir, args.version)
        self.model_save_path = os.path.join(root, args.model_save_path)
        self.sample_path = os.path.join(root, args.sample_path)
        self.log_path = os.path.join(root, args.log_path)
        self.test_result_path = os.path.join(root, args.test_result_path)
        os.makedirs(self.test_result_path, exist_ok=True)

        self.build_model()
        self.logger = Logger(self.log_path) if args.use_tensorboard else None
        self.ckpt = CheckpointManager(self.model_save_path, args)
        self.meter = ProgressMeter()

    def build_model(self):
        args = self.args
        rng = setup_seed(args.seed)
        self.state, self.bundle = create_train_state(
            args, rng, (args.test_img_size, args.test_img_size), steps_per_epoch=1
        )
        from uegan_tpu.parallel.sharding import replicated

        self.state = jax.device_put(self.state, replicated(self.mesh))
        if args.is_print_network:
            for name, tree in (("Generator", self.state.g_params), ("Discriminator", self.state.d_params)):
                n = count_params(tree)
                print(f"=== The number of parameters of [{name}] is [{n}] or [{n / 1e6:>.4f}M] ===")
        self._eval_fn = jax.jit(make_eval_step(self.bundle))
        self._fast_fn = None  # packed fast path, built after weights load
        self._fast_u8_fn = None  # uint8-I/O variant (device norm + quantize)
        self._spatial_fn = None  # GSPMD spatially-sharded program, ditto
        print("=== Models have been created ===")

    def _fast_eval(self, calib_batch=None):
        """Packed fast inference (1.57x; falls back to canonical) — built
        lazily so the kernel transform sees the LOADED weights.  The first
        real batch seeds the int8 activation calibration when quantized
        inference is on (better ranges than the seeded-random default)."""
        if self._fast_fn is None:
            from uegan_tpu.infer.packed import make_fast_eval

            self._fast_fn = jax.jit(make_fast_eval(
                self.bundle, self.state.g_params, calib_batch=calib_batch))
        return self._fast_fn

    def _fast_eval_u8(self, calib_batch=None):
        """uint8-I/O variant of the fast path: one jit that normalizes a
        uint8 (or passes a float) input batch on device, runs the forward,
        and quantizes to uint8 on device — PNG-ready bytes come off the
        chip, with the normalize/denorm bit-identical to the host chain."""
        if self._fast_u8_fn is None:
            from uegan_tpu.data.pipeline import device_normalize
            from uegan_tpu.infer.packed import make_fast_eval

            if calib_batch is not None and np.asarray(calib_batch).dtype == np.uint8:
                calib_batch = _host_norm_u8(calib_batch)
            # u8_output fuses the quantize BEFORE the packed paths' final
            # depth_to_space (bit-identical; infer/packed.py:make_fast_eval)
            base = make_fast_eval(self.bundle, self.state.g_params,
                                  calib_batch=calib_batch, u8_output=True)
            self._fast_u8_fn = jax.jit(
                lambda p, e, x: base(p, e, device_normalize(x))
            )
        return self._fast_u8_fn

    def load_pretrained_model(self, resume_epochs):
        orbax_path = self.ckpt.path(resume_epochs)
        pth = orbax_path + ".pth"
        if os.path.exists(orbax_path):
            template = jax.device_get(self.state)
            self.state = self.ckpt.restore(template, resume_epochs)
            if self.args.ema_eval and self.state.g_ema is not None:
                # checkpoints trained with g_ema_decay carry a Polyak copy of
                # G; swap it in as THE inference weights (averages through
                # the adversarial drift — Config.g_ema_decay) so every
                # downstream path (packed/strip/int8/spatial) uses it.
                # --ema_eval false restores the live-params behavior.
                self.state = self.state.replace(g_params=self.state.g_ema)
        elif os.path.exists(pth):
            from uegan_tpu.convert.torch_import import import_uegan_checkpoint

            conv = import_uegan_checkpoint(pth, self.args.g_use_sn, self.args.d_use_sn)
            cast = lambda new, old: jnp.asarray(new, old.dtype)
            g_extra = dict(self.state.g_extra)
            for k in g_extra:
                if k in conv["g_vars"]:
                    g_extra[k] = jax.tree_util.tree_map(cast, conv["g_vars"][k], g_extra[k])
            self.state = self.state.replace(
                g_params=jax.tree_util.tree_map(cast, conv["g_vars"]["params"], self.state.g_params),
                d_params=jax.tree_util.tree_map(cast, conv["d_vars"]["params"], self.state.d_params),
                g_extra=g_extra,
            )
        else:
            raise FileNotFoundError(f"no checkpoint for epoch {resume_epochs}: {orbax_path}[.pth]")
        self._fast_fn = None  # re-pack kernels from the loaded weights
        self._fast_u8_fn = None
        self._spatial_fn = None
        print(f"=========== loaded trained models (epochs: {resume_epochs})! ===========")

    # ------------------------------------------------------------------
    def enhance(self, raw_batch: np.ndarray) -> np.ndarray:
        """Enhance a [-1,1] NHWC batch, padding the tail to the jit shape.

        High-res routing: ``--tile_size > 0`` switches to overlap-tile
        stitching (single chip); ``--mesh_spatial > 1`` runs the GSPMD
        spatially-sharded program (exact; BASELINE config #5).
        """
        if self.args.tile_size > 0:
            from uegan_tpu.infer.tiles import enhance_tiled

            fn = lambda b: np.asarray(
                self._eval_fn(self.state.g_params, self.state.g_extra, jnp.asarray(b))
            )
            return np.stack([
                enhance_tiled(fn, img, self.args.tile_size, self.args.tile_overlap)
                for img in np.asarray(raw_batch)
            ])
        b = raw_batch.shape[0]
        target_b = self.args.val_batch_size if b <= self.args.val_batch_size else b
        if b < target_b:  # pad the tail so every batch hits the same compiled shape
            pad = np.zeros((target_b - b,) + tuple(raw_batch.shape[1:]),
                           np.asarray(raw_batch).dtype)
            raw_batch = np.concatenate([np.asarray(raw_batch), pad])
        if self.mesh.shape.get("spatial", 1) > 1:
            from uegan_tpu.infer.spatial import make_spatial_enhancer
            from uegan_tpu.parallel.sharding import replicated, spatial_sharding

            # built once per loaded weights: packing, int8 calibration
            # (seeded with this first REAL batch, like the single-device
            # path), the replicated param upload, and the GSPMD compile all
            # happen on the first batch only
            if self._spatial_fn is None:
                self._spatial_fn = (
                    make_spatial_enhancer(
                        self.bundle, self.mesh, self.state.g_params,
                        calib_batch=np.asarray(raw_batch),
                    ),
                    jax.device_put(self.state.g_params, replicated(self.mesh)),
                    jax.device_put(self.state.g_extra, replicated(self.mesh)),
                )
            fn, params, extra = self._spatial_fn
            img = jax.device_put(jnp.asarray(raw_batch), spatial_sharding(self.mesh))
            return np.asarray(fn(params, extra, img))[:b]
        fn = self._fast_eval(calib_batch=np.asarray(raw_batch))
        out = fn(self.state.g_params, self.state.g_extra, jnp.asarray(raw_batch))
        return np.asarray(out)[:b]

    def enhance_u8(self, raw_batch: np.ndarray) -> np.ndarray:
        """Enhance a batch (uint8 [0,255] or float [-1,1]) to PNG-ready
        uint8 HWC frames.

        On the single-device fast path both the input normalize and the
        output quantize run inside the forward's jit, so the host only ever
        moves 1-byte pixels each way (2-4x less transfer + no per-pixel host
        float work); results are bit-identical to the float path + host
        denorm/round (device_normalize/_quantize_u8 docstrings).  The tile
        and spatial routes fall back to the float path + host quantize.
        """
        from uegan_tpu.utils.image_io import to_uint8

        u8_in = np.asarray(raw_batch).dtype == np.uint8
        if self.args.tile_size > 0 or self.mesh.shape.get("spatial", 1) > 1:
            fbatch = _host_norm_u8(raw_batch) if u8_in else raw_batch
            return to_uint8(_denorm_np(self.enhance(fbatch)))
        b = raw_batch.shape[0]
        target_b = self.args.val_batch_size if b <= self.args.val_batch_size else b
        if b < target_b:
            pad = np.zeros((target_b - b,) + tuple(raw_batch.shape[1:]),
                           np.asarray(raw_batch).dtype)
            raw_batch = np.concatenate([np.asarray(raw_batch), pad])
        fn = self._fast_eval_u8(calib_batch=np.asarray(raw_batch))
        out = fn(self.state.g_params, self.state.g_extra, jnp.asarray(raw_batch))
        return np.asarray(out)[:b]

    def test(self):
        args = self.args
        if args.pretrained_model:
            self.load_pretrained_model(args.pretrained_model)
        start_time = time.time()

        test_save_path = os.path.join(self.test_result_path, "test_results")
        test_compare_save_path = os.path.join(self.test_result_path, "test_compare")
        os.makedirs(test_save_path, exist_ok=True)
        os.makedirs(test_compare_save_path, exist_ok=True)
        tag = args.pretrained_model

        print("==================== Start testing ====================")
        n_done = 0
        from uegan_tpu.utils.image_io import to_uint8

        for batch in self.loaders["tes"]:
            raw = batch["img_raw"]
            if args.test_keep_aspect:
                # native resolution: reflect-pad to the bucketed /16 grid,
                # enhance (huge inputs auto-route to the strip executor via
                # make_fast_eval), crop back — the loader already bucketed
                # the batch by shape (infer/native.py; Config:test_keep_aspect)
                from uegan_tpu.infer.native import enhance_native

                out_u8 = enhance_native(self.enhance_u8, np.asarray(raw))
            else:
                out_u8 = self.enhance_u8(raw)  # uint8 off the chip, PNG-ready
            raw_u8 = raw if np.asarray(raw).dtype == np.uint8 else to_uint8(_denorm_np(raw))
            for i in range(out_u8.shape[0]):
                name = batch["img_name"][i]
                save_image(out_u8[i], os.path.join(test_save_path, f"{name}_{tag:0>3.2f}_testFakeExp.png"))
                save_image_grid(
                    [raw_u8[i], out_u8[i]],
                    os.path.join(test_compare_save_path, f"{name}_{tag:0>3.2f}_testRealRaw_testFakeExp.png"),
                )
                n_done += 1
            if self.logger is not None:
                self.logger.images_summary(
                    "test/testFakeExp", np.asarray(out_u8, np.float32) / 255.0, n_done
                )
        print(f"=== Saved {n_done} enhanced images into {test_save_path} "
              f"({time.time() - start_time:.1f}s) ===")

        results = {"n_images": n_done, "output_dir": test_save_path}
        if args.is_test_nima:
            nima_path = os.path.join(args.save_root_dir, "nima_test_results")
            curr = calc_nima(test_save_path, nima_path, tag,
                             weights_path=args.nima_weights, legacy_average=args.legacy_metrics,
                             compute_dtype=args.nima_dtype)
            print(f"====== Avg. NIMA: {curr:>.4f} ======")
            results["nima"] = float(curr)
        if args.is_test_psnr_ssim:
            psnr_path = os.path.join(args.save_root_dir, "psnr_test_results")
            curr = calc_psnr(test_save_path, args.test_label_dir, psnr_path, tag,
                             legacy_average=args.legacy_metrics)
            print(f"====== Avg. PSNR: {curr:>.4f} dB ======")
            results["psnr"] = float(curr)
            ssim_path = os.path.join(args.save_root_dir, "ssim_test_results")
            curr = calc_ssim(test_save_path, args.test_label_dir, ssim_path, tag,
                             legacy_average=args.legacy_metrics)
            print(f"====== Avg. SSIM: {curr:>.4f}  ======")
            results["ssim"] = float(curr)
        return results
