"""Training engine: epoch loop, sampling, checkpointing, validation.

Orchestrates the single-jit train step (reference flow: trainer.py:39-146):
per-step console/TensorBoard logging at the reference intervals, sample-grid
PNG dumps, epoch-granular checkpoints, metric validation every
``val_each_epochs`` after ``num_epochs_start_val`` with best-epoch tracking,
and the final best-results CSV lines (trainer.py:289-309).

All device work stays inside the compiled step; the loop only touches the
host for data, PNG dumps, and scalar logging (and only materializes images on
sample steps).
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uegan_tpu.config import Config
from uegan_tpu.data.pipeline import InputFetcher
from uegan_tpu.metrics.nima import calc_nima
from uegan_tpu.metrics.psnr import calc_psnr
from uegan_tpu.metrics.ssim import calc_ssim
from uegan_tpu.parallel.mesh import default_mesh
from uegan_tpu.parallel.sharding import batch_sharding, replicated
from uegan_tpu.train.state import TrainState, create_train_state, count_params
from uegan_tpu.train.step import make_eval_step, make_train_step
from uegan_tpu.train.schedules import make_lr_schedule
from uegan_tpu.utils.checkpoint import CheckpointManager
from uegan_tpu.utils.image_io import save_image, save_image_grid
from uegan_tpu.utils.logging import Logger, ProgressMeter, StepTimer
from uegan_tpu.utils.seed import setup_seed


def _denorm_np(x) -> np.ndarray:
    return np.clip((np.asarray(x, dtype=np.float32) + 1.0) / 2.0, 0.0, 1.0)


class Trainer:
    def __init__(self, loaders, args: Config, mesh=None):
        self.loaders = loaders
        self.args = args
        self.mesh = mesh if mesh is not None else default_mesh(args)

        root = os.path.join(args.save_root_dir, args.version)
        self.model_save_path = os.path.join(root, args.model_save_path)
        self.sample_path = os.path.join(root, args.sample_path)
        self.log_path = os.path.join(root, args.log_path)
        self.val_result_path = os.path.join(root, args.val_result_path)
        for p in (self.model_save_path, self.sample_path, self.log_path, self.val_result_path):
            os.makedirs(p, exist_ok=True)

        self.train_steps_per_epoch = max(1, len(loaders["ref"]))
        self.model_save_step = int(args.model_save_epoch * self.train_steps_per_epoch)
        self.build_model()
        self.logger = Logger(self.log_path) if args.use_tensorboard else None
        self.ckpt = CheckpointManager(self.model_save_path, args)
        self.meter = ProgressMeter()
        self.timer = StepTimer(args.profile_dir)

        self.best_nima_epoch, self.best_nima = 0.0, 0.0
        self.best_psnr_epoch, self.best_psnr = 0.0, 0.0
        self.best_ssim_epoch, self.best_ssim = 0.0, 0.0
        self.nima_result_save_path = os.path.join(args.save_root_dir, "nima_val_results")
        self.psnr_save_path = os.path.join(args.save_root_dir, "psnr_val_results")
        self.ssim_save_path = os.path.join(args.save_root_dir, "ssim_val_results")

    # ------------------------------------------------------------------
    def build_model(self):
        args = self.args
        rng = setup_seed(args.seed)
        vgg_vars = None
        if args.vgg_weights and os.path.exists(args.vgg_weights):
            from uegan_tpu.convert.torch_import import import_vgg19

            vgg_vars = import_vgg19(args.vgg_weights)
        self.state, self.bundle = create_train_state(
            args, rng, (args.resize_size, args.resize_size),
            self.train_steps_per_epoch, vgg_vars=vgg_vars,
        )
        if args.is_print_network:
            self.print_network()
        rep = replicated(self.mesh)
        self.state = jax.device_put(self.state, rep)
        self.batch_shard = batch_sharding(self.mesh)
        self._step_fn = jax.jit(make_train_step(self.bundle), donate_argnums=(0,))
        _eval_base = make_eval_step(self.bundle)
        self._eval_fn = jax.jit(_eval_base)

        # validation variant: PNG-ready uint8 comes off the device (2-4x
        # less device->host traffic, bit-identical quantization — see
        # utils/image_io.py:device_quantize_u8) while the float output stays
        # resident for the on-device metrics
        def _eval_u8(p, e, x):
            y = _eval_base(p, e, x)
            from uegan_tpu.utils.image_io import device_quantize_u8

            return device_quantize_u8(y), y

        self._eval_u8_fn = jax.jit(_eval_u8)
        self._g_lr = make_lr_schedule(
            args.g_lr, self.train_steps_per_epoch, args.lr_decay,
            args.lr_num_epochs_decay, args.lr_decay_ratio,
        )
        self._d_lr = make_lr_schedule(
            args.d_lr, self.train_steps_per_epoch, args.lr_decay,
            args.lr_num_epochs_decay, args.lr_decay_ratio,
        )
        print("=== Models have been created ===")

    def eval_g_params(self):
        """G params for validation/sampling: the EMA copy when one is kept
        and ``Config.ema_eval`` is on (it averages through the adversarial
        drift the r5 convergence runs measured), else the live params."""
        if self.args.ema_eval and self.state.g_ema is not None:
            return self.state.g_ema
        return self.state.g_params

    def print_network(self):
        for name, tree in (("Generator", self.state.g_params), ("Discriminator", self.state.d_params)):
            n = count_params(tree)
            print(f"=== The number of parameters of [{name}] is [{n}] or [{n / 1e6:>.4f}M] ===")

    # ------------------------------------------------------------------
    def train(self):
        args = self.args
        fetcher = InputFetcher(self.loaders["ref"], self.batch_shard)
        total_steps = int(args.total_epochs * self.train_steps_per_epoch)
        self.val_start_steps = int(args.num_epochs_start_val * self.train_steps_per_epoch)
        self.val_each_steps = int(args.val_each_epochs * self.train_steps_per_epoch)

        resume_epoch = args.pretrained_model
        if resume_epoch == -1:  # auto-resume from the newest checkpoint
            latest = self.ckpt.latest_epoch()
            resume_epoch = float(latest) if latest is not None else 0.0
        if resume_epoch:
            start_step = int(resume_epoch * self.train_steps_per_epoch)
            self.load_pretrained_model(resume_epoch)
        else:
            start_step = 0

        # Preemption safety (the reference had none — SURVEY.md §5): SIGTERM/
        # SIGINT request a checkpoint at the next step boundary instead of
        # losing the partial epoch.  The fractional-epoch tag resumes exactly
        # (start_step = epoch * steps_per_epoch), including via auto-resume
        # (--pretrained_model -1).  Handlers only install in the main thread
        # (signal.signal raises elsewhere) and are restored afterwards.
        import signal

        self._stop_requested = False
        old_handlers = {}

        def _on_signal(signum, frame):
            self._stop_requested = True
            print(f"=== received signal {signum}: checkpointing at the next step boundary ===")

        try:
            for sig in (signal.SIGTERM, signal.SIGINT):
                old_handlers[sig] = signal.signal(sig, _on_signal)
        except ValueError:
            old_handlers = {}

        print("======================= start training =======================")
        try:  # tqdm progress (reference: trainer.py:74,140-141)
            from tqdm import tqdm

            pbar = tqdm(total=total_steps, desc="Train epoches", initial=start_step)
        except ImportError:
            pbar = None
        for step in range(start_step, total_steps):
            if self._stop_requested:
                current_epoch = step / self.train_steps_per_epoch
                path = self.ckpt.save(jax.device_get(self.state), current_epoch)
                print(f"=== preemption checkpoint saved: {path} "
                      f"(resume with --pretrained_model -1) ===")
                break
            if step % self.train_steps_per_epoch == 0:
                epoch = step // self.train_steps_per_epoch
                g_lr = float(self._g_lr(step))
                d_lr = float(self._d_lr(step))
                print(
                    f"====== Epoch: {epoch:>3d}/{args.total_epochs}, "
                    f"G lr: [{g_lr:.6g}], D lr: [{d_lr:.6g}] ======"
                )
            batch = next(fetcher)
            self.timer.start()
            self.timer.maybe_trace(step)
            self.state, metrics, images = self._step_fn(
                self.state, batch["img_raw"], batch["img_exp"]
            )
            self.timer.stop()
            self._post_step(step, total_steps, metrics, batch, images)
            if pbar is not None:
                pbar.update(1)
                pbar.set_description(
                    f"Train epoch {((step + 1.0) / self.train_steps_per_epoch):.2f}"
                )

        if pbar is not None:
            pbar.close()
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        self.ckpt.wait_until_finished()  # commit any async checkpoint write
        self.val_best_results()
        timing = self.timer.summary()
        if timing:
            print(f"=== step timing: {timing} ===")
        print("=========== Complete training ===========")

    # ------------------------------------------------------------------
    def _post_step(self, step, total_steps, metrics, batch, images):
        args = self.args
        current_epoch = (step + 1) / self.train_steps_per_epoch

        if (step + 1) % args.info_step == 0:
            losses = {k: float(v) for k, v in metrics.items()}
            print(self.meter.info_line(step, total_steps, losses))

        if (step + 1) % args.sample_step == 0:
            raw01 = _denorm_np(batch["img_raw"])
            fake01 = _denorm_np(images["fake_exp"])
            exp01 = _denorm_np(batch["img_exp"])
            for i in range(raw01.shape[0]):
                name = batch["img_name"][i]
                save_image_grid(
                    [raw01[i], fake01[i], exp01[i]],
                    os.path.join(
                        self.sample_path,
                        f"{name}_{current_epoch:0>3.2f}_{i:0>2d}_realRaw_fakeExp_realExp.png",
                    ),
                )

        if self.logger is not None and (step + 1) % args.log_step == 0:
            for tag, value in metrics.items():
                self.logger.scalar_summary(tag, float(value), step + 1)
            fake01 = _denorm_np(images["fake_exp"])
            self.logger.images_summary("Train_fakeExp/fakeExp", fake01, step + 1)
            self.logger.images_summary(
                "Train_compare/realRaw_fakeExp_realExp",
                np.concatenate(
                    [_denorm_np(batch["img_raw"]), fake01, _denorm_np(batch["img_exp"])], axis=2
                ),
                step + 1,
            )
            self.logger.images_summary(
                "Train_realExpIdt/realExp_realExpIdt",
                np.concatenate(
                    [_denorm_np(batch["img_exp"]), _denorm_np(images["real_exp_idt"])], axis=2
                ),
                step + 1,
            )
            self.logger.images_summary(
                "Train_fakeExpStore/fakeExpStore", _denorm_np(images["fake_exp_store"]), step + 1
            )

        if (step + 1) % self.model_save_step == 0:
            self.ckpt.save(jax.device_get(self.state), current_epoch)
            print(f"======= Save model checkpoints into {self.model_save_path} ======")

        self.model_validation(step)

    # ------------------------------------------------------------------
    def model_validation(self, step: int):
        args = self.args
        if (step + 1) <= self.val_start_steps or (step + 1) % self.val_each_steps != 0:
            return
        current_epoch = (step + 1) / self.train_steps_per_epoch
        val_save_path = os.path.join(self.val_result_path, f"validation_{current_epoch}")
        val_compare_save_path = os.path.join(self.val_result_path, f"validation_compare_{current_epoch}")
        os.makedirs(val_save_path, exist_ok=True)
        os.makedirs(val_compare_save_path, exist_ok=True)

        print("==================== Start validation ====================")
        od_psnr, od_ssim = [], []
        from uegan_tpu.utils.image_io import to_uint8

        for batch in self.loaders["val"]:
            raw = jnp.asarray(batch["img_raw"])
            # uint8 frames come off the device; the float output never
            # leaves it (the on-device metrics consume it in place)
            out_u8_dev, out = self._eval_u8_fn(self.eval_g_params(), self.state.g_extra, raw)
            out_u8 = np.asarray(out_u8_dev)
            raw_u8 = to_uint8(_denorm_np(batch["img_raw"]))  # host array, no fetch
            if args.on_device_metrics and "img_exp" in batch:
                # fast path: batched PSNR/SSIM vs the paired label (domain 1)
                # straight from tensors — no PNG round-trip (the disk
                # protocol below stays authoritative for reference parity).
                # Inputs match the old host denorm bitwise ((x+1)/2 and clip
                # are IEEE-exact).
                from uegan_tpu.metrics.psnr import psnr_batch
                from uegan_tpu.metrics.ssim import ssim_batch

                out255 = jnp.clip((out.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0) * 255.0
                label255 = jnp.asarray(
                    _denorm_np(batch["img_exp"]) * 255.0
                )
                od_psnr.extend(np.asarray(
                    psnr_batch(out255, label255, crop_border=4)).tolist())
                od_ssim.extend(np.asarray(
                    ssim_batch(out255, label255, crop_border=4)).tolist())
            for i in range(out_u8.shape[0]):
                name = batch["img_name"][i]
                save_image(out_u8[i], os.path.join(val_save_path, f"{name}_{current_epoch:0>3.2f}_valFakeExp.png"))
                save_image_grid(
                    [raw_u8[i], out_u8[i]],
                    os.path.join(val_compare_save_path, f"{name}_{current_epoch:0>3.2f}_valRealRaw_valFakeExp.png"),
                )
        if od_psnr:
            print(f"====== On-device Avg. PSNR: {np.mean(od_psnr):>.4f} dB, "
                  f"SSIM: {np.mean(od_ssim):>.4f} ======")
            if self.logger is not None:
                self.logger.scalar_summary("val/psnr_on_device", float(np.mean(od_psnr)), step + 1)
                self.logger.scalar_summary("val/ssim_on_device", float(np.mean(od_ssim)), step + 1)

        if args.is_test_nima:
            curr = calc_nima(
                val_save_path, self.nima_result_save_path, current_epoch,
                weights_path=args.nima_weights, legacy_average=args.legacy_metrics,
                compute_dtype=args.nima_dtype,
            )
            if self.best_nima < curr:
                self.best_nima, self.best_nima_epoch = curr, current_epoch
            print(f"====== Avg. NIMA: {curr:>.4f} ======")
        if args.is_test_psnr_ssim:
            curr_p = calc_psnr(
                val_save_path, args.val_label_dir, self.psnr_save_path, current_epoch,
                legacy_average=args.legacy_metrics,
            )
            if self.best_psnr < curr_p:
                self.best_psnr, self.best_psnr_epoch = curr_p, current_epoch
            print(f"====== Avg. PSNR: {curr_p:>.4f} dB ======")
            curr_s = calc_ssim(
                val_save_path, args.val_label_dir, self.ssim_save_path, current_epoch,
                legacy_average=args.legacy_metrics,
            )
            if self.best_ssim < curr_s:
                self.best_ssim, self.best_ssim_epoch = curr_s, current_epoch
            print(f"====== Avg. SSIM: {curr_s:>.4f}  ======")

    def val_best_results(self):
        args = self.args
        if args.is_test_psnr_ssim:
            os.makedirs(self.psnr_save_path, exist_ok=True)
            with open(os.path.join(self.psnr_save_path, "PSNR_total_results_epoch_avgpsnr.csv"), "a+") as f:
                f.write(f"Best epoch: {self.best_psnr_epoch},{round(self.best_psnr, 6)}\n")
            os.makedirs(self.ssim_save_path, exist_ok=True)
            with open(os.path.join(self.ssim_save_path, "SSIM_total_results_epoch_avgssim.csv"), "a+") as f:
                f.write(f"Best epoch: {self.best_ssim_epoch},{round(self.best_ssim, 6)}\n")
        if args.is_test_nima:
            os.makedirs(self.nima_result_save_path, exist_ok=True)
            with open(os.path.join(self.nima_result_save_path, "NIMA_total_results_epoch_mean_std.csv"), "a+") as f:
                f.write(f"Best epoch:{self.best_nima_epoch},{round(self.best_nima, 6)}\n")

    # ------------------------------------------------------------------
    def load_pretrained_model(self, resume_epochs):
        """Resume from an orbax checkpoint, or convert a torch .pth in place."""
        pth = self.ckpt.path(resume_epochs) + ".pth"
        if os.path.exists(self.ckpt.path(resume_epochs)):
            template = jax.device_get(self.state)
            restored = self.ckpt.restore(template, resume_epochs)
            if self.args.g_ema_decay > 0 and restored.g_ema is None:
                # EMA turned on mid-run over an EMA-less checkpoint: seed the
                # average from the restored params (warmup decay re-ramps)
                restored = restored.replace(
                    g_ema=jax.tree_util.tree_map(jnp.copy, restored.g_params)
                )
            self.state = jax.device_put(restored, replicated(self.mesh))
        elif os.path.exists(pth):
            from uegan_tpu.convert.torch_import import import_uegan_checkpoint

            conv = import_uegan_checkpoint(pth, self.args.g_use_sn, self.args.d_use_sn)
            self.state = self._merge_converted(conv)
        else:
            raise FileNotFoundError(
                f"no checkpoint for epoch {resume_epochs} under {self.model_save_path}"
            )
        print(f"=========== loaded trained models (epochs: {resume_epochs})! ===========")

    def _merge_converted(self, conv) -> TrainState:
        g_vars, d_vars = conv["g_vars"], conv["d_vars"]
        state = self.state
        g_extra = dict(state.g_extra)
        d_extra = dict(state.d_extra)
        for k in g_extra:
            if k in g_vars:
                g_extra[k] = jax.tree_util.tree_map(
                    lambda new, old: jnp.asarray(new, old.dtype).reshape(old.shape),
                    g_vars[k], g_extra[k],
                )
        for k in d_extra:
            if k in d_vars:
                d_extra[k] = jax.tree_util.tree_map(
                    lambda new, old: jnp.asarray(new, old.dtype).reshape(old.shape),
                    d_vars[k], d_extra[k],
                )
        cast = lambda new, old: jnp.asarray(new, old.dtype)
        return state.replace(
            g_params=jax.tree_util.tree_map(cast, g_vars["params"], state.g_params),
            d_params=jax.tree_util.tree_map(cast, d_vars["params"], state.d_params),
            g_extra=g_extra,
            d_extra=d_extra,
        )
