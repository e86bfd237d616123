"""Convergence proof: train on the synthetic-operator fixture and record that
the system LEARNS — val PSNR of G(raw) against the known operator target
rising over the run, with the loss trajectory.

Round-5 top ask (VERDICT r4 #1): every prior training test was a 1-2 step
mechanics canary; this drives the REAL train path (Trainer: epoch loop, the
single-jit step, pool, SN, schedules, host data pipeline from disk) for
hundreds-thousands of steps on a dataset where ``exp = enhance_op(raw)`` for
a fixed global operator (tools/convergence_fixture.py), so learning is
measurable: an untrained G sits at its init PSNR, a G that merely copies
input scores ``identity_psnr``, and a G that learned the operator beats both.

Writes one JSON artifact (default benchmarks/CONVERGENCE_r5.json):
  psnr_init / psnr_final / identity_psnr / psnr_trajectory / loss_trajectory
  / achieved steps/s (real data from disk — also feeds VERDICT r4 #2).

Usage:
  python benchmarks/convergence.py                  # TPU, full G, 256px
  python benchmarks/convergence.py --preset tiny --platform cpu
  python benchmarks/convergence.py --steps 3000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


PRESETS = {
    # full: the flagship training config at the BASELINE config-3 shape
    # (256px b10, full 4.16M-param G) — minutes on one TPU chip
    "full": dict(
        g_conv_dim=32, d_conv_dim=32, image_size=272, resize_size=256,
        val_size=256, train_batch_size=10, n_train=60, n_val=8,
        train_size=288, steps=3000, record_every=150, g_lr=1e-4, d_lr=4e-4,
    ),
    # tiny: CPU-scaled variant for the slow regression test (minutes on the
    # single-core CPU host)
    "tiny": dict(
        g_conv_dim=8, d_conv_dim=8, image_size=40, resize_size=32,
        val_size=32, train_batch_size=2, n_train=16, n_val=4,
        train_size=48, steps=400, record_every=50, g_lr=1e-4, d_lr=4e-4,
    ),
}


def run_convergence(
    preset: str = "full",
    steps: int = 0,
    root: str = "",
    out_json: str = "",
    platform: str = "",
    seed: int = 1990,
    record_every: int = 0,
    panel_png: str = "",
    g_ema_decay: float = 0.0,
) -> dict:
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/jax_cache_uegan" if platform != "cpu"
                      else "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    import jax.numpy as jnp
    import numpy as np

    from uegan_tpu.config import Config
    from uegan_tpu.data.pipeline import get_test_loader, get_train_loader
    from uegan_tpu.metrics.psnr import psnr_batch
    from uegan_tpu.tools.convergence_fixture import (
        identity_psnr, make_convergence_fixture)
    from uegan_tpu.train.trainer import Trainer

    p = dict(PRESETS[preset])
    if steps:
        p["steps"] = steps
    if record_every:
        p["record_every"] = record_every

    tmp = None
    if not root:
        tmp = tempfile.mkdtemp(prefix="uegan_convergence_")
        root = os.path.join(tmp, "fixture")
    if not os.path.isdir(os.path.join(root, "train", "raw")):
        make_convergence_fixture(
            root, n_train=p["n_train"], n_val=p["n_val"],
            train_size=p["train_size"], val_size=p["val_size"],
        )
    id_psnr = identity_psnr(root)

    save_root = os.path.join(
        tmp or tempfile.mkdtemp(prefix="uegan_convergence_"),
        "convergence_results")
    steps_per_epoch = p["n_train"] // p["train_batch_size"]
    total_epochs = -(-p["steps"] // steps_per_epoch)  # ceil
    cfg = Config(
        mode="train",
        version="UEGAN-CONV",
        g_conv_dim=p["g_conv_dim"], d_conv_dim=p["d_conv_dim"],
        image_size=p["image_size"], resize_size=p["resize_size"],
        test_img_size=p["val_size"],
        train_batch_size=p["train_batch_size"], val_batch_size=min(4, p["n_val"]),
        total_epochs=total_epochs,
        # the reference schedule (constant 100 epochs, then linear decay over
        # 50 — config.py lr_num_epochs_decay/lr_decay_ratio) assumes FiveK's
        # 450 steps/epoch; this fixture has ~6, so scale the decay points to
        # the run length or LR hits 0 a quarter of the way in (first r5 run
        # measured exactly that: frozen PSNR from step 750 with G lr [0])
        lr_num_epochs_decay=max(1, total_epochs // 2),
        lr_decay_ratio=max(1, total_epochs // 2),
        g_lr=p["g_lr"], d_lr=p["d_lr"],
        seed=seed,
        train_img_dir=os.path.join(root, "train"),
        val_img_dir=os.path.join(root, "val"),
        val_label_dir=os.path.join(root, "val", "label") + os.sep,
        save_root_dir=save_root,
        # record via the in-process recorder below; keep the Trainer's own
        # disk-validation protocol exercised but sparse
        num_epochs_start_val=0,
        val_each_epochs=max(1, p["steps"] // steps_per_epoch // 4),
        model_save_epoch=10 ** 6,  # artifact is the JSON, not checkpoints
        sample_step=10 ** 9, log_step=10 ** 9, info_step=max(10, steps_per_epoch),
        is_test_nima=False, is_test_psnr_ssim=True,
        # single-device story (dp equality is test_parallel's job) — under
        # pytest's 8-virtual-device conftest the default all-devices mesh
        # would reject the tiny batch
        mesh_data=1, mesh_spatial=1,
        cache_data=True, num_workers=2,
        compute_dtype="float32" if platform == "cpu" else "bfloat16",
        is_print_network=False,
        g_ema_decay=g_ema_decay,
    ).validate()

    loaders = {
        "ref": get_train_loader(
            cfg.train_img_dir, img_size=cfg.image_size,
            resize_size=cfg.resize_size, batch_size=cfg.train_batch_size,
            shuffle=True, num_workers=cfg.num_workers, drop_last=True,
            seed=cfg.seed, cache_decoded=True, emit="uint8",
        ),
        "val": get_test_loader(
            cfg.val_img_dir, img_size=cfg.test_img_size,
            batch_size=cfg.val_batch_size, shuffle=False,
            num_workers=cfg.num_workers, seed=cfg.seed,
        ),
    }

    class RecordingTrainer(Trainer):
        """Real Trainer + an in-process (step, val-PSNR) / loss recorder."""

        def __init__(self, loaders, args):
            super().__init__(loaders, args)
            self.psnr_hist: list = []
            self.ema_hist: list = []  # EMA-params trajectory (g_ema_decay > 0)
            self.loss_hist: list = []
            self._wall: list = []

        def measure_val_psnr(self, params=None) -> float:
            vals = []
            for batch in self.loaders["val"]:
                raw = jnp.asarray(batch["img_raw"])
                out = self._eval_fn(
                    self.state.g_params if params is None else params,
                    self.state.g_extra, raw)
                out255 = jnp.clip((out.astype(jnp.float32) + 1) / 2, 0, 1) * 255
                lbl255 = jnp.clip(
                    (jnp.asarray(batch["img_exp"], jnp.float32) + 1) / 2, 0, 1
                ) * 255
                vals.extend(np.asarray(
                    psnr_batch(out255, lbl255, crop_border=4)).tolist())
            return float(np.mean(vals))

        def _post_step(self, step, total_steps, metrics, batch, images):
            self._wall.append(time.perf_counter())
            if (step + 1) % self.args.info_step == 0:
                self.loss_hist.append(
                    {"step": step + 1,
                     **{k: round(float(v), 4) for k, v in metrics.items()}})
            if (step + 1) % p["record_every"] == 0 or (step + 1) == total_steps:
                val = self.measure_val_psnr()
                self.psnr_hist.append([step + 1, round(val, 4)])
                line = (f"=== convergence: step {step + 1}, "
                        f"val PSNR vs operator target {val:.4f} dB")
                if self.state.g_ema is not None:
                    ema = self.measure_val_psnr(self.state.g_ema)
                    self.ema_hist.append([step + 1, round(ema, 4)])
                    line += f" (EMA {ema:.4f})"
                print(line + " ===")
            super()._post_step(step, total_steps, metrics, batch, images)

    trainer = RecordingTrainer(loaders, cfg)
    psnr_init = trainer.measure_val_psnr()
    print(f"=== convergence: init val PSNR {psnr_init:.4f} dB, "
          f"identity (copy-input) baseline {id_psnr:.4f} dB ===")
    t0 = time.perf_counter()
    trainer.train()
    wall = time.perf_counter() - t0

    if panel_png:
        # visual evidence: [raw | G(raw) | operator target] rows for the
        # first val batch, from the FINAL trained state
        from uegan_tpu.utils.image_io import save_image_grid, to_uint8

        batch = next(iter(loaders["val"]))
        raw = jnp.asarray(batch["img_raw"])
        out = trainer._eval_fn(trainer.eval_g_params(), trainer.state.g_extra, raw)
        d = lambda a: to_uint8(np.clip((np.asarray(a, np.float32) + 1) / 2, 0, 1))
        rows = np.concatenate([
            np.concatenate([d(batch["img_raw"][i]), d(out[i]),
                            d(batch["img_exp"][i])], axis=1)
            for i in range(min(3, raw.shape[0]))
        ], axis=0)
        save_image_grid([rows / 255.0], panel_png)
        print(f"=== panel (raw | G(raw) | target) written to {panel_png} ===")

    # the product eval weights are the EMA copy when one is kept (ema_eval)
    final_hist = trainer.ema_hist or trainer.psnr_hist
    psnr_final = final_hist[-1][1] if final_hist else psnr_init
    # steps/s over the steady half (skips compile + warmup)
    w = trainer._wall
    sps = (len(w) // 2) / (w[-1] - w[len(w) // 2 - 1]) if len(w) > 4 else 0.0
    record = {
        "preset": preset,
        "operator": "gamma0.65 + 35% smoothstep S-curve + warm color matrix "
                    "(tools/convergence_fixture.py)",
        "steps": p["steps"],
        "resize_size": cfg.resize_size,
        "train_batch_size": cfg.train_batch_size,
        "g_conv_dim": cfg.g_conv_dim,
        "identity_psnr_db": round(id_psnr, 4),
        "psnr_init_db": round(psnr_init, 4),
        "psnr_final_db": round(psnr_final, 4),
        "psnr_gain_db": round(psnr_final - psnr_init, 4),
        "beats_identity": bool(psnr_final > id_psnr),
        "g_ema_decay": g_ema_decay,
        "psnr_trajectory": trainer.psnr_hist,
        **({"ema_psnr_trajectory": trainer.ema_hist} if trainer.ema_hist else {}),
        "loss_trajectory": trainer.loss_hist,
        "achieved_steps_per_s_real_data": round(sps, 3),
        "wall_s": round(wall, 1),
        "platform": jax.devices()[0].platform,
    }
    if out_json:
        with open(out_json, "w") as f:
            json.dump(record, f, indent=1)
        print(f"=== convergence record written to {out_json} ===")
    return record


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", choices=sorted(PRESETS), default="full")
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--record_every", type=int, default=0)
    ap.add_argument("--root", default="", help="reuse an existing fixture dir")
    ap.add_argument("--out", default="")
    ap.add_argument("--panel", default="",
                    help="write a [raw | G(raw) | target] PNG from the "
                         "final state")
    ap.add_argument("--platform", default="")
    ap.add_argument("--seed", type=int, default=1990)
    ap.add_argument("--g_ema_decay", type=float, default=0.0,
                    help="Polyak-average G (e.g. 0.999) — eval/record the "
                         "EMA copy alongside the live params")
    args = ap.parse_args()
    rec = run_convergence(args.preset, args.steps, args.root, args.out,
                          args.platform, args.seed, args.record_every,
                          panel_png=args.panel, g_ema_decay=args.g_ema_decay)
    print(json.dumps({k: v for k, v in rec.items()
                      if k not in ("psnr_trajectory", "loss_trajectory",
                                   "ema_psnr_trajectory")}))


if __name__ == "__main__":
    main()
