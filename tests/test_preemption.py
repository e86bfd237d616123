"""Preemption-safe checkpointing: SIGTERM mid-epoch saves a resumable
fractional-epoch checkpoint (the reference loses the partial epoch —
SURVEY.md §5 'failure detection: none')."""

import os
import signal

import numpy as np
import pytest

from uegan_tpu.config import Config

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "verify_fivek")


@pytest.mark.slow
def test_sigterm_saves_fractional_epoch_checkpoint(tmp_path):
    from uegan_tpu.data.pipeline import get_test_loader, get_train_loader
    from uegan_tpu.train.trainer import Trainer

    cfg = Config(
        train_img_dir=os.path.join(FIXTURE, "train"),
        val_img_dir=os.path.join(FIXTURE, "val"),
        save_root_dir=str(tmp_path / "results"),
        g_conv_dim=8, d_conv_dim=8, image_size=48, resize_size=32,
        test_img_size=32, train_batch_size=2, val_batch_size=2,
        total_epochs=2, num_epochs_start_val=5, val_each_epochs=1,
        pool_size=4, info_step=100, sample_step=100, mesh_data=1,
        compute_dtype="float32", num_workers=1, use_tensorboard=False,
        is_test_nima=False, is_test_psnr_ssim=False,
    )
    loaders = {
        "ref": get_train_loader(cfg.train_img_dir, img_size=48, resize_size=32,
                                batch_size=2, num_workers=1, seed=cfg.seed),
        "val": get_test_loader(cfg.val_img_dir, img_size=32, batch_size=2,
                               num_workers=1, seed=cfg.seed),
    }
    trainer = Trainer(loaders, cfg)
    handler_before = signal.getsignal(signal.SIGTERM)

    # deliver SIGTERM after the first optimizer step completes — the handler
    # must flag, and the loop must checkpoint at the NEXT boundary and stop
    orig_post = trainer._post_step

    def post_hook(step, *a, **k):
        orig_post(step, *a, **k)
        if step == 0:
            signal.raise_signal(signal.SIGTERM)

    trainer._post_step = post_hook
    trainer.train()

    # fixture: 4 train imgs / batch 2 -> 2 steps/epoch; stop after step 0
    # checkpoints at epoch 1/2
    ckpt_dir = tmp_path / "results" / cfg.version / cfg.model_save_path
    names = [n for n in os.listdir(ckpt_dir) if not n.endswith(".json")]
    assert names == [f"{cfg.version}_{cfg.adv_loss_type}_0.5"]
    assert trainer.ckpt.latest_epoch() == "0.5"

    # the pre-train handler is restored after train()
    assert signal.getsignal(signal.SIGTERM) == handler_before

    # auto-resume picks the fractional epoch up and finishes the run
    import dataclasses

    cfg2 = dataclasses.replace(cfg, pretrained_model=-1)
    loaders["ref"].epoch = 0
    trainer2 = Trainer(loaders, cfg2)
    trainer2.train()
    names = sorted(n for n in os.listdir(ckpt_dir) if not n.endswith(".json"))
    assert f"{cfg.version}_{cfg.adv_loss_type}_2" in names  # final epoch saved
