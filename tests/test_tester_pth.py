"""End-to-end: Tester loads a torch .pth checkpoint (the epoch-92 flow)."""

import os

import numpy as np
import pytest
import torch
from PIL import Image

from uegan_tpu.config import Config


@pytest.mark.slow
def test_tester_loads_pth_and_enhances(tmp_path):
    from tests.test_convert import _dis_state_dict, _gen_state_dict
    from uegan_tpu.data.pipeline import get_test_loader
    from uegan_tpu.train.tester import Tester

    # dataset: test/{label,raw} at 32^2
    for d in ("label", "raw"):
        (tmp_path / "test" / d).mkdir(parents=True)
        for i in range(2):
            arr = (np.random.default_rng(i).random((32, 32, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "test" / d / f"img{i:02d}.png")

    # torch checkpoint with the reference's dict schema (trainer.py:186-208)
    ckpt = {
        "G_net": _gen_state_dict(8),
        "D_net": _dis_state_dict(8),
        "epoch": 92.0,
        "g_optimizer": {},
        "d_optimizer": {},
        "lr_scheduler_g": {},
        "lr_scheduler_d": {},
    }
    models_dir = tmp_path / "results" / "UEGAN-FiveK" / "models"
    models_dir.mkdir(parents=True)
    torch.save(ckpt, str(models_dir / "UEGAN-FiveK_rahinge_92.pth"))

    cfg = Config(
        g_conv_dim=8,
        d_conv_dim=8,
        test_img_size=32,
        val_batch_size=2,
        pretrained_model=92.0,
        save_root_dir=str(tmp_path / "results"),
        test_img_dir=str(tmp_path / "test"),
        test_label_dir=str(tmp_path / "test" / "label") + os.sep,
        is_test_nima=False,
        is_test_psnr_ssim=True,
        compute_dtype="float32",
        num_workers=1,
    )
    loaders = {"tes": get_test_loader(cfg.test_img_dir, img_size=32, batch_size=2, num_workers=1)}
    tester = Tester(loaders, cfg)
    tester.test()

    out_dir = tmp_path / "results" / "UEGAN-FiveK" / "test" / "test_results"
    outs = sorted(os.listdir(out_dir))
    assert outs == ["img00_92.00_testFakeExp.png", "img01_92.00_testFakeExp.png"]
    # PSNR csv written via the disk protocol
    psnr_csv = tmp_path / "results" / "psnr_test_results" / "PSNR_epoch_92.0.csv"
    assert psnr_csv.exists()
    lines = psnr_csv.read_text().strip().splitlines()
    assert lines[-1].startswith("Average,")


def test_enhance_u8_matches_float_path(tmp_path):
    """Tester.enhance_u8: float input -> byte-identical to the float path +
    host quantize; uint8 input -> within 1 gray level (the device normalize
    is 1-ulp from the host's, see data/pipeline.py:device_normalize)."""
    from uegan_tpu.train.tester import Tester, _denorm_np, _host_norm_u8
    from uegan_tpu.utils.image_io import to_uint8

    cfg = Config(
        g_conv_dim=8, d_conv_dim=8, test_img_size=32, val_batch_size=2,
        save_root_dir=str(tmp_path / "results"), compute_dtype="float32",
        num_workers=1, use_tensorboard=False,
    )
    tester = Tester({}, cfg)
    rng = np.random.default_rng(3)

    x = rng.uniform(-1.0, 1.0, (2, 32, 32, 3)).astype(np.float32)
    got = tester.enhance_u8(x)
    want = to_uint8(_denorm_np(tester.enhance(x)))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)

    xu = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    got_u = tester.enhance_u8(xu)
    want_u = to_uint8(_denorm_np(tester.enhance(_host_norm_u8(xu))))
    assert np.abs(got_u.astype(np.int16) - want_u.astype(np.int16)).max() <= 1
