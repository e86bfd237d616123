"""End-to-end oracle test of the one-command parity harness (VERDICT r1 #5).

Runs ``uegan_tpu.tools.parity_eval`` exactly as a user would the day the
published epoch-92 weights appear, but with random-init reference-schema
weights at the REAL default model dims, so the entire chain — stage .pth ->
convert -> enhance test set -> disk-protocol PSNR/SSIM -> JSON report +
parity gates — is proven working now.
"""

import json
import os

import numpy as np
import pytest
import torch
from PIL import Image


def _tiny_dataset(tmp_path, n=2, hw=32):
    for d in ("label", "raw"):
        (tmp_path / "test" / d).mkdir(parents=True)
        for i in range(n):
            arr = (np.random.default_rng(i).random((hw, hw, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(tmp_path / "test" / d / f"img{i:02d}.png")
    return tmp_path / "test"


@pytest.mark.slow
def test_parity_eval_end_to_end(tmp_path):
    from tests.test_convert import _dis_state_dict, _gen_state_dict
    from uegan_tpu.config import Config
    from uegan_tpu.tools import parity_eval

    test_dir = _tiny_dataset(tmp_path)
    report_path = tmp_path / "parity.json"

    # reference-schema checkpoint at the production model dims (the tool
    # builds a default Config, exactly like the real epoch-92 flow)
    cfg_defaults = Config()
    pth = tmp_path / "UEGAN-FiveK_rahinge_92.pth"
    torch.save({
        "G_net": _gen_state_dict(cfg_defaults.g_conv_dim),
        "D_net": _dis_state_dict(cfg_defaults.d_conv_dim),
        "epoch": 92.0,
        "g_optimizer": {}, "d_optimizer": {},
        "lr_scheduler_g": {}, "lr_scheduler_d": {},
    }, str(pth))

    report = parity_eval.main([
        "--uegan_pth", str(pth),
        "--test_img_dir", str(test_dir),
        "--test_label_dir", str(test_dir / "label") + os.sep,
        "--img_size", "32",
        "--batch", "2",
        "--num_workers", "1",
        "--compute_dtype", "float32",
        "--work_dir", str(tmp_path / "work"),
        "--report", str(report_path),
    ])

    assert report_path.exists()
    on_disk = json.loads(report_path.read_text())
    assert on_disk["metrics"] == report["metrics"]
    assert np.isfinite(report["metrics"]["psnr"])
    assert 0.0 <= report["metrics"]["ssim"] <= 1.0
    assert report["n_images"] == 2
    assert os.path.isdir(report["output_dir"])
    assert len(os.listdir(report["output_dir"])) == 2

    # parity gates: rerun with expectations (jit + staged ckpt warm)
    report2 = parity_eval.main([
        "--uegan_pth", str(pth),
        "--test_img_dir", str(test_dir),
        "--test_label_dir", str(test_dir / "label") + os.sep,
        "--img_size", "32", "--batch", "2", "--num_workers", "1",
        "--compute_dtype", "float32",
        "--work_dir", str(tmp_path / "work"),
        "--report", str(report_path),
        "--expected_psnr", f"{report['metrics']['psnr']:.6f}",
        "--expected_ssim", "0.999999",
    ])
    assert report2["parity"]["psnr"]["pass"] is True
    assert report2["parity"]["ssim"]["pass"] is False  # random init != GT
    assert report2["parity_pass"] is False
