"""One-command quality-parity harness against the published UEGAN weights.

The reference's headline capability is enhancing FiveK with the epoch-92
checkpoint (reference: README.md:71-74, tester.py:133-146) and scoring the
outputs with disk-protocol PSNR/SSIM (vs Expert-C labels, 4-px border crop,
8-bit PNGs re-read from disk — CalcPSNR.py:24,56-65) and NIMA
(CalcNIMA.py:45-91).  Those weights are absent from the build environment,
so this tool packages the whole parity protocol into one command that is
oracle-tested NOW with random-init reference-schema weights
(tests/test_parity_eval.py) and will produce the parity report the moment
the real files appear:

    python -m uegan_tpu.tools.parity_eval \
        --uegan_pth  UEGAN-FiveK_rahinge_92.pth \
        --test_img_dir  data/fivek/test \
        --test_label_dir data/fivek/test/label/ \
        --nima_weights  pretrain-model.pth \
        --report  parity_report.json

Protocol notes:
- every test image is resized to 512x512 exactly like the reference test
  transform (data_loader.py:95-101; ``--img_size`` overrides);
- metrics run in disk-protocol mode: outputs are written as 8-bit PNGs and
  re-read, 4-px border crop, RGB;  ``--legacy_metrics`` additionally
  reproduces the reference's divide-by-(N-1) averaging quirk
  (CalcPSNR.py:77) for digit-for-digit comparison with its CSVs;
- expected values: the UEGAN paper (arXiv:2012.15020, Table 1) reports
  ~25.0 dB PSNR / ~0.90 SSIM on FiveK for the released model — treat those
  as approximate; the authoritative procedure is to run the reference
  repo's ``main.py --mode test --pretrained_model 92`` on the same machine
  and compare this report's numbers digit-for-digit (same protocol, same
  files).  Pass ``--expected_psnr/--expected_ssim/--expected_nima`` (e.g.
  from that reference run) to get deltas and a pass/fail gate at
  ``--tolerance``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def build_report(args) -> dict:
    """Run the full parity protocol; returns the report dict."""
    # platform forcing must precede any jax import (the axon plugin ignores
    # JAX_PLATFORMS — see cli.py)
    if args.platform:
        os.environ["UEGAN_TPU_PLATFORM"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)

    from uegan_tpu.config import Config
    from uegan_tpu.data.pipeline import get_test_loader
    from uegan_tpu.train.tester import Tester

    if not os.path.exists(args.uegan_pth):
        raise FileNotFoundError(f"--uegan_pth not found: {args.uegan_pth}")

    epoch = float(args.epoch)
    version = "UEGAN-Parity"
    cfg = Config(
        version=version,
        pretrained_model=epoch,
        save_root_dir=args.work_dir,
        test_img_dir=args.test_img_dir,
        test_label_dir=args.test_label_dir,
        test_img_size=args.img_size,
        val_batch_size=args.batch,
        is_test_psnr_ssim=bool(args.test_label_dir),
        is_test_nima=bool(args.nima_weights),
        nima_weights=args.nima_weights,
        legacy_metrics=args.legacy_metrics,
        use_tensorboard=False,
        num_workers=args.num_workers,
        compute_dtype=args.compute_dtype,
        # production fast-path selection (VERDICT r2 #7): the parity report
        # must certify the path users actually run — the packed forward is
        # the 512px default; ``--quantized_inference int8`` and
        # ``--strip_rows`` force the opt-in fast paths through the same
        # converted weights + disk metrics
        quantized_inference=args.quantized_inference,
        strip_rows=args.strip_rows,
    )

    # stage the published .pth where the Tester's epoch-checkpoint loader
    # looks for it ({version}_{adv_loss_type}_{epoch} + ".pth")
    from uegan_tpu.utils.checkpoint import ckpt_name

    models_dir = os.path.join(cfg.save_root_dir, version, cfg.model_save_path)
    os.makedirs(models_dir, exist_ok=True)
    staged = os.path.join(
        models_dir, ckpt_name(version, cfg.adv_loss_type, epoch) + ".pth")
    if not os.path.exists(staged):
        try:
            os.symlink(os.path.abspath(args.uegan_pth), staged)
        except OSError:
            shutil.copyfile(args.uegan_pth, staged)

    loaders = {"tes": get_test_loader(
        cfg.test_img_dir, img_size=cfg.test_img_size,
        batch_size=cfg.val_batch_size, num_workers=cfg.num_workers)}
    t0 = time.time()
    tester = Tester(loaders, cfg)
    results = tester.test()
    elapsed = time.time() - t0

    report = {
        "tool": "uegan_tpu.tools.parity_eval",
        "weights": {
            "uegan_pth": os.path.abspath(args.uegan_pth),
            "nima": os.path.abspath(args.nima_weights) if args.nima_weights else None,
        },
        "protocol": {
            "img_size": cfg.test_img_size,
            "border_crop_px": 4,
            "disk_protocol": True,
            "legacy_average": bool(args.legacy_metrics),
            "fast_path": {
                "compute_dtype": args.compute_dtype,
                "quantized_inference": args.quantized_inference or None,
                "strip_rows": args.strip_rows,
            },
            "reference": "tester.py:41-103 (epoch-92 flow), CalcPSNR.py, "
                         "CalcSSIM.py, CalcNIMA.py",
        },
        "metrics": {k: results[k] for k in ("psnr", "ssim", "nima") if k in results},
        "n_images": results["n_images"],
        "output_dir": results["output_dir"],
        "elapsed_sec": round(elapsed, 2),
    }

    expected = {
        "psnr": args.expected_psnr,
        "ssim": args.expected_ssim,
        "nima": args.expected_nima,
    }
    gates = {}
    for k, exp in expected.items():
        if exp is None or k not in report["metrics"]:
            continue
        delta = report["metrics"][k] - exp
        gates[k] = {
            "expected": exp,
            "delta": round(delta, 6),
            "pass": abs(delta) <= args.tolerance * max(abs(exp), 1e-9),
        }
    if gates:
        report["parity"] = gates
        report["parity_pass"] = all(g["pass"] for g in gates.values())
    return report


def main(argv=None) -> dict:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--uegan_pth", required=True,
                    help="published UEGAN checkpoint (.pth), e.g. UEGAN-FiveK_rahinge_92.pth")
    ap.add_argument("--test_img_dir", required=True,
                    help="FiveK test dir containing raw/ (and label/)")
    ap.add_argument("--test_label_dir", default="",
                    help="Expert-C label dir (enables PSNR/SSIM)")
    ap.add_argument("--nima_weights", default="",
                    help="NIMA pretrain-model.pth (enables NIMA)")
    ap.add_argument("--vgg_weights", default="",
                    help="recorded in the report only — VGG19 affects training, not eval")
    ap.add_argument("--epoch", default=92.0, type=float)
    ap.add_argument("--img_size", default=512, type=int)
    ap.add_argument("--batch", default=8, type=int)
    ap.add_argument("--num_workers", default=2, type=int)
    ap.add_argument("--compute_dtype", default="bfloat16")
    ap.add_argument("--work_dir", default="/tmp/uegan_parity_eval")
    ap.add_argument("--report", default="parity_report.json")
    ap.add_argument("--platform", default="", help="e.g. cpu to force the CPU backend")
    ap.add_argument("--quantized_inference", default="",
                    help='"int8" / "int8_pallas": certify the quantized fast path')
    ap.add_argument("--strip_rows", default=0, type=int,
                    help=">0 forces the exact H-strip executor (huge-image path); "
                         "0 = auto (strips at >=2048px), -1 = off")
    ap.add_argument("--legacy_metrics", action="store_true",
                    help="reproduce the reference's /(N-1) averaging for digit parity")
    ap.add_argument("--expected_psnr", type=float, default=None)
    ap.add_argument("--expected_ssim", type=float, default=None)
    ap.add_argument("--expected_nima", type=float, default=None)
    ap.add_argument("--tolerance", type=float, default=0.01,
                    help="relative parity tolerance for the --expected_* gates")
    args = ap.parse_args(argv)
    if args.vgg_weights:
        print("note: --vgg_weights recorded only (eval does not use VGG)")

    report = build_report(args)
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
    print("\n================ PARITY REPORT ================")
    for k, v in report["metrics"].items():
        line = f"{k.upper():>5}: {v:.4f}"
        if "parity" in report and k in report["parity"]:
            g = report["parity"][k]
            line += (f"   (expected {g['expected']:.4f}, delta {g['delta']:+.4f}, "
                     f"{'PASS' if g['pass'] else 'FAIL'})")
        print(line)
    if "parity_pass" in report:
        print(f"parity: {'PASS' if report['parity_pass'] else 'FAIL'}")
    print(f"report written to {args.report}")
    return report


if __name__ == "__main__":
    main()
