"""Smoke test for bench.py's multi-device branch (VERDICT r2 #6).

bench.py's >1-device path (data-mesh sharding + aggregate reporting) was
written for future multi-chip hardware and had never executed.  Run the REAL
bench code in a subprocess on the 8-virtual-device CPU platform with tiny
shapes (env hooks UEGAN_BENCH_*) and assert the JSON contract.
"""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_bench_multi_device_branch(tmp_path):
    env = dict(os.environ)
    env.update(
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
        UEGAN_TPU_PLATFORM="cpu",
        UEGAN_BENCH_BATCH="2",
        UEGAN_BENCH_HW="64",
        UEGAN_BENCH_WARMUP="1",
        UEGAN_BENCH_ITERS="1",
    )
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root
    out = subprocess.run(
        [sys.executable, os.path.join(root, "bench.py")],
        capture_output=True, text=True, timeout=1200, env=env,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # the contract: exactly one JSON line on stdout
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert rec["metric"] == "images_per_sec_512px_inference"
    assert rec["unit"] == "img/s/chip"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    # multi-device branch actually ran: mesh fields present and consistent
    assert rec["n_devices"] == 8
    # aggregate == sum of the 8 per-chip rates (equal shards by construction)
    assert abs(rec["aggregate_img_per_sec"] - rec["value"] * 8) < 0.1 * rec["value"]
    assert abs(rec["vs_baseline"] - rec["value"] / 120.0) < 5e-3
