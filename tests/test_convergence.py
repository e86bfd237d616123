"""Convergence regression: training LEARNS, not just steps (VERDICT r4 #1).

Every other training test is a 1-2 step mechanics canary; this one trains the
real path (Trainer epoch loop, single-jit step, pool, SN, schedules, disk
data pipeline) for 400 steps on the synthetic-operator fixture
(tools/convergence_fixture.py: exp = fixed tone-curve+color-matrix of raw)
and asserts val PSNR of G(raw) against the known operator target rises.

Thresholds are conservative halves of the measured r5 CPU trajectory
(benchmarks/CONVERGENCE_r5_tiny.json: init 15.95 dB -> 18.95 dB at step 400,
monotonic from step 100, identity-copy baseline 16.17 dB):
  - final >= init + 1.5 dB   (measured gain at 400: +3.00)
  - final >  identity PSNR   (G enhanced, didn't memorize the identity)
The data pipeline's (seed, epoch, index) RNG and the seeded train step make
the run deterministic on CPU, so this is a numerics regression gate as much
as a learning gate.
"""

import numpy as np
import pytest


@pytest.mark.slow
def test_training_learns_the_operator(tmp_path):
    from benchmarks.convergence import run_convergence

    rec = run_convergence(
        preset="tiny", steps=400, root=str(tmp_path / "fixture"),
        platform="cpu", record_every=100,
    )
    assert rec["psnr_final_db"] >= rec["psnr_init_db"] + 1.5, rec
    assert rec["psnr_final_db"] > rec["identity_psnr_db"], rec
    # the trajectory must actually trend (not one lucky endpoint): the best
    # recorded point clears init by 2 dB
    best = max(p for _, p in rec["psnr_trajectory"])
    assert best >= rec["psnr_init_db"] + 2.0, rec["psnr_trajectory"]
    # loss sanity: adversarial losses stayed finite
    assert all(np.isfinite(l["D/Total"]) and np.isfinite(l["G/Total"])
               for l in rec["loss_trajectory"])
