"""TensorBoard + CSV + console observability.

Replaces the reference's TF1-compat FileWriter Logger (reference:
utils.py:53-112) with ``torch.utils.tensorboard`` (pure-python protobuf
writer, no TF session), keeping the same call surface: scalar_summary,
images_summary, histo_summary.  Also provides the per-step console line and
elapsed-time formatting (reference: trainer.py:174-177).
"""

from __future__ import annotations

import datetime
import time
from typing import Dict, Optional

import numpy as np


class Logger:
    """TensorBoard logger; tags/steps mirror the reference hooks."""

    def __init__(self, log_dir: str):
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(log_dir)

    def scalar_summary(self, tag: str, value, step: int) -> None:
        self.writer.add_scalar(tag, float(value), step)

    def images_summary(self, tag: str, images01: np.ndarray, step: int) -> None:
        """images01: (N,H,W,C) floats in [0,1]."""
        arr = np.asarray(images01)
        for i, img in enumerate(arr):
            self.writer.add_image(f"{tag}/{i}", img, step, dataformats="HWC")

    def histo_summary(self, tag: str, values, step: int, bins: int = 1000) -> None:
        self.writer.add_histogram(tag, np.asarray(values), step, bins=bins)

    def flush(self) -> None:
        self.writer.flush()

    def close(self) -> None:
        self.writer.close()


class ProgressMeter:
    """Elapsed-time + loss console lines (reference: trainer.py:174-177)."""

    def __init__(self):
        self.start_time = time.time()

    def elapsed(self) -> str:
        return str(datetime.timedelta(seconds=time.time() - self.start_time))

    def info_line(self, step: int, total_steps: int, losses: Dict[str, float]) -> str:
        parts = ", ".join(f"{k}:{v:>.4f}" for k, v in losses.items())
        return (
            f"Elapse:{self.elapsed():>.12s}, Step:{step + 1:>6d}/{total_steps}, {parts}"
        )


class StepTimer:
    """Per-step wall-clock stats; optional jax.profiler traces."""

    def __init__(self, profile_dir: str = ""):
        self.profile_dir = profile_dir
        self.times = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def maybe_trace(self, step: int, start_step: int = 10, num_steps: int = 5):
        if not self.profile_dir:
            return
        import jax

        if step == start_step:
            jax.profiler.start_trace(self.profile_dir)
        elif step == start_step + num_steps:
            jax.profiler.stop_trace()

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times[2:] or self.times)  # skip compile steps
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_s": float(1.0 / arr.mean()),
        }
