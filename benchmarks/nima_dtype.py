"""Price the NIMA eval dtype: bf16 vs f32 score deltas (VERDICT r4 #4).

RESULTS_r4.json measured config 2 at 1,329 img/s f32 vs 29,979 bf16 — a
22.6x left on the table if bf16's score error is negligible for the metric's
job (per-image mean/std on the 1-10 scale; epoch-average best-epoch
selection).  This measures that error on a synthetic-photo fixture set:

  per-image |d mean| (avg + max), |d std| (avg + max), and the delta of the
  SET AVERAGE (what best-epoch selection actually consumes).

Caveat recorded with the numbers: published NIMA weights are absent from the
environment (.MISSING_LARGE_BLOBS), so this runs at random init — noise-like
logits make softmax outputs MORE dtype-sensitive than trained weights'
confident logits, i.e. this regime over-states the trained-weights error
(same argument as the oracle-test bound in models/nima.py).

Usage: python benchmarks/nima_dtype.py [--n 64] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--platform", default="")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from uegan_tpu.metrics.nima import init_nima, nima_scores, prepare_image_np
    from uegan_tpu.tools.convergence_fixture import synth_photo

    rng = np.random.default_rng(42)
    batch = np.stack([
        prepare_image_np(
            Image.fromarray((synth_photo(rng, 256) * 255 + 0.5).astype("uint8")))
        for _ in range(args.n)
    ])

    out = {}
    for dt in ("float32", "bfloat16"):
        # same seed -> identical f32 params; only the conv compute dtype moves
        model, variables = init_nima(compute_dtype=dt)
        fn = jax.jit(lambda b, m=model, v=variables: nima_scores(m, v, b))
        means, stds = fn(jnp.asarray(batch))
        out[dt] = (np.asarray(means, np.float64), np.asarray(stds, np.float64))

    dm = np.abs(out["float32"][0] - out["bfloat16"][0])
    ds = np.abs(out["float32"][1] - out["bfloat16"][1])
    rec = {
        "n_images": args.n,
        "weights": "random init (published weights absent — over-states the "
                   "trained-weights error; see module docstring)",
        "mean_abs_dmean": round(float(dm.mean()), 5),
        "max_abs_dmean": round(float(dm.max()), 5),
        "mean_abs_dstd": round(float(ds.mean()), 5),
        "max_abs_dstd": round(float(ds.max()), 5),
        "set_average_delta": round(
            float(abs(out["float32"][0].mean() - out["bfloat16"][0].mean())), 5),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
