"""XLA cost-analysis FLOP counts for the benchmarked graphs.

Observability tooling (SURVEY.md §5; no reference counterpart — the
reference never accounted FLOPs).  Compiles the requested graph and prints
XLA's own cost analysis (``compiled.cost_analysis()['flops']``), which
counts HARDWARE flops of the lowered graph — for the packed paths that
includes the ~4x space-to-depth kernel expansion, so it is the number to
compare against device peak when computing MFU (OPTIMIZATION_NOTES
round-4 roofline section).

Runs fine on CPU (``--platform cpu``) — cost analysis is a property of the
compiled module, not of execution, and CPU/TPU lower the same HLO convs.

Usage:
  python -m uegan_tpu.tools.flop_count --graph packed --hw 512 --batch 128
  python -m uegan_tpu.tools.flop_count --graph canonical --hw 512 --batch 128
  python -m uegan_tpu.tools.flop_count --graph strips --hw 2048 --batch 4
  python -m uegan_tpu.tools.flop_count --graph train --hw 256 --batch 10
"""

from __future__ import annotations

import argparse
import json


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="flop-count")
    p.add_argument("--graph", choices=["packed", "canonical", "strips", "train"],
                   default="packed")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--platform", type=str, default="cpu",
                   help="compile backend (cost analysis is backend-stable)")
    p.add_argument("--remat", action="store_true",
                   help="train graph: count the remat (recompute) FLOPs the "
                        "512px data-parallel config actually executes")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")

    import numpy as np

    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="bfloat16", remat=args.remat,
                 train_batch_size=args.batch)
    state, bundle = create_train_state(
        cfg, jax.random.PRNGKey(0), (args.hw, args.hw), 1)
    x = np.zeros((args.batch, args.hw, args.hw, 3), np.float32)

    if args.graph == "train":
        from uegan_tpu.train.step import make_train_step

        step = jax.jit(make_train_step(bundle), donate_argnums=(0,))
        lowered = step.lower(state, x, x)
    elif args.graph == "canonical":
        from uegan_tpu.train.step import make_eval_step

        fn = jax.jit(make_eval_step(bundle))
        lowered = fn.lower(state.g_params, state.g_extra, x)
    else:
        from uegan_tpu.infer.packed import make_fast_eval

        # `packed` routes small images to the full-image packed graph and
        # huge ones to the strip executor — same routing the bench uses;
        # `strips` just documents the intent at high-res shapes.
        fn = jax.jit(make_fast_eval(bundle, state.g_params))
        lowered = fn.lower(state.g_params, state.g_extra, x)

    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", float("nan")))
    bytes_ = float(ca.get("bytes accessed", float("nan")))
    out = {
        "graph": args.graph,
        "hw": args.hw,
        "batch": args.batch,
        "flops_per_call": flops,
        "gflops_per_image": round(flops / args.batch / 1e9, 2),
        "bytes_accessed_per_call": bytes_,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
