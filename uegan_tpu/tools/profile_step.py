"""Profile the jitted train/eval step with jax.profiler.

Observability tooling (the reference had only wall-clock prints,
SURVEY.md §5): captures an XLA trace viewable in TensorBoard's profile
plugin, plus wall-clock stats.

Usage:
  python -m uegan_tpu.tools.profile_step --mode eval --hw 512 --batch 32 \
      --out /tmp/uegan_trace [--platform cpu] [--steps 10]
"""

from __future__ import annotations

import argparse
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="profile-step")
    p.add_argument("--mode", choices=["train", "eval"], default="eval")
    p.add_argument("--packed", action="store_true",
                   help="eval mode: profile the packed fast path (the production inference path)")
    p.add_argument("--quantized", type=str, default="",
                   help="eval mode: profile the int8 quantized packed path")
    p.add_argument("--hw", type=int, default=512)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--out", type=str, default="/tmp/uegan_trace")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--platform", type=str, default="")
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")

    import jax.numpy as jnp
    import numpy as np

    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step, make_train_step

    cfg = Config(
        compute_dtype=args.compute_dtype,
        quantized_inference=args.quantized or "",
    ).validate()  # reject typo'd dtype/quantized values instead of silently profiling the wrong path
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (args.hw, args.hw), 1)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    rng = np.random.default_rng(0)

    if args.mode == "eval":
        if args.packed:
            from uegan_tpu.infer.packed import make_fast_eval

            fn = jax.jit(make_fast_eval(bundle, state.g_params))
        else:
            fn = jax.jit(make_eval_step(bundle))
        x = jax.device_put(rng.uniform(-1, 1, (args.batch, args.hw, args.hw, 3)).astype("float32"), dev)
        run = lambda: fn(state.g_params, state.g_extra, x)
    else:
        step_fn = jax.jit(make_train_step(bundle), donate_argnums=(0,))
        raw = jax.device_put(rng.uniform(-1, 1, (args.batch, args.hw, args.hw, 3)).astype("float32"), dev)
        exp = jax.device_put(rng.uniform(-1, 1, (args.batch, args.hw, args.hw, 3)).astype("float32"), dev)
        holder = {"state": state}

        def run():
            holder["state"], m, _ = step_fn(holder["state"], raw, exp)
            return m

        state = None  # donated

    r = run()  # compile
    jax.block_until_ready(r)
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])  # force + pay fetch handshake

    jax.profiler.start_trace(args.out)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        r = run()
    leaf = jax.tree_util.tree_leaves(r)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()

    per = dt / args.steps
    print(f"{args.mode} step: {per * 1000:.2f} ms ({args.batch / per:.1f} img/s)")
    print(f"trace written to {args.out} (view: tensorboard --logdir {args.out})")


if __name__ == "__main__":
    main()
