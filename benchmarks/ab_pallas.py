"""A/B harness: the two round-2 Pallas kernels, micro + end-to-end on chip.

VERDICT r2 #2: ``ops/pallas/resize2x.py`` and ``ops/pallas/s2d_fuse.py``
landed interpret-tested but unwired/unmeasured.  This harness measures them
at the production shapes (512px B=128 packed inference) and A/Bs the full
packed forward with each flag flipped, following the int8_pallas precedent
(OPTIMIZATION_NOTES.md) — wire or retire on the numbers.

Usage:
  python benchmarks/ab_pallas.py --micro            # per-kernel standalone
  python benchmarks/ab_pallas.py --e2e              # full forward, 4 flag combos
  python benchmarks/ab_pallas.py --micro --e2e --batch 128 --hw 512
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _fence(r):
    import numpy as _np

    # axon tunnel: block_until_ready doesn't fence; fetch a corner scalar
    return _np.asarray(r.reshape(-1)[:1])


def _time(fn, args, iters):
    r = fn(*args)
    _fence(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _fence(r)
    return (time.perf_counter() - t0) / iters


def micro(batch: int, hw: int, iters: int) -> None:
    import jax
    import jax.numpy as jnp

    from uegan_tpu.infer.packed import depth_to_space, space_to_depth
    from uegan_tpu.ops.pallas.resize2x import eligible as rs_ok
    from uegan_tpu.ops.pallas.resize2x import upsample2x_ac_pallas
    from uegan_tpu.ops.pallas.s2d_fuse import eligible as sf_ok
    from uegan_tpu.ops.pallas.s2d_fuse import residual_tail_d2s, s2d_convert
    from uegan_tpu.ops.resize import upsample2x_align_corners

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    # --- resize2x at the three interior up-stage shapes (bf16) -------------
    for (h, c) in ((hw // 32, 512), (hw // 16, 256), (hw // 8, 128)):
        x = jax.device_put(
            rng.uniform(-1, 1, (batch, h, h, c)).astype(np.float32), dev
        ).astype(jnp.bfloat16)
        ok = rs_ok(h, h, c)
        xla = jax.jit(upsample2x_align_corners)
        t_xla = _time(xla, (x,), iters)
        line = f"resize2x ({batch},{h},{h},{c}): xla {t_xla * 1e3:7.2f} ms"
        if ok:
            try:
                pal = jax.jit(lambda t: upsample2x_ac_pallas(t))
                # numerics first
                ref = np.asarray(xla(x), np.float32)
                got = np.asarray(pal(x), np.float32)
                err = np.abs(ref - got).max()
                t_pal = _time(pal, (x,), iters)
                line += f" | pallas {t_pal * 1e3:7.2f} ms ({t_xla / t_pal:4.2f}x, maxerr {err:.2e})"
            except Exception as e:  # Mosaic compile failures — record, keep going
                line += f" | pallas COMPILE-FAIL: {str(e).splitlines()[0][:120]}"
        else:
            line += " | pallas INELIGIBLE"
        print(line, flush=True)

    # --- s2d boundaries at the entry/exit shapes ---------------------------
    x = jax.device_put(rng.uniform(-1, 1, (batch, hw, hw, 3)).astype(np.float32), dev)
    jn_in = jax.jit(lambda t: space_to_depth(t.astype(jnp.bfloat16)))
    t_x = _time(jn_in, (x,), iters)
    if sf_ok(hw // 2, hw // 2, 3):
        try:
            pl_in = jax.jit(lambda t: s2d_convert(t))
            err = np.abs(
                np.asarray(jn_in(x), np.float32) - np.asarray(pl_in(x), np.float32)
            ).max()
            t_p = _time(pl_in, (x,), iters)
            print(
                f"s2d_convert ({batch},{hw},{hw},3): xla {t_x * 1e3:7.2f} ms | "
                f"pallas {t_p * 1e3:7.2f} ms ({t_x / t_p:4.2f}x, maxerr {err:.2e})",
                flush=True,
            )
        except Exception as e:
            print(f"s2d_convert: pallas COMPILE-FAIL: {str(e).splitlines()[0][:120]}",
                  flush=True)
    else:
        print(f"s2d_convert: INELIGIBLE; xla {t_x * 1e3:.2f} ms", flush=True)

    res = jax.device_put(
        rng.uniform(-0.5, 0.5, (batch, hw // 2, hw // 2, 12)).astype(np.float32), dev
    ).astype(jnp.bfloat16)
    xp = jax.device_put(
        rng.uniform(-1, 1, (batch, hw // 2, hw // 2, 12)).astype(np.float32), dev
    ).astype(jnp.bfloat16)

    def jn_tail(r, q):
        out = jnp.clip(r.astype(jnp.float32) + q.astype(jnp.float32), -1.0, 1.0)
        return depth_to_space(out.astype(jnp.bfloat16))

    jt = jax.jit(jn_tail)
    t_x = _time(jt, (res, xp), iters)
    if sf_ok(hw // 2, hw // 2, 3):
        try:
            pt = jax.jit(lambda r, q: residual_tail_d2s(r, q))
            err = np.abs(
                np.asarray(jt(res, xp), np.float32) - np.asarray(pt(res, xp), np.float32)
            ).max()
            t_p = _time(pt, (res, xp), iters)
            print(
                f"residual_tail ({batch},{hw // 2},{hw // 2},12): xla {t_x * 1e3:7.2f} ms | "
                f"pallas {t_p * 1e3:7.2f} ms ({t_x / t_p:4.2f}x, maxerr {err:.2e})",
                flush=True,
            )
        except Exception as e:
            print(f"residual_tail: pallas COMPILE-FAIL: {str(e).splitlines()[0][:120]}",
                  flush=True)
    else:
        print(f"residual_tail: INELIGIBLE; xla {t_x * 1e3:.2f} ms", flush=True)


def e2e(batch: int, hw: int, iters: int, combos: str) -> None:
    import jax

    import uegan_tpu.infer.packed as pm
    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (hw, hw), 1)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    packed = pm.pack_generator_params(jax.device_get(state.g_params), 32)
    x = jax.device_put(
        np.random.default_rng(0).uniform(-1, 1, (batch, hw, hw, 3)).astype("float32"),
        dev,
    )

    ALL = frozenset({"upsample1", "upsample2", "upsample3"})
    names = {
        "base": (False, frozenset()),
        "bound": (True, frozenset()),
        "up1": (False, frozenset({"upsample1"})),
        "up3": (False, frozenset({"upsample3"})),
        "up13": (False, frozenset({"upsample1", "upsample3"})),
        "resize": (False, ALL),
        "both": (True, ALL),
    }
    results = {}
    saved = (pm._PALLAS_BOUNDARIES, pm._PALLAS_RESIZE)
    for name in combos.split(","):
        pm._PALLAS_BOUNDARIES, pm._PALLAS_RESIZE = names[name]
        fn = jax.jit(pm.make_packed_eval(bundle, packed))
        dt = _time(lambda t: fn(state.g_params, t), (x,), iters)
        results[name] = batch / dt
        print(f"e2e {name:7s} (bound={names[name][0]}, resize={sorted(names[name][1])}): "
              f"{batch / dt:6.1f} img/s ({dt * 1e3:.1f} ms)")
    pm._PALLAS_BOUNDARIES, pm._PALLAS_RESIZE = saved
    best = max(results, key=results.get)
    print(f"best: {best} ({results[best]:.1f} img/s)")


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--micro", action="store_true")
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--combos", type=str, default="base,bound,resize,both")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")
    if args.micro:
        micro(args.batch, args.hw, args.iters)
    if args.e2e:
        e2e(args.batch, args.hw, args.iters, args.combos)


if __name__ == "__main__":
    main()
