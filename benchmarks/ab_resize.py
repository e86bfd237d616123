"""A/B harness: staging variants of the fused resize+1x1-conv einsum.

The one-einsum form (packed_resize2x_conv1x1) measured 33 vs 60 ms
standalone against resize-then-conv, but the optimized HLO shows XLA stages
it as a convolution whose output layout costs two full-size relayout copies
(~13 ms/step at 512px B=128) before the dec4 conv.  This harness measures
manual stagings that might land in dec4-friendly layouts.

Usage: python benchmarks/ab_resize.py [--batch 128] [--hw 512] [--variants v0,v1,...]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def variants():
    import jax
    import jax.numpy as jnp

    from uegan_tpu.ops.resize import _interp_matrix_np

    def _mats(h, w, oh, ow, dtype):
        mh = _interp_matrix_np(h, oh, True)
        mw = _interp_matrix_np(w, ow, True)
        mhp = jnp.asarray(mh.reshape(oh // 2, 2, h).transpose(1, 0, 2), dtype)  # (2,oh/2,h)
        mwp = jnp.asarray(mw.reshape(ow // 2, 2, w).transpose(1, 0, 2), dtype)  # (2,ow/2,w)
        return mhp, mwp

    from uegan_tpu.infer.packed import packed_resize2x_conv1x1 as _orig

    def v0(x, kernel, bias, out_hw):
        """Control: current one-einsum form (bound before any monkeypatch)."""
        return _orig(x, kernel, bias, out_hw)

    def v1(x, kernel, bias, out_hw):
        """Stage W+C first ((f q) packed-W tensor at unresized H), then H."""
        n, h, w, c = x.shape
        oh, ow = out_hw
        mhp, mwp = _mats(h, w, oh, ow, x.dtype)
        k = kernel[0, 0].astype(x.dtype)
        q = k.shape[-1]
        t = jnp.einsum("fpw,nhwc,cq->nhpfq", mwp, x, k)  # (n,h,ow/2,2,q)
        y = jnp.einsum("eoh,nhpfq->nopefq", mhp, t)
        y = y.reshape(n, oh // 2, ow // 2, 4 * q)
        return (y + jnp.tile(bias.astype(y.dtype), 4)).astype(x.dtype)

    def v2(x, kernel, bias, out_hw):
        """Stage H first, then W+C."""
        n, h, w, c = x.shape
        oh, ow = out_hw
        mhp, mwp = _mats(h, w, oh, ow, x.dtype)
        k = kernel[0, 0].astype(x.dtype)
        q = k.shape[-1]
        t = jnp.einsum("eoh,nhwc->noewc", mhp, x)  # (n,oh/2,2,w,c)
        y = jnp.einsum("fpw,noewc,cq->nopefq", mwp, t, k)
        y = y.reshape(n, oh // 2, ow // 2, 4 * q)
        return (y + jnp.tile(bias.astype(y.dtype), 4)).astype(x.dtype)

    def v3(x, kernel, bias, out_hw):
        """Channels first at low res (cheap 64->32 matmul), then the packed
        resize einsum on the q-channel tensor."""
        n, h, w, c = x.shape
        oh, ow = out_hw
        mhp, mwp = _mats(h, w, oh, ow, x.dtype)
        k = kernel[0, 0].astype(x.dtype)
        q = k.shape[-1]
        z = jnp.einsum("nhwc,cq->nhwq", x, k)
        y = jnp.einsum("eoh,fpw,nhwq->nopefq", mhp, mwp, z)
        y = y.reshape(n, oh // 2, ow // 2, 4 * q)
        return (y + jnp.tile(bias.astype(y.dtype), 4)).astype(x.dtype)

    def v4(x, kernel, bias, out_hw):
        """One-einsum form but with dot_general staging forced via reshape to
        merge (e,f,q) early: mhp/mwp pre-crossed into one (4, oh/2, ow/2-
        factorized) operand is infeasible; instead emit phases as leading
        dims and move them into channels with one transpose of a 4-major
        tensor (tests whether a phase-major copy beats XLA's)."""
        n, h, w, c = x.shape
        oh, ow = out_hw
        mhp, mwp = _mats(h, w, oh, ow, x.dtype)
        k = kernel[0, 0].astype(x.dtype)
        q = k.shape[-1]
        y = jnp.einsum("eoh,fpw,nhwc,cq->efnopq", mhp, mwp, x, k)  # (2,2,n,o,p,q)
        y = jnp.moveaxis(y.reshape(4, n, oh // 2, ow // 2, q), 0, -2)
        y = y.reshape(n, oh // 2, ow // 2, 4 * q)
        return (y + jnp.tile(bias.astype(y.dtype), 4)).astype(x.dtype)

    return {"v0": v0, "v1": v1, "v2": v2, "v3": v3, "v4": v4}


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--variants", type=str, default="v0,v1,v2,v3,v4")
    ap.add_argument("--check", action="store_true", help="f32 equivalence check on CPU")
    args = ap.parse_args(argv)

    import jax

    if args.check:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_uegan")

    import jax.numpy as jnp

    import uegan_tpu.infer.packed as packed_mod
    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state

    vs = variants()

    if args.check:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)).astype(np.float32))
        kern = jnp.asarray(rng.standard_normal((1, 1, 8, 4)).astype(np.float32))
        bias = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
        ref = np.asarray(vs["v0"](x, kern, bias, (32, 32)))
        for name in args.variants.split(","):
            got = np.asarray(vs[name](x, kern, bias, (32, 32)))
            np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
            print(f"{name}: exact vs v0 (f32 atol 1e-4) OK")
        return

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (args.hw, args.hw), 1)
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    packed = packed_mod.pack_generator_params(jax.device_get(state.g_params), 32)
    x = jax.device_put(
        np.random.default_rng(0).uniform(-1, 1, (args.batch, args.hw, args.hw, 3)).astype("float32"),
        dev,
    )

    results = {}
    for name in args.variants.split(","):
        packed_mod.packed_resize2x_conv1x1 = vs[name]
        fn = jax.jit(packed_mod.make_packed_eval(bundle, packed))
        r = fn(state.g_params, x)
        np.asarray(r[0, 0, 0, 0])  # fence (block_until_ready doesn't, on axon)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = fn(state.g_params, x)
        np.asarray(r[0, 0, 0, 0])
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = args.batch / dt
        print(f"{name}: {args.batch / dt:.1f} img/s ({dt * 1000:.1f} ms)")
    best = max(results, key=results.get)
    print(f"best: {best} ({results[best]:.1f} img/s)")


if __name__ == "__main__":
    main()
