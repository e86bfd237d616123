"""GSPMD spatially-sharded high-res inference (BASELINE config #5).

A 2048px image is sharded row-wise across the mesh; XLA inserts halo
exchanges for every conv receptive field and global reductions for GAM's
mean/std and the align-corners resize matmuls — the spatial analog of
ring/context parallelism for sequence models (SURVEY.md §5).  No manual
collectives; correctness is bit-identical to single-device execution (modulo
reduction order), unlike the tile/stitch approximation.
"""

from __future__ import annotations

from typing import Callable

import jax

from uegan_tpu.parallel.sharding import replicated, spatial_sharding


def make_spatial_enhancer(bundle, mesh, g_params=None, calib_batch=None) -> Callable:
    """Jitted G forward with image H sharded over all mesh devices.

    With ``g_params`` given, uses the production fast path for this config
    (packed space-to-depth, optionally int8-quantized — infer/packed.py's
    make_fast_eval, with ``calib_batch`` seeding the int8 activation
    calibration); the DUS border strips, quantize ops, and GAM reductions
    all shard cleanly (test-enforced equal to single-device).  Without it,
    the canonical eval step.
    """
    rep = replicated(mesh)
    sp = spatial_sharding(mesh)
    if g_params is not None:
        from uegan_tpu.infer.packed import make_fast_eval

        eval_fn = make_fast_eval(bundle, g_params, calib_batch=calib_batch)
    else:
        from uegan_tpu.train.step import make_eval_step

        eval_fn = make_eval_step(bundle)
    return jax.jit(eval_fn, in_shardings=(rep, rep, sp), out_shardings=sp)


def enhance_spatial_sharded(bundle, mesh, g_params, g_extra, image_nhwc,
                            fast: bool = False):
    """One-shot convenience: enhance an NHWC batch with spatial sharding.

    Rebuilds the jitted program (and, with ``fast``, re-packs kernels /
    re-runs int8 calibration) on every call — callers in a loop should build
    once via :func:`make_spatial_enhancer` and reuse it (as Tester.enhance
    does)."""
    fn = make_spatial_enhancer(bundle, mesh, g_params if fast else None)
    img = jax.device_put(image_nhwc, spatial_sharding(mesh))
    params = jax.device_put(g_params, replicated(mesh))
    extra = jax.device_put(g_extra, replicated(mesh))
    return fn(params, extra, img)
