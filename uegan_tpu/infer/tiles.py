"""Overlap-tile high-res inference with feathered stitching.

Single-device fallback for BASELINE config #5 (2048px inference): the image
is covered with overlapping tiles; each tile runs through the generator; the
outputs are blended with a linear feathering window over the overlap so seams
vanish.  NOTE: GAM's global mean/std become per-tile statistics here — an
approximation.  The exact high-res path is GSPMD spatial sharding
(:mod:`uegan_tpu.infer.spatial`), where the statistics are computed globally
via compiler-inserted collectives.

The reference had no high-res path at all — it resized everything to 512^2
(reference: data_loader.py:95-101), destroying native resolution.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def _starts(full: int, tile: int, stride: int):
    if full <= tile:
        return [0]
    s = list(range(0, full - tile, stride))
    s.append(full - tile)
    return s


def _feather_window(tile: int, overlap: int) -> np.ndarray:
    w = np.ones(tile, np.float32)
    if overlap > 0:
        ramp = (np.arange(overlap, dtype=np.float32) + 1.0) / (overlap + 1.0)
        w[:overlap] = ramp
        w[-overlap:] = ramp[::-1]
    return w


def make_device_tiled_enhancer(bundle, image_hw, tile: int = 512, overlap: int = 32):
    """Fully on-device tile/stitch: extract -> enhance (one batched G call) ->
    feather-blend, all inside one jitted program; a single device->host fetch
    returns the stitched image.  (The host-side :func:`enhance_tiled` fetches
    every tile batch — measured 8.2 s/img over the remote-TPU tunnel vs the
    compute cost of ~0.2 s.)

    Returns ``fn(g_params, g_extra, image_hw3) -> image_hw3`` (jitted), for a
    fixed image size.  Images larger than HBM should fall back to the host
    path or GSPMD spatial sharding.
    """
    import jax
    import jax.numpy as jnp
    import jax.lax as jlax

    from uegan_tpu.train.step import make_eval_step

    assert tile % 16 == 0, "tile size must be divisible by 16"
    h, w = image_hw
    stride = tile - 2 * overlap
    assert stride > 0, "overlap too large for tile size"
    ys = _starts(max(h, tile), tile, stride)
    xs = _starts(max(w, tile), tile, stride)
    fw = _feather_window(tile, overlap)
    win = jnp.asarray((fw[:, None] * fw[None, :])[..., None], jnp.float32)
    eval_fn = make_eval_step(bundle)

    def fn(g_params, g_extra, image):
        img = image
        ph, pw = max(0, tile - h), max(0, tile - w)
        if ph or pw:
            img = jnp.pad(img, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        tiles = jnp.stack(
            [jlax.dynamic_slice(img, (y, x, 0), (tile, tile, 3)) for y in ys for x in xs]
        )
        outs = eval_fn(g_params, g_extra, tiles).astype(jnp.float32) * win[None]
        acc = jnp.zeros(img.shape[:2] + (3,), jnp.float32)
        wacc = jnp.zeros(img.shape[:2] + (1,), jnp.float32)
        k = 0
        for y in ys:
            for x in xs:
                cur = jlax.dynamic_slice(acc, (y, x, 0), (tile, tile, 3))
                acc = jlax.dynamic_update_slice(acc, cur + outs[k], (y, x, 0))
                curw = jlax.dynamic_slice(wacc, (y, x, 0), (tile, tile, 1))
                wacc = jlax.dynamic_update_slice(wacc, curw + win, (y, x, 0))
                k += 1
        return (acc / jnp.maximum(wacc, 1e-8))[:h, :w]

    return jax.jit(fn)


def enhance_tiled(
    enhance_batch: Callable[[np.ndarray], np.ndarray],
    image: np.ndarray,
    tile: int = 512,
    overlap: int = 32,
) -> np.ndarray:
    """Enhance one HWC [-1,1] image of arbitrary size.

    ``enhance_batch`` maps an NHWC [-1,1] batch to enhanced NHWC.  Tile edge
    must be a multiple of 16; the image is reflect-padded up to tile coverage.
    """
    assert tile % 16 == 0, "tile size must be divisible by 16"
    h, w, c = image.shape
    ph, pw = max(0, tile - h), max(0, tile - w)
    if ph or pw:
        image = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="reflect")
    hh, ww, _ = image.shape
    stride = tile - 2 * overlap
    assert stride > 0, "overlap too large for tile size"

    ys = _starts(hh, tile, stride)
    xs = _starts(ww, tile, stride)
    tiles = np.stack([image[y : y + tile, x : x + tile] for y in ys for x in xs])
    outs = []
    bs = 8
    for i in range(0, len(tiles), bs):
        chunk = tiles[i : i + bs]
        if len(chunk) < bs and len(tiles) > bs:
            pad = np.zeros((bs - len(chunk), tile, tile, c), tiles.dtype)
            outs.append(np.asarray(enhance_batch(np.concatenate([chunk, pad])))[: len(chunk)])
        else:
            outs.append(np.asarray(enhance_batch(chunk)))
    outs = np.concatenate(outs)

    fw = _feather_window(tile, overlap)
    win = fw[:, None] * fw[None, :]
    acc = np.zeros((hh, ww, c), np.float32)
    wacc = np.zeros((hh, ww, 1), np.float32)
    k = 0
    for y in ys:
        for x in xs:
            acc[y : y + tile, x : x + tile] += outs[k] * win[..., None]
            wacc[y : y + tile, x : x + tile] += win[..., None]
            k += 1
    result = acc / np.maximum(wacc, 1e-8)
    return result[:h, :w]
