"""Fake-image history pool.

Semantics of the reference ImagePool (reference: utils.py:23-50): per image,
if the pool is not yet full, insert and return the image; otherwise with
probability 1/2 swap the image with a uniformly random pool slot and return
the evicted one, else pass the image through.  The sequential per-image logic
matters (later batch items can evict earlier ones), so the on-device version
is a ``lax.scan`` over the batch — it lives inside the jitted train step, so
the pool buffer never leaves HBM (the reference round-tripped every fake
batch through a host-side python list).

A host-side ``ImagePool`` class with identical semantics is kept for API
parity and for testing the scan against it.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PoolState(NamedTuple):
    images: jnp.ndarray  # (pool_size, H, W, C)
    count: jnp.ndarray  # int32 scalar: number of filled slots


def pool_init(pool_size: int, image_shape: Tuple[int, int, int], dtype=jnp.float32) -> PoolState:
    return PoolState(
        images=jnp.zeros((max(pool_size, 1),) + tuple(image_shape), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def pool_query(state: PoolState, batch: jnp.ndarray, key: jax.Array) -> Tuple[PoolState, jnp.ndarray]:
    """Query/update the pool with a batch; returns (new_state, returned batch).

    ``batch`` is (B, H, W, C); gradients never flow through the pool (the
    reference stores ``image.data`` and the D update detaches).
    """
    pool_size = state.images.shape[0]
    batch = jax.lax.stop_gradient(batch)

    def body(carry, inp):
        images, count, k = carry
        img = inp
        k, k_p, k_idx = jax.random.split(k, 3)
        not_full = count < pool_size
        p = jax.random.uniform(k_p)
        rand_id = jax.random.randint(k_idx, (), 0, pool_size)
        # slot to write: count when filling, rand_id when swapping, else none
        do_swap = jnp.logical_and(jnp.logical_not(not_full), p > 0.5)
        write = jnp.logical_or(not_full, do_swap)
        slot = jnp.where(not_full, count, rand_id)
        old = images[slot]
        ret = jnp.where(do_swap, old, img)
        new_img = jnp.where(write, img, old)
        images = jax.lax.dynamic_update_index_in_dim(images, new_img, slot, 0)
        count = jnp.where(not_full, count + 1, count)
        return (images, count, k), ret

    (images, count, _), rets = jax.lax.scan(body, (state.images, state.count, key), batch)
    return PoolState(images=images, count=count), rets


class ImagePool:
    """Host-side pool, API-compatible with the reference (utils.py:23-50)."""

    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.num_imgs = 0
        self.images = []
        self._rng = np.random.default_rng(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        if self.pool_size == 0:
            return images
        out = []
        for image in np.asarray(images):
            image = image[None]
            if self.num_imgs < self.pool_size:
                self.num_imgs += 1
                self.images.append(image)
                out.append(image)
            elif self._rng.uniform() > 0.5:
                rid = int(self._rng.integers(0, self.pool_size))
                tmp = self.images[rid].copy()
                self.images[rid] = image
                out.append(tmp)
            else:
                out.append(image)
        return np.concatenate(out, axis=0)
