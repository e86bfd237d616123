"""Image-pool semantics: on-device scan vs host reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np

from uegan_tpu.train.image_pool import ImagePool, PoolState, pool_init, pool_query


def test_pool_fill_phase_returns_inputs():
    state = pool_init(8, (2, 2, 1))
    batch = jnp.arange(4 * 2 * 2 * 1, dtype=jnp.float32).reshape(4, 2, 2, 1)
    state, out = pool_query(state, batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(batch))
    assert int(state.count) == 4
    np.testing.assert_allclose(np.asarray(state.images[:4]), np.asarray(batch))


def test_pool_full_returns_mix_of_old_and_new():
    state = pool_init(4, (1, 1, 1))
    fill = jnp.zeros((4, 1, 1, 1))
    state, _ = pool_query(state, fill, jax.random.PRNGKey(0))
    batch = jnp.ones((32, 1, 1, 1))
    state, out = pool_query(state, batch, jax.random.PRNGKey(1))
    vals = np.asarray(out).ravel()
    # with 32 queries at p=1/2 swap, both behaviors occur w.h.p.
    assert (vals == 1.0).any()  # pass-through
    assert (vals == 0.0).any()  # evicted old zeros
    assert int(state.count) == 4


def test_pool_sequential_eviction_visible_within_batch():
    """A later batch item can evict an image stored earlier in the same query."""
    state = pool_init(1, (1, 1, 1))
    state, _ = pool_query(state, jnp.full((1, 1, 1, 1), 7.0), jax.random.PRNGKey(0))
    batch = jnp.arange(1, 65, dtype=jnp.float32).reshape(64, 1, 1, 1)
    state, out = pool_query(state, batch, jax.random.PRNGKey(2))
    evicted = np.asarray(out).ravel()
    swapped = evicted[evicted != np.arange(1, 65)]
    assert len(swapped) > 0  # some swaps happened
    # every evicted value must be either 7 or a value inserted earlier in batch
    for i, v in enumerate(evicted):
        assert v == i + 1 or v == 7.0 or v < i + 1


def test_host_pool_matches_reference_semantics():
    pool = ImagePool(2, seed=0)
    a = np.zeros((2, 1, 1, 1), np.float32)
    out = pool.query(a)
    np.testing.assert_allclose(out, a)
    b = np.ones((8, 1, 1, 1), np.float32)
    out2 = pool.query(b)
    assert out2.shape == b.shape
    assert set(np.unique(out2)).issubset({0.0, 1.0})


def test_pool_state_is_jittable():
    state = pool_init(4, (2, 2, 3))
    batch = jnp.ones((2, 2, 2, 3))
    jitted = jax.jit(pool_query)
    state, out = jitted(state, batch, jax.random.PRNGKey(0))
    assert out.shape == batch.shape
