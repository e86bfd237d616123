"""Interpret-mode equivalence tests for the fused s2d boundary kernels."""

import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.infer.packed import depth_to_space, space_to_depth
from uegan_tpu.ops.pallas.s2d_fuse import residual_tail_d2s, s2d_convert


@pytest.fixture
def rng():
    return np.random.default_rng(3)


@pytest.mark.parametrize("n,h,w,c,th", [(2, 16, 16, 3, 0), (1, 32, 24, 3, 4), (2, 16, 16, 4, 2)])
def test_s2d_convert_matches_jnp(rng, n, h, w, c, th):
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))
    want = space_to_depth(x).astype(jnp.bfloat16)
    got = s2d_convert(x, interpret=True, th=th)
    assert got.dtype == jnp.bfloat16 and got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))


@pytest.mark.parametrize("n,hp,wp,c,th", [(2, 8, 8, 3, 0), (1, 16, 12, 3, 4), (2, 8, 8, 4, 2)])
def test_residual_tail_d2s_matches_jnp(rng, n, hp, wp, c, th):
    res = jnp.asarray(rng.uniform(-2, 2, (n, hp, wp, 4 * c)).astype(np.float32)).astype(jnp.bfloat16)
    xp = jnp.asarray(rng.uniform(-1, 1, (n, hp, wp, 4 * c)).astype(np.float32)).astype(jnp.bfloat16)
    want = depth_to_space(
        jnp.clip(res.astype(jnp.float32) + xp.astype(jnp.float32), -1.0, 1.0).astype(jnp.bfloat16)
    )
    got = residual_tail_d2s(res, xp, interpret=True, th=th)
    assert got.dtype == jnp.bfloat16 and got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got, np.float32), np.asarray(want, np.float32))
