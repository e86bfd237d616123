"""Interpret-mode equivalence for the fused x2 align-corners upsample kernel."""

import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.ops.pallas.resize2x import upsample2x_ac_pallas
from uegan_tpu.ops.resize import upsample2x_align_corners


@pytest.fixture
def rng():
    return np.random.default_rng(11)


@pytest.mark.parametrize("n,h,w,c,th", [
    (2, 8, 8, 4, 0),      # single block (nh == 1)
    (1, 16, 8, 4, 4),     # multi-block with first/interior/last
    (2, 12, 10, 3, 6),    # two blocks, odd-ish W/C
])
def test_upsample2x_pallas_matches_matmul(rng, n, h, w, c, th):
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, c)).astype(np.float32))
    want = upsample2x_align_corners(x)
    got = upsample2x_ac_pallas(x, interpret=True, th=th)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_upsample2x_pallas_bf16(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 8, 4)).astype(np.float32)).astype(jnp.bfloat16)
    want = upsample2x_align_corners(x.astype(jnp.float32))
    got = upsample2x_ac_pallas(x, interpret=True)
    # kernel lerps in f32 from bf16 inputs; bf16-input matmul reference
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want), rtol=1e-2, atol=1e-2)
