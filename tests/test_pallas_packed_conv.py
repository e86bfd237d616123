"""Interpret-mode tests for the Pallas packed-conv kernel (not wired: XLA is
already at the MXU roofline for these convs — see OPTIMIZATION_NOTES.md)."""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.ops.pallas.packed_conv import eligible, packed_conv_pallas


@pytest.mark.parametrize(
    "S,s0,L,W,cin,cout,th",
    [
        (3, 1, 32, 16, 128, 128, 8),   # multi-block grid
        (3, 1, 32, 16, 128, 128, 0),   # single-block grid
        (5, 2, 32, 24, 128, 128, 8),   # k7-packed geometry
        (3, 1, 16, 16, 256, 128, 8),   # dec4 channel ratio
        (2, 1, 16, 16, 128, 128, 4),   # asymmetric pad (s1 = 0)
    ],
)
def test_packed_conv_pallas_interior_matches_lax(rng, S, s0, L, W, cin, cout, th):
    x = jnp.asarray(rng.normal(size=(2, L, W, cin)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(S, S, cin, cout)).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    s1 = S - 1 - s0
    ref = lax.conv_general_dilated(
        x, k, (1, 1), ((s0, s1), (s0, s1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    ) + b
    ref = jnp.where(ref >= 0, ref, 0.2 * ref)
    got = packed_conv_pallas(x, k, b, s0, act="leaky", interpret=True, th=th)
    # contract: interior columns exact; border columns [0,s0)/[W-s1,W) are
    # wrapped by design and must be overwritten by the caller's strips
    hi = W - s1 if s1 else W
    np.testing.assert_allclose(
        np.asarray(got[:, :, s0:hi]), np.asarray(ref[:, :, s0:hi]), rtol=2e-5, atol=2e-5
    )


def test_eligibility_gate():
    assert eligible((32, 256, 256, 256), (3, 3, 256, 128))
    assert not eligible((32, 256, 256, 96), (3, 3, 96, 128))   # 96 lanes
    assert not eligible((32, 256, 250, 128), (3, 3, 128, 128))  # W unaligned
