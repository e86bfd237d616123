"""Pallas int8 packed conv + fused epilogue (ops/pallas/packed_conv_int8.py).

Interpret mode (CPU): integer conv arithmetic is exact, so the interior
must match the XLA reference chain bit-for-bit after the epilogue (up to
f32 rounding of identical formulas, which is also exact here since both
compute the same f32 expressions elementwise).
"""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.ops.pallas.packed_conv_int8 import (
    eligible,
    packed_conv_int8_pallas,
)


def _xla_ref(xq, kq, w_scale, bias, s0, act="none", mul=None,
             out_scale=None, requant=False):
    S = kq.shape[0]
    s1 = S - 1 - s0
    y = lax.conv_general_dilated(
        xq, kq, (1, 1), ((s0, s1), (s0, s1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * w_scale + bias
    if act == "leaky":
        y = jnp.where(y >= 0, y, 0.2 * y)
    elif act == "tanh":
        y = jnp.tanh(y)
    if mul is not None:
        y = y * mul.astype(jnp.float32)
    if requant:
        return jnp.clip(jnp.round(y / out_scale), -127, 127).astype(jnp.int8)
    return y.astype(jnp.bfloat16)


def _mk(n=2, l=16, w=128, cin=128, cout=128, S=3, seed=0):
    rng = np.random.default_rng(seed)
    xq = jnp.asarray(rng.integers(-127, 128, (n, l, w, cin), dtype=np.int8))
    kq = jnp.asarray(rng.integers(-4, 5, (S, S, cin, cout), dtype=np.int8))
    ws = jnp.asarray(rng.uniform(1e-4, 3e-4, cout).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(cout).astype(np.float32) * 0.1)
    return xq, kq, ws, b


@pytest.mark.parametrize("S,s0", [(3, 1), (4, 2), (1, 0)])
def test_interior_matches_xla(S, s0):
    xq, kq, ws, b = _mk(S=S)
    got = packed_conv_int8_pallas(xq, kq, ws, b, s0, act="leaky",
                                  interpret=True, th=8)
    want = _xla_ref(xq, kq, ws, b, s0, act="leaky")
    s1 = S - 1 - s0
    sl = slice(s0, -s1 if s1 else None)
    # int32 conv arithmetic is exact; the f32->bf16 epilogue cast can
    # tie-break one ulp apart (FMA vs separate mul+add orderings)
    np.testing.assert_allclose(
        np.asarray(got[:, :, sl], np.float32),
        np.asarray(want[:, :, sl], np.float32),
        rtol=1 / 128, atol=1e-6,
    )


def test_requant_and_mul_epilogue():
    xq, kq, ws, b = _mk(S=3)
    rng = np.random.default_rng(3)
    mul = jnp.asarray(rng.standard_normal((2, 16, 128, 128)).astype(np.float32)).astype(jnp.bfloat16)
    osc = jnp.asarray(0.013, jnp.float32)
    got = packed_conv_int8_pallas(
        xq, kq, ws, b, 1, act="leaky", mul=mul, out_scale=osc, requant=True,
        interpret=True, th=4,
    )
    want = _xla_ref(xq, kq, ws, b, 1, act="leaky", mul=mul,
                    out_scale=osc, requant=True)
    assert got.dtype == jnp.int8
    diff = np.abs(np.asarray(got[:, :, 1:-1], np.int32)
                  - np.asarray(want[:, :, 1:-1], np.int32))
    # identical f32 formula; allow 1-lsb ties from ordering differences
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3


def test_matmul_1x1_exact_everywhere():
    xq, kq, ws, b = _mk(S=1)
    got = packed_conv_int8_pallas(xq, kq, ws, b, 0, act="none",
                                  interpret=True, th=8)
    want = _xla_ref(xq, kq, ws, b, 0, act="none")
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1 / 128, atol=1e-6)


def test_tanh_epilogue_close():
    xq, kq, ws, b = _mk(S=3, seed=5)
    got = packed_conv_int8_pallas(xq, kq, ws, b, 1, act="tanh",
                                  interpret=True, th=8)
    want = _xla_ref(xq, kq, ws, b, 1, act="tanh")
    np.testing.assert_allclose(
        np.asarray(got[:, :, 1:-1], np.float32),
        np.asarray(want[:, :, 1:-1], np.float32), atol=1e-2,
    )


def test_eligible():
    assert eligible((8, 256, 256, 128), (3, 3, 128, 128))
    assert not eligible((8, 256, 256, 12), (4, 4, 12, 128))
    assert not eligible((8, 256, 250, 128), (3, 3, 128, 128))
