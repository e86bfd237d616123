"""conv2d_reflect (zero-pad conv + border fix-up) vs materialized reflect pad.

The fused path must be numerically identical for every kernel size / stride
the models use (reference conv geometry: models.py:16-20,139-155), including
shapes small enough to trigger the fallback, and through the VJP (it runs in
the train step).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import uegan_tpu.ops.conv as conv_mod
from uegan_tpu.ops.conv import conv2d_nhwc, conv2d_reflect
from uegan_tpu.ops.padding import reflect_pad_2d, same_reflect_padding


@pytest.fixture(autouse=True)
def _force_fused(monkeypatch):
    # the production gate (batch >= 4) would route these small test batches
    # to the fallback; force the fused path so it stays covered
    monkeypatch.setattr(conv_mod, "FUSED_PAD_MIN_BATCH", 0)


def test_batch_gate_routes_small_batches_to_fallback(monkeypatch):
    monkeypatch.setattr(conv_mod, "FUSED_PAD_MIN_BATCH", 4)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))
    got = conv2d_reflect(x, kern, 1, 1, jnp.float32)
    want = conv2d_nhwc(reflect_pad_2d(x, 1), kern, 1, 1, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def _ref(x, k, stride, dilation=1):
    pad = same_reflect_padding(int(k.shape[0]), dilation)
    return conv2d_nhwc(reflect_pad_2d(x, pad), k, stride, dilation, jnp.float32)


CASES = [
    # (kernel, stride, h, w)  — generator: k7s1, k3s2, k3s1, k1s1; D: k7s2, k5s2
    (7, 1, 32, 32),
    (3, 2, 32, 32),
    (3, 1, 32, 32),
    (1, 1, 16, 16),
    (7, 2, 32, 48),
    (5, 2, 24, 32),
    (5, 2, 9, 9),     # odd size, strips overlap checks
    (3, 1, 7, 7),     # just above fallback bound (k+2p = 5)
    (5, 1, 8, 8),     # below fallback bound for w? k+2p=9 > 8 -> fallback
    (7, 1, 14, 18),   # k+2p = 13, just above
]


@pytest.mark.parametrize("k,s,h,w", CASES)
def test_conv2d_reflect_matches_materialized(k, s, h, w):
    rng = np.random.default_rng(k * 100 + s * 10 + h)
    x = jnp.asarray(rng.normal(size=(2, h, w, 5)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, 5, 4)).astype(np.float32) * 0.2)
    got = conv2d_reflect(x, kern, s, 1, jnp.float32)
    want = _ref(x, kern, s)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


def test_conv2d_reflect_dilation_falls_back():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 3)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, 3, 2)).astype(np.float32))
    got = conv2d_reflect(x, kern, 1, 2, jnp.float32)
    want = _ref(x, kern, 1, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-6, atol=2e-6)


@pytest.mark.parametrize("k,s", [(7, 1), (3, 2), (3, 1), (5, 2)])
def test_conv2d_reflect_grads_match(k, s):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, 3, 4)).astype(np.float32) * 0.2)

    def f_fused(x, kern):
        return jnp.sum(jnp.sin(conv2d_reflect(x, kern, s, 1, jnp.float32)))

    def f_ref(x, kern):
        return jnp.sum(jnp.sin(_ref(x, kern, s)))

    gx1, gk1 = jax.grad(f_fused, argnums=(0, 1))(x, kern)
    gx2, gk2 = jax.grad(f_ref, argnums=(0, 1))(x, kern)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), rtol=1e-5, atol=1e-5)


def test_conv2d_reflect_bf16():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 20, 20, 8)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32) * 0.2)
    got = conv2d_reflect(x, kern, 1, 1, jnp.bfloat16).astype(np.float32)
    want = conv2d_nhwc(
        reflect_pad_2d(x, 1), kern, 1, 1, jnp.bfloat16
    ).astype(np.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
