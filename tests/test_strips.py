"""Exact H-strip execution (infer/strips.py) vs the direct packed forward.

The strip executor must be numerically the direct packed program — the halo
margins cover every chain's receptive reach, so any mismatch is a geometry
bug, not tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.config import Config
from uegan_tpu.infer.packed import make_packed_eval, pack_generator_params
from uegan_tpu.infer.strips import make_strip_eval, pick_strip_rows
from uegan_tpu.train.state import create_train_state


def _setup(hw, dtype="float32"):
    cfg = Config(compute_dtype=dtype)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), hw, 1)
    g_params = jax.device_get(state.g_params)
    packed = pack_generator_params(g_params, bundle.g_model.conv_dim)
    return state, bundle, g_params, packed


@pytest.mark.parametrize("shape,r", [
    ((2, 64, 64), 16),    # S=2 strips
    ((1, 96, 64), 16),    # S=3, rectangular
    ((1, 128, 96), 32),   # S=2, wider strip
])
def test_strip_eval_matches_packed(rng, shape, r):
    n, h, w = shape
    state, bundle, g_params, packed = _setup((h, w))
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32))
    ref = np.asarray(jax.jit(make_packed_eval(bundle, packed))(g_params, x))
    got = np.asarray(jax.jit(make_strip_eval(bundle, packed, r))(g_params, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_strip_eval_matches_packed_bf16(rng):
    """bf16 (the production dtype): identical op sequence -> tight agreement."""
    state, bundle, g_params, packed = _setup((64, 64), "bfloat16")
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(jax.jit(make_packed_eval(bundle, packed))(g_params, x), np.float32)
    got = np.asarray(jax.jit(make_strip_eval(bundle, packed, 16))(g_params, x), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2)


def test_pick_strip_rows():
    assert pick_strip_rows(512) == 0          # below the blocking threshold
    assert pick_strip_rows(1024) == 128       # 2048px image
    assert pick_strip_rows(2048) == 128       # 4096px image
    assert pick_strip_rows(1152) != 0         # non-multiple falls back to a divisor
    assert 1152 % pick_strip_rows(1152) == 0
    assert pick_strip_rows(1024, n=1) == 128  # 8 slabs
    assert pick_strip_rows(1024, n=1, target=256) == 128  # halved for slab count


def test_fast_eval_routes_to_strips(rng):
    """make_fast_eval picks the strip path when strip_rows forces it, and the
    result still matches the direct packed forward."""
    from uegan_tpu.infer.packed import make_fast_eval

    cfg = Config(compute_dtype="float32", strip_rows=16)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64), 1)
    g_params = jax.device_get(state.g_params)
    packed = pack_generator_params(g_params, bundle.g_model.conv_dim)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(jax.jit(make_packed_eval(bundle, packed))(g_params, x))
    got = np.asarray(jax.jit(make_fast_eval(bundle, state.g_params))(
        g_params, state.g_extra, x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
