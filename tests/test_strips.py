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
    ((1, 112, 64), 14),   # S=4, non-multiple-of-16 divisor (pick_strip_rows
                          # now returns any even divisor of hp)
])
def test_strip_eval_matches_packed(rng, shape, r):
    n, h, w = shape
    state, bundle, g_params, packed = _setup((h, w))
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32))
    ref = np.asarray(jax.jit(make_packed_eval(bundle, packed))(g_params, x))
    got = np.asarray(jax.jit(make_strip_eval(bundle, packed, r))(g_params, x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,r", [
    ((1, 128, 64), 16),   # S=4
    ((2, 64, 64), 16),    # S=2: single interior boundary, both borders
])
def test_strip_border_rows_exact_scaled(rng, shape, r):
    """Image-border rows must be exact even with amplified weights.

    Init-scale weights attenuate the border-halo geometry error below the
    default tolerances (measured ~4e-9), so the plain exactness tests cannot
    catch the bug class where the slabs' mirror-extended halos are not
    re-reflected per layer (conv does not commute with mirror extension —
    ADVICE r1).  Scaling the params up makes the error O(1e-2) at the top /
    bottom output rows if the refix is missing.
    """
    n, h, w = shape
    state, bundle, g_params, _ = _setup((h, w))
    gs = jax.tree.map(lambda a: a * 8.0, g_params)
    packed = pack_generator_params(jax.device_get(gs), bundle.g_model.conv_dim)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32))
    ref = np.asarray(jax.jit(make_packed_eval(bundle, packed))(gs, x))
    got = np.asarray(jax.jit(make_strip_eval(bundle, packed, r))(gs, x))
    # without the refixes the border rows deviate ~4.5e-4 at this scale
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # chunked exit path sees the same refixes
    ch = np.asarray(jax.jit(make_strip_eval(bundle, packed, r, 2))(gs, x))
    np.testing.assert_allclose(ch, ref, rtol=1e-5, atol=1e-5)


def test_strip_eval_matches_packed_bf16(rng):
    """bf16 (the production dtype): identical op sequence -> tight agreement."""
    state, bundle, g_params, packed = _setup((64, 64), "bfloat16")
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    ref = np.asarray(jax.jit(make_packed_eval(bundle, packed))(g_params, x), np.float32)
    got = np.asarray(jax.jit(make_strip_eval(bundle, packed, 16))(g_params, x), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2)


@pytest.mark.parametrize("shape,r,cs", [
    ((1, 128, 96), 16, 2),   # S=4 -> 2 chunks
    ((2, 128, 64), 16, 2),   # batched, N-major slab order across chunks
    ((1, 96, 64), 16, 1),    # S=3 -> 3 single-strip chunks
])
def test_chunked_strip_eval_matches_unchunked(rng, shape, r, cs):
    """Chunked exit execution (lax.map over strip chunks, precomputed GAM-IN
    moments) must be numerically the unchunked strip program — same per-strip
    partials, same reductions, same convs."""
    n, h, w = shape
    state, bundle, g_params, packed = _setup((h, w))
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, 3)).astype(np.float32))
    un = np.asarray(jax.jit(make_strip_eval(bundle, packed, r, -1))(g_params, x))
    ch = np.asarray(jax.jit(make_strip_eval(bundle, packed, r, cs))(g_params, x))
    np.testing.assert_allclose(ch, un, rtol=1e-6, atol=1e-6)
    ref = np.asarray(jax.jit(make_packed_eval(bundle, packed))(g_params, x))
    np.testing.assert_allclose(ch, ref, rtol=1e-5, atol=1e-5)


def test_chunked_strip_eval_bf16(rng):
    state, bundle, g_params, packed = _setup((128, 64), "bfloat16")
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 64, 3)).astype(np.float32))
    un = np.asarray(jax.jit(make_strip_eval(bundle, packed, 16, -1))(g_params, x),
                    np.float32)
    ch = np.asarray(jax.jit(make_strip_eval(bundle, packed, 16, 2))(g_params, x),
                    np.float32)
    np.testing.assert_allclose(ch, un, atol=1e-2)


def test_slab_unpack_matches(rng, monkeypatch):
    """The per-slab depth_to_space form (taken for >= _SLAB_UNPACK_MIN maps
    and always when chunked) must equal the full-height unpack."""
    import uegan_tpu.infer.strips as strips

    state, bundle, g_params, packed = _setup((128, 64))
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 64, 3)).astype(np.float32))
    full = np.asarray(jax.jit(make_strip_eval(bundle, packed, 16, -1))(g_params, x))
    monkeypatch.setattr(strips, "_SLAB_UNPACK_MIN", 8)
    slab = np.asarray(jax.jit(make_strip_eval(bundle, packed, 16, -1))(g_params, x))
    assert np.array_equal(slab, full)


def test_space_to_depth_rows_bitwise(rng):
    """The shipped transpose-free pack/unpack must be bitwise the canonical
    phase-major 6-d reshape-transpose-reshape definition."""
    from uegan_tpu.infer.packed import depth_to_space, space_to_depth

    def s2d_6d(t):
        n, h, w, c = t.shape
        y = t.reshape(n, h // 2, 2, w // 2, 2, c)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // 2, w // 2, 4 * c)

    for shape in [(2, 16, 12, 3), (1, 8, 8, 5), (3, 32, 20, 1)]:
        x = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
        p = np.asarray(s2d_6d(x))
        assert np.array_equal(np.asarray(space_to_depth(x)), p)
        assert np.array_equal(np.asarray(depth_to_space(jnp.asarray(p))),
                              np.asarray(x))


def test_pick_strip_chunks():
    from uegan_tpu.infer.strips import pick_strip_chunks

    # 2048px batch 4 (the official config-5 bench): fits unchunked, must
    # NOT regress to chunked execution
    assert pick_strip_chunks(4, 8, 140, 1024) == 8
    # 4096px batch 1 and 2: measured to fit unchunked (3.54 / 3.53 img/s)
    # and chunking costs ~6% -> must stay unchunked
    assert pick_strip_chunks(1, 16, 140, 2048) == 16
    assert pick_strip_chunks(2, 16, 140, 2048) == 16
    # 8192px batch 1: OOMs unchunked and at 16 strips/chunk; 8 measured to
    # fit (1.01 img/s)
    assert pick_strip_chunks(1, 32, 140, 4096) == 8


def test_pick_strip_rows():
    assert pick_strip_rows(512) == 0          # below the blocking threshold
    assert pick_strip_rows(1024) == 128       # 2048px image
    assert pick_strip_rows(2048) == 128       # 4096px image
    assert pick_strip_rows(1152) != 0         # non-multiple falls back to a divisor
    assert 1152 % pick_strip_rows(1152) == 0
    # arbitrary even divisors: real photo sizes that aren't multiples of 16
    assert pick_strip_rows(2000) == 100       # 4000x6000 DSLR (hp=2000)
    assert pick_strip_rows(1500) == 150       # 3000px image
    for hp in (1250, 1458, 2000, 1500):
        r = pick_strip_rows(hp)
        assert r == 0 or (hp % r == 0 and r % 2 == 0 and r > 12)
    # small batch halving never yields an odd strip height
    for hp in (1500, 2000):
        r = pick_strip_rows(hp, n=1)
        assert r == 0 or (hp % r == 0 and r % 2 == 0 and r > 12)
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


def test_strip_u8_out_bitwise(rng):
    """u8_out quantizes BEFORE the final depth_to_space/reassembly; being
    pointwise it commutes with the pure-movement unpack, so the result must
    be BIT-identical to quantizing the float strip output — for the
    unchunked, chunked, and fast-eval-routed forms."""
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.utils.image_io import device_quantize_u8

    state, bundle, g_params, packed = _setup((96, 64))
    x = jnp.asarray(rng.uniform(-1, 1, (1, 96, 64, 3)).astype(np.float32))
    want = np.asarray(jax.jit(device_quantize_u8)(
        jax.jit(make_strip_eval(bundle, packed, 16))(g_params, x)))
    got = np.asarray(jax.jit(
        make_strip_eval(bundle, packed, 16, u8_out=True))(g_params, x))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)
    got_ch = np.asarray(jax.jit(
        make_strip_eval(bundle, packed, 16, 2, u8_out=True))(g_params, x))
    np.testing.assert_array_equal(got_ch, want)

    cfg = Config(compute_dtype="float32", strip_rows=16)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (96, 64), 1)
    routed = np.asarray(jax.jit(make_fast_eval(
        bundle, state.g_params, u8_output=True))(g_params, state.g_extra, x))
    np.testing.assert_array_equal(routed, want)


def test_entry_chunked_matches_resident(rng):
    """entry_chunked recomputes enc1/enc2 per exit chunk (the beyond-8192px
    memory mode) — identical per-slab ops on identical inputs, so it must
    be BIT-equal to the entry-resident chunked path and match the unchunked
    reference to strip tolerance."""
    state, bundle, g_params, packed = _setup((96, 64))
    x = jnp.asarray(rng.uniform(-1, 1, (1, 96, 64, 3)).astype(np.float32))
    un = np.asarray(jax.jit(make_strip_eval(bundle, packed, 16, -1))(g_params, x))
    res = np.asarray(jax.jit(make_strip_eval(bundle, packed, 16, 2))(g_params, x))
    ecv = np.asarray(jax.jit(make_strip_eval(
        bundle, packed, 16, 2, entry_chunked=True))(g_params, x))
    np.testing.assert_array_equal(ecv, res)
    np.testing.assert_allclose(ecv, un, rtol=1e-5, atol=1e-5)
    # inert without a chunked exit (cs >= s): falls back to resident entry
    ecu = np.asarray(jax.jit(make_strip_eval(
        bundle, packed, 16, -1, entry_chunked=True))(g_params, x))
    np.testing.assert_array_equal(ecu, un)
