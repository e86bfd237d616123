"""Equivalence tests for the space-to-depth packed inference path."""

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.infer.packed import (
    depth_to_space,
    make_packed_eval,
    pack_generator_params,
    pack_kernel_1x1,
    pack_kernel_s1,
    pack_kernel_s2,
    packed_conv,
    packed_gam_stats,
    packed_instance_norm,
    packed_reflect_pad,
    packed_resize2x_align_corners,
    space_to_depth,
)
from uegan_tpu.ops.norms import feature_mean_std, instance_norm
from uegan_tpu.ops.padding import reflect_pad_2d
from uegan_tpu.ops.resize import upsample2x_align_corners


@pytest.fixture(autouse=True)
def _force_fused_pad(monkeypatch):
    # production gates the fused pad fix-up on batch >= 4; these equivalence
    # tests use tiny batches — force the fused path so it stays covered
    import uegan_tpu.ops.conv as conv_mod

    monkeypatch.setattr(conv_mod, "FUSED_PAD_MIN_BATCH", 0)


def _conv(x, k, stride=1):
    return lax.conv_general_dilated(
        x, k, (stride, stride), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )


def test_s2d_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))


def test_packed_reflect_pad_matches_original(rng):
    x = jnp.asarray(rng.standard_normal((1, 16, 12, 3)).astype(np.float32))
    for pad in (1, 2):
        ref = space_to_depth(reflect_pad_2d(x, 2 * pad))
        got = packed_reflect_pad(space_to_depth(x), pad, 3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=0)


@pytest.mark.parametrize("k,pad", [(3, 1), (7, 3), (5, 2)])
def test_packed_conv_s1_matches_original(rng, k, pad):
    cin, cout = 4, 6
    x = jnp.asarray(rng.standard_normal((2, 16, 16, cin)).astype(np.float32))
    kern = rng.standard_normal((k, k, cin, cout)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    ref = _conv(reflect_pad_2d(x, pad), jnp.asarray(kern)) + bias
    kp, s0 = pack_kernel_s1(kern, pad)
    got = depth_to_space(packed_conv(
        space_to_depth(x), jnp.asarray(kp), s0, cin, jnp.asarray(bias), jnp.float32
    ))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_packed_conv_s2_matches_original(rng):
    cin, cout = 4, 6
    x = jnp.asarray(rng.standard_normal((2, 16, 16, cin)).astype(np.float32))
    kern = rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
    ref = _conv(reflect_pad_2d(x, 1), jnp.asarray(kern), stride=2)
    kp, s0 = pack_kernel_s2(kern, 1)
    got = packed_conv(space_to_depth(x), jnp.asarray(kp), s0, cin, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_packed_1x1_block_diag(rng):
    cin, cout = 4, 3
    x = jnp.asarray(rng.standard_normal((1, 8, 8, cin)).astype(np.float32))
    kern = rng.standard_normal((1, 1, cin, cout)).astype(np.float32)
    ref = _conv(x, jnp.asarray(kern))
    got = depth_to_space(_conv(space_to_depth(x), jnp.asarray(pack_kernel_1x1(kern))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_packed_resize2x_matches_original(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 6, 5)).astype(np.float32))
    ref = space_to_depth(upsample2x_align_corners(x))
    got = packed_resize2x_align_corners(x, (16, 12))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_resize_conv_einsums_match_unfused(rng):
    """packed_resize2x_conv1x1 / resize2x_conv1x1 == resize-then-conv (f32).

    The packed variant IS the inference up4 path (470 -> 516 img/s); the
    unpacked variant is kept as a measured-slower record (packed.py note).
    """
    import jax.lax as lax

    from uegan_tpu.infer.packed import (
        pack_kernel_1x1,
        packed_resize2x_conv1x1,
        resize2x_conv1x1,
    )

    x = jnp.asarray(rng.standard_normal((2, 8, 6, 10)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((1, 1, 10, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(4).astype(np.float32))

    r = upsample2x_align_corners(x)
    ref = lax.conv_general_dilated(
        r, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    got = resize2x_conv1x1(x, k, b, (16, 12))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)

    ref_p = space_to_depth(ref)
    got_p = packed_resize2x_conv1x1(x, k, b, (16, 12))
    np.testing.assert_allclose(np.asarray(got_p), np.asarray(ref_p), rtol=1e-5, atol=1e-5)


def test_gam_norm_eval_matches_canonical_gam(rng):
    """IN(conv1x1(x, W_x)) == full GAM-with-norm: the SE branch and fuse
    bias are spatially constant, so the non-affine instance norm removes
    them exactly (the inference fast paths drop the dead branch)."""
    from uegan_tpu.infer.packed import gam_norm_eval
    from uegan_tpu.models.blocks import GAM

    c = 16
    x = jnp.asarray(rng.standard_normal((2, 8, 8, c)).astype(np.float32))
    mod = GAM(out_nc=c, reduction=8, use_bias=False, use_sn=False, norm=True)
    params = mod.init(jax.random.PRNGKey(3), x)["params"]
    # amplify the fuse bias + SE weights so the dropped constants are LARGE
    # relative to the conv output — any cancellation failure would show
    params = jax.tree.map(lambda a: a * 3.0, params)
    ref = mod.apply({"params": params}, x, update_sn=False)
    got = gam_norm_eval(x, params, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_packed_gam_stats_and_instance_norm(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)).astype(np.float32))
    m_ref, s_ref = feature_mean_std(x)
    m, s = packed_gam_stats(space_to_depth(x), 4)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref)[:, 0, 0, :], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref)[:, 0, 0, :], rtol=1e-4, atol=1e-5)
    ref = space_to_depth(instance_norm(x))
    got = packed_instance_norm(space_to_depth(x), 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_packed_generator_matches_canonical(rng):
    """Full packed forward == canonical Generator forward (f32, CPU)."""
    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step

    cfg = Config(g_conv_dim=8, d_conv_dim=8, compute_dtype="float32", init_type="kaiming")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(7), (32, 32), 1)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    ref = make_eval_step(bundle)(state.g_params, state.g_extra, x)
    packed = pack_generator_params(jax.device_get(state.g_params), cfg.g_conv_dim)
    fn = jax.jit(make_packed_eval(bundle, packed))
    got = fn(state.g_params, x)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


def test_pack_kernel_s2_packed_matches_original(rng):
    """stride-2 conv: s2d(x) -> s2d(out) equivalence (the level-2 transform)."""
    from uegan_tpu.infer.packed import pack_kernel_s2_packed, packed_conv_s2

    cin, cout = 4, 6
    x = jnp.asarray(rng.standard_normal((2, 16, 16, cin)).astype(np.float32))
    kern = rng.standard_normal((3, 3, cin, cout)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    ref = space_to_depth(_conv(reflect_pad_2d(x, 1), jnp.asarray(kern), stride=2) + bias)
    kp, s0 = pack_kernel_s2_packed(kern, 1)
    got = packed_conv_s2(space_to_depth(x), jnp.asarray(kp), s0, cin,
                         jnp.asarray(bias), jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_packed_generator_rectangular_input(rng):
    """Non-square input through the packed path (H/W mix-up guard)."""
    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step

    cfg = Config(g_conv_dim=8, d_conv_dim=8, compute_dtype="float32", init_type="kaiming")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(9), (32, 48), 1)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 48, 3)).astype(np.float32))
    ref = make_eval_step(bundle)(state.g_params, state.g_extra, x)
    packed = pack_generator_params(jax.device_get(state.g_params), cfg.g_conv_dim)
    got = jax.jit(make_packed_eval(bundle, packed))(state.g_params, x)
    assert got.shape == x.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# differentiable (traced) kernel packing — packed TRAINING execution
# ---------------------------------------------------------------------------
def test_traced_packers_match_numpy(rng):
    from uegan_tpu.infer.packed import (
        interleave_input_channels,
        interleave_input_channels_traced,
        pack_kernel_1x1_traced,
        pack_kernel_s1_traced,
        pack_kernel_s2_traced,
    )

    for k, pad in [(3, 1), (7, 3), (5, 2)]:
        kern = rng.standard_normal((k, k, 4, 6)).astype(np.float32)
        want, _ = pack_kernel_s1(kern, pad)
        got = pack_kernel_s1_traced(jnp.asarray(kern), pad)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)
        want2, _ = pack_kernel_s2(kern, pad)
        got2 = pack_kernel_s2_traced(jnp.asarray(kern), pad)
        np.testing.assert_allclose(np.asarray(got2), want2, rtol=1e-6, atol=1e-6)

    k1 = rng.standard_normal((1, 1, 5, 7)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(pack_kernel_1x1_traced(jnp.asarray(k1))), pack_kernel_1x1(k1), atol=0
    )

    pk = rng.standard_normal((3, 3, 4 * 9, 8)).astype(np.float32)
    want3 = interleave_input_channels(pk, [4, 5])
    got3 = interleave_input_channels_traced(jnp.asarray(pk), [4, 5])
    np.testing.assert_allclose(np.asarray(got3), want3, atol=0)


def test_packed_train_forward_matches_canonical(rng):
    """make_packed_eval(bundle, None) == canonical G forward + grads agree."""
    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step

    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 1)
    packed_fn = make_packed_eval(bundle, None)
    canon = make_eval_step(bundle)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))

    got = jax.jit(packed_fn)(state.g_params, x)
    want = jax.jit(canon)(state.g_params, state.g_extra, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    # gradients w.r.t. the CANONICAL params through the packing
    def loss_p(params):
        return jnp.mean(jnp.square(packed_fn(params, x)))

    def loss_c(params):
        return jnp.mean(jnp.square(canon(params, state.g_extra, x)))

    gp = jax.jit(jax.grad(loss_p))(state.g_params)
    gc = jax.jit(jax.grad(loss_c))(state.g_params)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_c = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gc)}
    for key, v in flat_p:
        ks = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_c[ks]), rtol=5e-4, atol=1e-5, err_msg=ks
        )


def test_packed_train_l2_interior_matches_canonical(rng):
    """make_packed_eval(bundle, None, l2_interior=True) — the measured
    packed-interior train lever (second s2d level on enc3/ga2/up3/dec3) —
    equals the canonical forward, and canonical-param grads agree."""
    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step

    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 1)
    packed_fn = make_packed_eval(bundle, None, l2_interior=True)
    canon = make_eval_step(bundle)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))

    got = jax.jit(packed_fn)(state.g_params, x)
    want = jax.jit(canon)(state.g_params, state.g_extra, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)

    def loss_p(params):
        return jnp.mean(jnp.square(packed_fn(params, x)))

    def loss_c(params):
        return jnp.mean(jnp.square(canon(params, state.g_extra, x)))

    gp = jax.jit(jax.grad(loss_p))(state.g_params)
    gc = jax.jit(jax.grad(loss_c))(state.g_params)
    flat_p = jax.tree_util.tree_leaves_with_path(gp)
    flat_c = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(gc)}
    for key, v in flat_p:
        ks = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(flat_c[ks]), rtol=5e-4, atol=1e-5, err_msg=ks
        )


def test_packed_train_step_matches_canonical(rng):
    """Full train step with packed_train=True stays close to canonical."""
    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_train_step

    raw = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    exp = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))

    outs = {}
    for packed in (False, True):
        cfg = Config(
            compute_dtype="float32", g_conv_dim=8, d_conv_dim=8, pool_size=4,
            packed_train=packed,
        )
        state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 10)
        s1, metrics, _ = jax.jit(make_train_step(bundle))(state, raw, exp)
        outs[packed] = (s1, metrics)

    m0, m1 = outs[False][1], outs[True][1]
    for k in m0:
        np.testing.assert_allclose(float(m1[k]), float(m0[k]), rtol=1e-4, atol=1e-5, err_msg=k)
    for a, b in zip(
        jax.tree_util.tree_leaves(outs[False][0].g_params),
        jax.tree_util.tree_leaves(outs[True][0].g_params),
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-5)


def test_packed_generator_fallback_pad_path(rng, monkeypatch):
    """Generator-level equivalence with the production batch gate in place:
    small batches route packed_conv through the materialized packed_reflect_pad
    fallback, which must stay equivalent too."""
    import uegan_tpu.ops.conv as conv_mod
    from uegan_tpu.config import Config
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.train.step import make_eval_step

    monkeypatch.setattr(conv_mod, "FUSED_PAD_MIN_BATCH", 4)
    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 1)
    packed_fn = make_packed_eval(bundle, pack_generator_params(state.g_params, cfg.g_conv_dim))
    canon = make_eval_step(bundle)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    got = jax.jit(lambda p, xx: packed_fn(p, xx))(state.g_params, x)
    want = jax.jit(canon)(state.g_params, state.g_extra, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_composed_dec5_head_matches_sequential(rng):
    """packed_dec5_head (composed 9x9 interior + sequential border strips)
    == the sequential dec5_0/dec5_1 chain, at UNIT-scale kernels (the
    composition reorders f32 summation, so tolerance not bitwise)."""
    from uegan_tpu.infer.packed import (
        _tap_ranges,
        compose_dec5_kernels,
        packed_dec5_head,
    )

    cd = 8
    k0 = rng.standard_normal((3, 3, cd, cd)).astype(np.float32) * 0.5
    b0 = rng.standard_normal((cd,)).astype(np.float32)
    k1 = rng.standard_normal((7, 7, cd, 3)).astype(np.float32) * 0.5
    b1 = rng.standard_normal((3,)).astype(np.float32)
    pk0, s0_0 = pack_kernel_s1(k0, 1)
    pk1, s0_1 = pack_kernel_s1(k1, 3)
    k9, b9 = compose_dec5_kernels(k0, b0, k1, b1)
    pk9, s0_9 = pack_kernel_s1(k9, 4)

    for hw in (32, 24):  # packed 16/12 rows: strip path; both > slab+fix
        z = jnp.asarray(rng.standard_normal((2, hw // 2, hw // 2, 4 * cd)).astype(np.float32))
        h = packed_conv(z, jnp.asarray(pk0), s0_0, cd, jnp.asarray(b0), jnp.float32)
        want = packed_conv(h, jnp.asarray(pk1), s0_1, cd, jnp.asarray(b1), jnp.float32)
        got = packed_dec5_head(
            z, jnp.asarray(pk9), s0_9, jnp.asarray(b9),
            jnp.asarray(pk0), s0_0, jnp.asarray(b0),
            jnp.asarray(pk1), s0_1, jnp.asarray(b1), cd, jnp.float32,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_composed_dec5_kernel_algebra(rng):
    """compose_dec5_kernels: conv9(x) == conv7(conv3(x)) on zero-padded
    inputs (pure kernel algebra, no reflect semantics)."""
    from uegan_tpu.infer.packed import compose_dec5_kernels

    cd = 4
    k0 = rng.standard_normal((3, 3, cd, cd)).astype(np.float32)
    b0 = rng.standard_normal((cd,)).astype(np.float32)
    k1 = rng.standard_normal((7, 7, cd, 3)).astype(np.float32)
    b1 = rng.standard_normal((3,)).astype(np.float32)
    k9, b9 = compose_dec5_kernels(k0, b0, k1, b1)
    assert k9.shape == (9, 9, cd, 3)

    x = jnp.asarray(rng.standard_normal((1, 20, 20, cd)).astype(np.float32))
    h = _conv(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))), jnp.asarray(k0)) + b0
    want = _conv(jnp.pad(h, ((0, 0), (3, 3), (3, 3), (0, 0))), jnp.asarray(k1)) + b1
    got = _conv(jnp.pad(x, ((0, 0), (4, 4), (4, 4), (0, 0))), jnp.asarray(k9)) + b9
    # borders of the zero-padded composed conv DIFFER (h's zero pad is not
    # conv3(zero pad)); the interior must agree
    np.testing.assert_allclose(
        np.asarray(got)[:, 4:-4, 4:-4], np.asarray(want)[:, 4:-4, 4:-4],
        rtol=2e-4, atol=2e-4,
    )


@pytest.mark.parametrize("c4", [12, 48])
def test_depth_to_space_convT_bitwise(rng, c4):
    """depth_to_space's transposed-conv lowering == the reshape form
    bit-for-bit (f32 and bf16) at both channel counts in use (12 = the
    output tail, 48 = the stride-2 deep dec5 head), and uint8 routes to
    the reshape form unchanged."""
    from uegan_tpu.infer.packed import _depth_to_space_reshape, depth_to_space

    x = jnp.asarray(rng.uniform(-1, 1, (2, 6, 4, c4)).astype(np.float32))
    for xt in (x, x.astype(jnp.bfloat16)):
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(xt)),
            np.asarray(_depth_to_space_reshape(xt)))
    xu = jnp.asarray(
        np.random.default_rng(0).integers(0, 256, (2, 6, 4, c4), np.uint8))
    got = depth_to_space(xu)
    assert got.dtype == jnp.uint8
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(_depth_to_space_reshape(xu)))
