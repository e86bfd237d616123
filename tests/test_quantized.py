"""int8 quantized packed inference (infer/quantized.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.config import Config
from uegan_tpu.train.state import create_train_state


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return 10.0 * np.log10(4.0 / max(mse, 1e-12))  # range [-1,1] -> peak 2


def test_quantize_weights_roundtrip():
    from uegan_tpu.infer.quantized import quantize_weights

    rng = np.random.default_rng(0)
    w = rng.standard_normal((3, 3, 8, 16)).astype(np.float32)
    in_sc = rng.uniform(0.5, 2.0, 8).astype(np.float32)
    wq, s_out = quantize_weights(w, in_sc)
    assert wq.dtype == np.int8 and s_out.shape == (16,)
    # dequantized effective kernel ~= w * in_sc (per-cout 1/254 relative grid)
    w_eff = w * in_sc[None, None, :, None]
    back = wq.astype(np.float64) * s_out
    np.testing.assert_allclose(back, w_eff, atol=float(np.abs(w_eff).max()) / 120)


def test_int8_conv_matches_float_conv():
    """conv(x_q, w_q) * s_out ~= conv(x, w) — the scale-folding identity."""
    from uegan_tpu.infer.quantized import quantize_act, quantize_weights

    rng = np.random.default_rng(1)
    x = rng.uniform(-3, 3, (2, 8, 8, 8)).astype(np.float32)
    w = rng.standard_normal((1, 1, 8, 16)).astype(np.float32)
    s_x = 3.0 / 127.0
    wq, s_out = quantize_weights(w, s_x)
    xq = quantize_act(jnp.asarray(x), s_x)
    yq = jax.lax.conv_general_dilated(
        xq, jnp.asarray(wq), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    got = np.asarray(yq, np.float64) * s_out
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    err = np.abs(got - np.asarray(want))
    assert float(err.max()) < 0.15 * float(np.abs(np.asarray(want)).max()) + 0.05


@pytest.mark.slow
def test_pallas_path_matches_xla_int8_path():
    """The int8_pallas forward equals the plain int8 forward (same math —
    VMEM-fused epilogue + reflect strips vs the XLA chain) to f32/bf16
    rounding, at a pallas-eligible size (W/2 lane-aligned)."""
    from uegan_tpu.infer.quantized import make_int8_eval

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (256, 256), 1)
    g_params = jax.device_get(state.g_params)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)).astype(np.float32))

    base = jax.jit(make_int8_eval(bundle, g_params, calib_batch=np.asarray(x)))(
        None, None, x)
    pal = jax.jit(make_int8_eval(bundle, g_params, calib_batch=np.asarray(x),
                                 use_pallas=True))(None, None, x)
    assert pal.shape == base.shape
    # int32 conv arithmetic identical; epilogue f32 orderings may differ by
    # 1 lsb which can flip a requantized int8 by 1 → bounded bf16 output diff
    d = np.abs(np.asarray(pal, np.float32) - np.asarray(base, np.float32))
    assert float(d.max()) <= 0.02, f"max diff {d.max()}"


def test_config_routes_to_int8():
    """make_fast_eval honors Config.quantized_inference='int8'."""
    from uegan_tpu.infer.packed import make_fast_eval

    cfg = Config(compute_dtype="bfloat16", quantized_inference="int8")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 1)
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    # calib_batch plumbs through to the int8 calibration (tester passes its
    # first real batch)
    fn = make_fast_eval(bundle, state.g_params, calib_batch=np.asarray(x))
    y = jax.jit(fn)(state.g_params, state.g_extra, x)
    assert y.shape == x.shape

    with pytest.raises(ValueError, match="quantized_inference"):
        Config(quantized_inference="fp8").validate()


def test_int8_rectangular_input():
    """The int8 path is shape-agnostic (rectangular, /16 sizes)."""
    from uegan_tpu.infer.quantized import make_int8_eval

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 96), 1)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 96, 3)).astype(np.float32))
    fn = make_int8_eval(bundle, state.g_params, calib_batch=np.asarray(x))
    y = jax.jit(fn)(None, None, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y.astype(jnp.float32)).all())


def test_calibration_forward_matches_packed_eval():
    """The instrumented calibration forward (_forward_bf16_taps) must track
    make_packed_eval's graph: the packed topology exists in more than one
    place, and a fusion added to one but not the other silently mis-ranges
    the int8 activation scales.  Bit-level agreement of the outputs pins the
    two graphs together (both bf16, same helpers -> tight tolerance)."""
    from uegan_tpu.infer.packed import make_packed_eval, pack_generator_params
    from uegan_tpu.infer.quantized import _forward_bf16_taps

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64), 1)
    g_params = jax.device_get(state.g_params)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    )
    packed = pack_generator_params(g_params, bundle.g_model.conv_dim)
    ref = np.asarray(jax.jit(make_packed_eval(bundle, packed))(g_params, x), np.float32)
    got, maxes = jax.jit(lambda xx: _forward_bf16_taps(bundle, packed, g_params, xx))(x)
    np.testing.assert_allclose(np.asarray(got, np.float32), ref, atol=2e-2)
    # every quantization point must have been tapped with a sane range
    assert set(maxes) == {"x1p", "ga1p", "up4", "mod", "h5"}
    assert all(float(v) > 0 for v in maxes.values())


def _renorm(t):
    """Unit fan-in gain on every conv kernel (trained-magnitude network)."""
    for k, v in t.items():
        if isinstance(v, dict):
            _renorm(v)
        elif k == "kernel" and np.ndim(v) == 4:
            gain = float(np.std(v)) * np.sqrt(float(np.prod(v.shape[:3])))
            t[k] = v * (1.0 / max(gain, 1e-8))


def test_int8_deep_head_matches_sequential_chain(monkeypatch):
    """The stride-2 deep composed dec5 head (interior one-conv form) agrees
    with the sequential int8 dec5_0->dec5_1 chain.

    Both are int8 approximations of the same fp function; the interior is
    quantized ONCE through the composed kernel (vs twice through the h5
    intermediate), so the paths differ by bounded quantization error, not
    bitness.  Uses unit-gain weights so activations are O(1) (see
    test_int8_packed_forward_close_to_bf16)."""
    import uegan_tpu.infer.quantized as qz

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64), 1)
    g_params = jax.device_get(state.g_params)
    _renorm(g_params)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))

    monkeypatch.setattr(qz, "_INT8_DEEP_HEAD", True)
    deep = np.asarray(
        jax.jit(qz.make_int8_eval(bundle, g_params, calib_batch=np.asarray(x)))(
            None, None, x
        ),
        np.float32,
    )
    monkeypatch.setattr(qz, "_INT8_DEEP_HEAD", False)
    seq = np.asarray(
        jax.jit(qz.make_int8_eval(bundle, g_params, calib_batch=np.asarray(x)))(
            None, None, x
        ),
        np.float32,
    )
    assert deep.shape == seq.shape == x.shape
    assert np.isfinite(deep).all()
    # same int8 scheme either side of the composition: differences are a few
    # dequant lsb (scale sc["h5"]/sc["mod"]-sized), bounded well below any
    # visible change; the border band is the SAME sequential chain bit-for-bit
    assert _psnr(deep, seq) >= 35.0
    assert float(np.abs(deep - seq).max()) <= 0.08
    # border band (2 packed rows = 4 original rows) comes from the sequential
    # chain in both builds — same int8 accumulators, but the slab convs lower
    # differently than the full-image convs, so the bf16 epilogue can round
    # 1 ulp apart (measured max 0.0039 = 1 ulp at |x|~0.9)
    np.testing.assert_allclose(deep[:, :4], seq[:, :4], atol=0.008)
    np.testing.assert_allclose(deep[:, :, -4:], seq[:, :, -4:], atol=0.008)


def test_int8_strips_close_to_bf16_strips():
    """The int8 STRIP executor (high-res ladder path, VERDICT r3 #3) agrees
    with the bf16 strip executor to >= 30 dB on a unit-gain network, and its
    chunked exit path agrees with the unchunked int8 strips."""
    from uegan_tpu.infer.packed import pack_generator_params
    from uegan_tpu.infer.quantized import build_quant_tables
    from uegan_tpu.infer.strips import make_int8_strip_eval, make_strip_eval

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (128, 128), 1)
    g_params = jax.device_get(state.g_params)
    _renorm(g_params)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32))

    packed = pack_generator_params(g_params, bundle.g_model.conv_dim)
    ref = jax.jit(make_strip_eval(bundle, packed, 16))(g_params, x)
    assert float(np.abs(np.asarray(ref, np.float32) - np.asarray(x)).max()) > 0.05, (
        "residual too small — the comparison would be vacuous"
    )

    tabs = build_quant_tables(bundle, g_params, np.asarray(x))
    got = jax.jit(make_int8_strip_eval(bundle, tabs, 16))(g_params, None, x)
    assert got.shape == ref.shape
    psnr = _psnr(got, ref)
    assert psnr >= 30.0, f"int8-strips-vs-bf16-strips PSNR {psnr:.2f} dB"
    assert not np.array_equal(np.asarray(got), np.asarray(ref))

    # the full-image int8 forward is the same quantization scheme — the two
    # int8 paths must agree to the documented strip-vs-direct rounding class
    from uegan_tpu.infer.quantized import make_int8_eval

    full = jax.jit(make_int8_eval(bundle, g_params, tables=tabs))(None, None, x)
    assert _psnr(got, full) >= 35.0

    # chunked exit (lax.map) — same int8 math, chunk-invariant moments
    got_c = jax.jit(make_int8_strip_eval(bundle, tabs, 16, chunk_strips=2))(
        g_params, None, x)
    np.testing.assert_allclose(
        np.asarray(got_c, np.float32), np.asarray(got, np.float32), atol=0.02)

    # entry_int8=True (full-int8 entry chain) stays a measurable lever — it
    # lost to the bf16-entry hybrid on-chip (17.75 vs 19.76 at 2048 B=4)
    # but its numerics contract must hold for re-measurement
    tabs_e = dict(tabs, entry_int8=True)
    got_e = jax.jit(make_int8_strip_eval(bundle, tabs_e, 16))(g_params, None, x)
    assert _psnr(got_e, ref) >= 30.0
    assert not np.array_equal(np.asarray(got_e), np.asarray(got))


@pytest.mark.slow
def test_int8_packed_forward_close_to_bf16():
    """End-to-end: the int8 packed forward agrees with the bf16 packed
    forward to >= 30 dB PSNR (documented opt-in quantization error).

    At random init (0.02-std kernels decaying through ~10 layers) the
    generator's tanh residual is ~1e-8 — far below one bf16 output ulp, so
    int8-vs-bf16 would compare bit-identical tensors and test nothing.
    Renormalizing every conv kernel to unit fan-in gain makes activations
    stay O(1) through the network (trained-model-like; measured residual
    mean ~0.16), so the comparison exercises every quantized layer's error
    propagation.  Measured: 45.5 dB.
    """
    from uegan_tpu.infer.packed import make_packed_eval, pack_generator_params
    from uegan_tpu.infer.quantized import make_int8_eval

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64), 1)
    g_params = jax.device_get(state.g_params)

    def renorm(t):
        for k, v in t.items():
            if isinstance(v, dict):
                renorm(v)
            elif k == "kernel" and np.ndim(v) == 4:
                gain = float(np.std(v)) * np.sqrt(float(np.prod(v.shape[:3])))
                t[k] = v * (1.0 / max(gain, 1e-8))

    renorm(g_params)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))

    packed = pack_generator_params(g_params, bundle.g_model.conv_dim)
    ref = jax.jit(make_packed_eval(bundle, packed))(g_params, x)
    assert float(np.abs(np.asarray(ref, np.float32) - np.asarray(x)).max()) > 0.05, (
        "residual too small — the comparison would be vacuous"
    )
    fn = make_int8_eval(bundle, g_params, calib_batch=np.asarray(x))
    got = jax.jit(fn)(None, None, x)
    assert got.shape == ref.shape
    psnr = _psnr(got, ref)
    assert psnr >= 30.0, f"int8-vs-bf16 PSNR {psnr:.2f} dB"
    assert not np.array_equal(np.asarray(got), np.asarray(ref))


def test_int8_u8_out_bitwise():
    """make_int8_eval(u8_out=True) == device_quantize_u8(int8 float output)
    bit-for-bit (the quantize commutes with the final depth_to_space)."""
    import jax
    import jax.numpy as jnp

    from uegan_tpu.config import Config
    from uegan_tpu.infer.quantized import make_int8_eval
    from uegan_tpu.train.state import create_train_state
    from uegan_tpu.utils.image_io import device_quantize_u8

    cfg = Config(compute_dtype="float32")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64), 1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    want = np.asarray(jax.jit(device_quantize_u8)(
        jax.jit(make_int8_eval(bundle, state.g_params))(
            state.g_params, state.g_extra, x)))
    got = np.asarray(jax.jit(make_int8_eval(
        bundle, state.g_params, u8_out=True))(
            state.g_params, state.g_extra, x))
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_int8_strips_entry_chunked_matches():
    """The int8 (hybrid) strip executor with entry_chunked=True — the
    beyond-8192px memory mode — is bit-equal to its entry-resident chunked
    form (the entry recompute is the same bf16 ops on the same inputs)."""
    import jax
    import jax.numpy as jnp

    from uegan_tpu.config import Config
    from uegan_tpu.infer.quantized import build_quant_tables
    from uegan_tpu.infer.strips import make_int8_strip_eval
    from uegan_tpu.train.state import create_train_state

    cfg = Config(compute_dtype="bfloat16")
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (128, 128), 1)
    g_params = jax.device_get(state.g_params)
    _renorm(g_params)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
    tabs = build_quant_tables(bundle, g_params, np.asarray(x))
    res = np.asarray(jax.jit(make_int8_strip_eval(
        bundle, tabs, 16, chunk_strips=2))(g_params, None, x), np.float32)
    ecv = np.asarray(jax.jit(make_int8_strip_eval(
        bundle, tabs, 16, chunk_strips=2, entry_chunked=True))(
            g_params, None, x), np.float32)
    np.testing.assert_array_equal(ecv, res)


def test_int8_pallas_high_res_falls_back_to_strips():
    """ADVICE r4: with quantized_inference='int8_pallas' a strip-eligible
    input must route to the (non-pallas) int8 STRIP executor rather than the
    full-image pallas path — the shape class strips exist to keep out of
    RESOURCE_EXHAUSTED territory.  Verified by equality with the int8 strip
    executor built directly from the same tables."""
    from uegan_tpu.infer.packed import make_fast_eval
    from uegan_tpu.infer.quantized import build_quant_tables
    from uegan_tpu.infer.strips import make_int8_strip_eval

    # strip_rows=16 satisfies the routing gate at hp=64 (hp%r==0, hp>=2r,
    # r even, r>2*_M_EXIT)
    cfg = Config(compute_dtype="bfloat16", quantized_inference="int8_pallas",
                 strip_rows=16)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (128, 64), 1)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 64, 3)).astype(np.float32))
    routed = make_fast_eval(bundle, state.g_params, calib_batch=np.asarray(x))
    got = np.asarray(routed(state.g_params, state.g_extra, x), np.float32)

    tabs = build_quant_tables(bundle, state.g_params, calib_batch=np.asarray(x))
    ref = np.asarray(jax.jit(make_int8_strip_eval(bundle, tabs, 16))(
        state.g_params, None, x), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2)
