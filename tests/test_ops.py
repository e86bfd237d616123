"""Golden-value parity tests for the op layer, against torch (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from uegan_tpu.ops.padding import reflect_pad_2d, same_reflect_padding
from uegan_tpu.ops.resize import resize_bilinear_align_corners, upsample2x_align_corners
from uegan_tpu.ops.norms import feature_mean_std, instance_norm
from uegan_tpu.ops.pooling import avg_pool_2x2
from uegan_tpu.ops.spectral_norm import kernel_to_matrix, spectral_normalize
from uegan_tpu.ops.color import denorm


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


def test_same_reflect_padding():
    assert same_reflect_padding(7) == 3
    assert same_reflect_padding(5) == 2
    assert same_reflect_padding(3) == 1
    assert same_reflect_padding(1) == 0


def test_reflect_pad_matches_torch(rng):
    x = rng.standard_normal((2, 8, 9, 3)).astype(np.float32)
    for pad in (1, 2, 3):
        ours = reflect_pad_2d(jnp.asarray(x), pad)
        theirs = nhwc(torch.nn.ReflectionPad2d(pad)(nchw(x)))
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=0, atol=0)


@pytest.mark.parametrize("shape,out", [((2, 8, 8, 3), (16, 16)), ((1, 5, 7, 2), (10, 14)), ((1, 16, 16, 4), (32, 32))])
def test_upsample_align_corners_matches_torch(rng, shape, out):
    x = rng.standard_normal(shape).astype(np.float32)
    ours = resize_bilinear_align_corners(jnp.asarray(x), out[0], out[1], align_corners=True)
    theirs = nhwc(F.interpolate(nchw(x), size=out, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_resize_gather_path_matches_torch(rng):
    """Outputs > 1024 take the gather+lerp path — same torch parity."""
    x = rng.standard_normal((1, 8, 6, 2)).astype(np.float32)
    ours = resize_bilinear_align_corners(jnp.asarray(x), 1030, 12, align_corners=True)
    theirs = nhwc(F.interpolate(nchw(x), size=(1030, 12), mode="bilinear", align_corners=True))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_resize_half_pixel_matches_torch(rng):
    x = rng.standard_normal((1, 12, 10, 3)).astype(np.float32)
    ours = resize_bilinear_align_corners(jnp.asarray(x), 7, 5, align_corners=False)
    theirs = nhwc(F.interpolate(nchw(x), size=(7, 5), mode="bilinear", align_corners=False))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_upsample2x(rng):
    x = rng.standard_normal((2, 4, 4, 8)).astype(np.float32)
    ours = upsample2x_align_corners(jnp.asarray(x))
    theirs = nhwc(F.interpolate(nchw(x), scale_factor=2, mode="bilinear", align_corners=True))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-5, atol=1e-5)


def test_feature_mean_std_matches_torch_calc_mean_std(rng):
    # torch .var(dim=2) is unbiased — the GAM statistics contract
    x = rng.standard_normal((3, 6, 5, 4)).astype(np.float32)
    mean, std = feature_mean_std(jnp.asarray(x))
    t = nchw(x)
    n, c = t.shape[:2]
    tvar = t.reshape(n, c, -1).var(dim=2) + 1e-5
    tstd = tvar.sqrt().numpy()
    tmean = t.reshape(n, c, -1).mean(dim=2).numpy()
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, :], tmean, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std)[:, 0, 0, :], tstd, rtol=1e-5, atol=1e-6)


def test_instance_norm_matches_torch(rng):
    x = rng.standard_normal((2, 7, 6, 5)).astype(np.float32)
    ours = instance_norm(jnp.asarray(x))
    theirs = nhwc(torch.nn.InstanceNorm2d(5)(nchw(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-5)


def test_instance_norm_one_pass_conditioning(rng):
    """The one-pass E[x^2]-E[x]^2 variance must stay accurate at the worst
    mean/std ratio we consider reachable (|mean|/std ~ 3e2; see ops/norms.py).
    Guards against regressions that compute the moments in bf16."""
    x = (300.0 + rng.standard_normal((1, 32, 32, 4))).astype(np.float32)
    ours = np.asarray(instance_norm(jnp.asarray(x)))
    x64 = x.astype(np.float64)
    mean = x64.mean(axis=(1, 2), keepdims=True)
    var = x64.var(axis=(1, 2), keepdims=True)
    exact = (x64 - mean) / np.sqrt(var + 1e-5)
    # measured: ~3.5% scale error at this ratio in f32 (bf16 moments would
    # be O(1) wrong); pin the few-percent regime
    np.testing.assert_allclose(ours, exact, atol=0.2)
    assert abs(float(np.asarray(ours).std()) - 1.0) < 5e-2


def test_avg_pool_2x2_matches_torch(rng):
    x = rng.standard_normal((2, 8, 6, 3)).astype(np.float32)
    ours = avg_pool_2x2(jnp.asarray(x))
    theirs = nhwc(torch.nn.AvgPool2d(2, stride=2, count_include_pad=False)(nchw(x)))
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6, atol=1e-6)


def test_avg_pool_2x2_odd_input(rng):
    x = rng.standard_normal((1, 7, 9, 2)).astype(np.float32)
    ours = avg_pool_2x2(jnp.asarray(x))
    theirs = nhwc(torch.nn.AvgPool2d(2, stride=2, count_include_pad=False)(nchw(x)))
    assert ours.shape == (1, 3, 4, 2)
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6, atol=1e-6)


def test_spectral_normalize_matches_torch(rng):
    """One power iteration + normalization == torch.nn.utils.spectral_norm."""
    kh, kw, cin, cout = 3, 3, 4, 6
    w = rng.standard_normal((kh, kw, cin, cout)).astype(np.float32)
    u0 = rng.standard_normal((cout,)).astype(np.float32)
    u0 /= np.linalg.norm(u0) + 1e-12

    conv = torch.nn.Conv2d(cin, cout, 3, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
    conv = torch.nn.utils.spectral_norm(conv)
    with torch.no_grad():
        conv.weight_u.copy_(torch.from_numpy(u0))
        # torch initializes v randomly; one iteration recomputes v from u so
        # parity only needs matching u.
    conv.train()
    x = torch.zeros(1, cin, 8, 8)
    conv(x)  # triggers one power iteration and weight normalization
    w_torch = conv.weight.detach().numpy()  # OIHW normalized

    wn, u1, v1 = spectral_normalize(jnp.asarray(w), jnp.asarray(u0), jnp.zeros((cin * kh * kw,)), update=True)
    wn_oihw = np.asarray(wn).transpose(3, 2, 0, 1)
    np.testing.assert_allclose(wn_oihw, w_torch, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(u1), conv.weight_u.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v1), conv.weight_v.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_spectral_normalize_no_update_uses_stored_uv(rng):
    w = rng.standard_normal((1, 1, 3, 3)).astype(np.float32)
    u = rng.standard_normal((3,)).astype(np.float32)
    u /= np.linalg.norm(u)
    v = rng.standard_normal((3,)).astype(np.float32)
    v /= np.linalg.norm(v)
    wn, u1, v1 = spectral_normalize(jnp.asarray(w), jnp.asarray(u), jnp.asarray(v), update=False)
    sigma = u @ kernel_to_matrix(jnp.asarray(w)) @ v
    np.testing.assert_allclose(np.asarray(wn), w / np.asarray(sigma), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(u1), u)
    np.testing.assert_allclose(np.asarray(v1), v)


def test_denorm():
    x = jnp.asarray([-1.5, -1.0, 0.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(denorm(x)), [0.0, 0.0, 0.5, 1.0, 1.0])


def test_spectral_sigmas_matches_sequential_normalize(rng):
    """spectral_sigmas(n) == the sigmas of n sequential spectral_normalize
    calls (torch's n sequential train-mode forwards), with the same final
    u/v state."""
    from uegan_tpu.ops.spectral_norm import spectral_sigmas

    kh, kw, cin, cout = 3, 3, 4, 6
    w = jnp.asarray(rng.standard_normal((kh, kw, cin, cout)).astype(np.float32))
    u = rng.standard_normal((cout,)).astype(np.float32)
    u /= np.linalg.norm(u) + 1e-12
    v = rng.standard_normal((cin * kh * kw,)).astype(np.float32)
    v /= np.linalg.norm(v) + 1e-12

    uu, vv = jnp.asarray(u), jnp.asarray(v)
    want = []
    for _ in range(3):
        wn, uu, vv = spectral_normalize(w, uu, vv, update=True)
        # sigma = w / wn elementwise; recover via ratio of one element
        want.append(float(np.asarray(w).flat[0] / np.asarray(wn).flat[0]))
    sig, u3, v3 = spectral_sigmas(w, jnp.asarray(u), jnp.asarray(v), 3, update=True)
    np.testing.assert_allclose(np.asarray(sig), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u3), np.asarray(uu), rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(v3), np.asarray(vv), rtol=1e-6, atol=1e-7)

    # update=False: all branches see the stored-u/v sigma
    sig0, u0_, v0_ = spectral_sigmas(w, jnp.asarray(u), jnp.asarray(v), 2, update=False)
    s_expect = float(u @ np.asarray(kernel_to_matrix(w)) @ v)
    np.testing.assert_allclose(np.asarray(sig0), [s_expect] * 2, rtol=1e-6)


def test_snconv_sn_branches_matches_sequential_forwards(rng):
    """SNConv(sn_branches=3) on a 3-branch batch == three sequential SNConv
    forwards, each advancing the power iteration (torch semantics)."""
    from uegan_tpu.models.blocks import SNConv

    m = SNConv(features=5, kernel_size=3, use_sn=True, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal((6, 8, 8, 4)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), x)
    params, spectral = variables["params"], variables["spectral"]

    # sequential: 3 forwards of batch 2, threading the spectral state
    outs, spec = [], spectral
    for i in range(3):
        y, mut = m.apply(
            {"params": params, "spectral": spec}, x[2 * i : 2 * i + 2],
            update_sn=True, mutable=["spectral"],
        )
        outs.append(np.asarray(y))
        spec = mut["spectral"]
    want = np.concatenate(outs, axis=0)

    got, mut = m.apply(
        {"params": params, "spectral": spectral}, x,
        update_sn=True, sn_branches=3, mutable=["spectral"],
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(spec), jax.tree_util.tree_leaves(mut["spectral"])
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-6, atol=1e-7)
