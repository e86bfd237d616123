"""Golden-value loss tests against torch formulations."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from uegan_tpu.losses.gan import gan_loss, multiscale_gan_loss
from uegan_tpu.losses.reconstruction import multiscale_rec_loss
from uegan_tpu.losses.extra import tv_loss, angular_loss, emd_loss


def _torch_rahinge(r, f, for_d):
    r, f = torch.from_numpy(r), torch.from_numpy(f)
    r_f = r - f.mean()
    f_r = f - r.mean()
    if for_d:
        return ((F.relu(1 - r_f)).mean() + (F.relu(1 + f_r)).mean()) / 2
    return ((F.relu(1 + r_f)).mean() + (F.relu(1 - f_r)).mean()) / 2


def _torch_rals(r, f, for_d):
    r, f = torch.from_numpy(r), torch.from_numpy(f)
    r_f = r - f.mean()
    f_r = f - r.mean()
    if for_d:
        return (((r_f - 1) ** 2).mean() + ((f_r + 1) ** 2).mean()) / 2
    return (((r_f + 1) ** 2).mean() + ((f_r - 1) ** 2).mean()) / 2


def test_rahinge_matches_reference_formula(rng):
    r = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    f = rng.standard_normal((2, 8, 8, 1)).astype(np.float32)
    for for_d in (True, False):
        ours = float(gan_loss(jnp.asarray(r), jnp.asarray(f), "rahinge", for_d))
        theirs = float(_torch_rahinge(r, f, for_d))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_rals_matches_reference_formula(rng):
    r = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    f = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    for for_d in (True, False):
        ours = float(gan_loss(jnp.asarray(r), jnp.asarray(f), "rals", for_d))
        theirs = float(_torch_rals(r, f, for_d))
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_multiscale_sums_over_scales(rng):
    rs = [rng.standard_normal((1, s, s, 1)).astype(np.float32) for s in (8, 4, 2)]
    fs = [rng.standard_normal((1, s, s, 1)).astype(np.float32) for s in (8, 4, 2)]
    total = float(multiscale_gan_loss([jnp.asarray(r) for r in rs], [jnp.asarray(f) for f in fs], "rahinge", True))
    parts = sum(float(gan_loss(jnp.asarray(r), jnp.asarray(f), "rahinge", True)) for r, f in zip(rs, fs))
    np.testing.assert_allclose(total, parts, rtol=1e-6)


def test_hinge_matches_torch_composition(rng):
    r = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    f = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    rt, ft = torch.from_numpy(r), torch.from_numpy(f)
    d_ref = (-torch.min(rt - 1, torch.zeros_like(rt)).mean()) + (-torch.min(-ft - 1, torch.zeros_like(ft)).mean())
    np.testing.assert_allclose(float(gan_loss(jnp.asarray(r), jnp.asarray(f), "hinge", True)), float(d_ref), rtol=1e-5)
    np.testing.assert_allclose(float(gan_loss(jnp.asarray(r), jnp.asarray(f), "hinge", False)), float(-ft.mean()), rtol=1e-5)


def test_original_matches_torch_bce(rng):
    r = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    f = rng.standard_normal((2, 4, 4, 1)).astype(np.float32)
    rt, ft = torch.from_numpy(r), torch.from_numpy(f)
    d_ref = F.binary_cross_entropy_with_logits(rt, torch.ones_like(rt)) + F.binary_cross_entropy_with_logits(ft, torch.zeros_like(ft))
    np.testing.assert_allclose(float(gan_loss(jnp.asarray(r), jnp.asarray(f), "original", True)), float(d_ref), rtol=1e-5)


def test_multiscale_rec_loss_matches_torch(rng):
    x = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    y = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = torch.from_numpy(y.transpose(0, 3, 1, 2))
    pool = torch.nn.AvgPool2d(2, stride=2, count_include_pad=False)
    ref = 0.0
    p, t = xt, yt
    for i, w in enumerate([1.0, 0.5, 0.25]):
        ref += w * F.l1_loss(p, t)
        if i != 2:
            p, t = pool(p), pool(t)
    ours = float(multiscale_rec_loss(jnp.asarray(x), jnp.asarray(y), "l1"))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_smoothl1_matches_torch(rng):
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32) * 3
    y = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    ours = float(multiscale_rec_loss(jnp.asarray(x), jnp.asarray(y), "smoothl1", multiscale=False))
    ref = float(F.smooth_l1_loss(torch.from_numpy(x), torch.from_numpy(y)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_tv_loss_matches_torch(rng):
    x = rng.standard_normal((2, 6, 5, 3)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    n, c, h, w = xt.shape
    count_h = c * (h - 1) * w
    count_w = c * h * (w - 1)
    h_tv = ((xt[:, :, 1:, :] - xt[:, :, : h - 1, :]) ** 2).sum()
    w_tv = ((xt[:, :, :, 1:] - xt[:, :, :, : w - 1]) ** 2).sum()
    ref = 2 * (h_tv / count_h + w_tv / count_w) / n
    ours = float(tv_loss(jnp.asarray(x)))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_angular_loss_matches_torch(rng):
    a = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    b = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    at = torch.from_numpy(a.transpose(0, 3, 1, 2))
    bt = torch.from_numpy(b.transpose(0, 3, 1, 2))
    cos = torch.nn.CosineSimilarity(dim=1)(at, bt).clamp(-0.999999, 0.999999)
    ref = float(torch.mean(torch.acos(cos)) * 180 / np.pi)
    ours = float(angular_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_emd_loss_matches_reference_formula(rng):
    p = rng.random((4, 10)).astype(np.float32)
    q = rng.random((4, 10)).astype(np.float32)
    p /= p.sum(1, keepdims=True)
    q /= q.sum(1, keepdims=True)
    pt, qt = torch.from_numpy(p), torch.from_numpy(q)
    cdf_t = torch.cumsum(pt, dim=1)
    cdf_p = torch.cumsum(qt, dim=1)
    ref = float(torch.pow(torch.mean(torch.pow(cdf_t - cdf_p, 2), dim=1), 0.5).mean())
    ours = float(emd_loss(jnp.asarray(p), jnp.asarray(q)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_perceptual_loss_structure(rng):
    """Perceptual loss: zero for identical inputs, positive otherwise."""
    import jax
    from uegan_tpu.models.vgg import VGG19Features
    from uegan_tpu.losses.perceptual import perceptual_loss

    vgg = VGG19Features()
    x = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    variables = vgg.init(jax.random.PRNGKey(0), x)
    same = float(perceptual_loss(vgg, variables, x, x))
    diff = float(perceptual_loss(vgg, variables, x, y))
    assert same < 1e-6
    assert diff > 0.0


def test_perceptual_packed_stage1_matches_canonical():
    """Packed VGG stage-1 perceptual == canonical path (values and grads)."""
    import jax
    from uegan_tpu.losses.perceptual import perceptual_loss
    from uegan_tpu.models.vgg import VGG19Features

    vgg = VGG19Features(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    variables = vgg.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))

    f_packed = jax.jit(lambda x, y: perceptual_loss(vgg, variables, x, y, packed_stage1=True))
    f_canon = jax.jit(lambda x, y: perceptual_loss(vgg, variables, x, y, packed_stage1=False))
    np.testing.assert_allclose(float(f_packed(x, y)), float(f_canon(x, y)), rtol=2e-5)

    g_packed = jax.jit(jax.grad(lambda x: perceptual_loss(vgg, variables, x, y, packed_stage1=True)))
    g_canon = jax.jit(jax.grad(lambda x: perceptual_loss(vgg, variables, x, y, packed_stage1=False)))
    # abs-dominated tolerance: last-ulp conv differences can flip ReLU masks
    # for borderline-zero activations, giving tiny absolute (but large
    # relative) gradient differences
    gp, gc = np.asarray(g_packed(x)), np.asarray(g_canon(x))
    np.testing.assert_allclose(gp, gc, rtol=1e-3, atol=1e-4 * np.abs(gc).max())
