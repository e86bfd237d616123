"""Polyak/EMA generator (Config.g_ema_decay) — update math, default-off
invariance, and checkpoint slot compatibility.

The EMA copy is a TPU-native addition (no reference analog — the
reference's answer to adversarial drift is best-epoch checkpoint selection,
reference: trainer.py:289-309, which remains available).  The average is
updated inside the single-jit train step with Karras-style warmup
min(decay, (1+t)/(10+t)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uegan_tpu.config import Config
from uegan_tpu.train.state import create_train_state
from uegan_tpu.train.step import make_train_step


TINY = Config(
    g_conv_dim=8,
    d_conv_dim=8,
    train_batch_size=2,
    pool_size=4,
    compute_dtype="float32",
)


def _batch(k1, k2):
    raw = jax.random.uniform(jax.random.PRNGKey(k1), (2, 32, 32, 3), minval=-1, maxval=1)
    exp = jax.random.uniform(jax.random.PRNGKey(k2), (2, 32, 32, 3), minval=-1, maxval=1)
    return raw, exp


def test_ema_off_by_default_and_state_unchanged():
    state, bundle = create_train_state(TINY, jax.random.PRNGKey(0), (32, 32), steps_per_epoch=10)
    assert state.g_ema is None
    step_fn = jax.jit(make_train_step(bundle))
    raw, exp = _batch(1, 2)
    new_state, _, _ = step_fn(state, raw, exp)
    assert new_state.g_ema is None


def test_ema_update_follows_warmup_decay():
    cfg = TINY.replace(g_ema_decay=0.999)
    state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), steps_per_epoch=10)
    # init: the EMA starts as a copy of the init params
    for e, p in zip(jax.tree_util.tree_leaves(state.g_ema),
                    jax.tree_util.tree_leaves(state.g_params)):
        np.testing.assert_array_equal(np.asarray(e), np.asarray(p))

    step_fn = jax.jit(make_train_step(bundle))
    raw, exp = _batch(1, 2)
    s1, _, _ = step_fn(state, raw, exp)
    # t=0: d = min(0.999, 1/10) = 0.1 -> ema1 = ema0 + 0.9 * (p1 - ema0)
    want = jax.tree_util.tree_map(
        lambda e, p: e + (1.0 - 0.1) * (p - e), state.g_ema, s1.g_params)
    for a, b in zip(jax.tree_util.tree_leaves(s1.g_ema),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)

    s2, _, _ = step_fn(s1, raw, exp)
    # t=1: d = 2/11
    d1 = 2.0 / 11.0
    want2 = jax.tree_util.tree_map(
        lambda e, p: e + (1.0 - d1) * (p - e), s1.g_ema, s2.g_params)
    for a, b in zip(jax.tree_util.tree_leaves(s2.g_ema),
                    jax.tree_util.tree_leaves(want2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-6)
    # the average lags the live params (it is a mixture of two distinct points)
    moved = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(s2.g_ema),
                        jax.tree_util.tree_leaves(s2.g_params))
    )
    assert moved


def test_ema_live_params_match_emaless_run():
    """EMA must be a pure observer: the live G/D trajectory is bit-identical
    with the flag on and off."""
    base_state, base_bundle = create_train_state(
        TINY, jax.random.PRNGKey(0), (32, 32), steps_per_epoch=10)
    ema_state, ema_bundle = create_train_state(
        TINY.replace(g_ema_decay=0.99), jax.random.PRNGKey(0), (32, 32),
        steps_per_epoch=10)
    f_base = jax.jit(make_train_step(base_bundle))
    f_ema = jax.jit(make_train_step(ema_bundle))
    raw, exp = _batch(5, 6)
    b1, bm, _ = f_base(base_state, raw, exp)
    e1, em, _ = f_ema(ema_state, raw, exp)
    np.testing.assert_array_equal(float(bm["G/Total"]), float(em["G/Total"]))
    for a, b in zip(jax.tree_util.tree_leaves(b1.g_params),
                    jax.tree_util.tree_leaves(e1.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(b1.d_params),
                    jax.tree_util.tree_leaves(e1.d_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_on_mesh_matches_single_device():
    """EMA under GSPMD: the replicated-param axpy must shard away cleanly —
    the 8-device data-parallel step's EMA tree equals the single-device
    one to the mesh reduction-noise bound (SGD; see test_parallel)."""
    import optax

    from uegan_tpu.parallel.mesh import make_mesh
    from uegan_tpu.parallel.sharding import batch_sharding, replicated

    cfg = TINY.replace(g_ema_decay=0.999, train_batch_size=8)

    def step_once(mesh=None):
        state, bundle = create_train_state(cfg, jax.random.PRNGKey(0), (32, 32), 4)
        tx = optax.sgd(1e-3)
        bundle = bundle._replace(g_tx=tx, d_tx=tx)
        state = state.replace(g_opt=tx.init(state.g_params),
                              d_opt=tx.init(state.d_params))
        raw = np.random.default_rng(10).uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
        exp = np.random.default_rng(11).uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)
        step_fn = jax.jit(make_train_step(bundle))
        if mesh is not None:
            state = jax.device_put(state, replicated(mesh))
            bsh = batch_sharding(mesh)
            raw, exp = jax.device_put(raw, bsh), jax.device_put(exp, bsh)
        new_state, _, _ = step_fn(state, raw, exp)
        return jax.device_get(new_state)

    single = step_once()
    mesh = make_mesh(n_data=8, n_spatial=1)
    sharded = step_once(mesh)
    assert sharded.g_ema is not None
    for a, b in zip(jax.tree_util.tree_leaves(single.g_ema),
                    jax.tree_util.tree_leaves(sharded.g_ema)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=0)


def test_restore_eval_state_swaps_ema(tmp_path):
    """The direct-path inference restore (serving / model export) accepts
    EMA checkpoints against an EMA-less template and returns the averaged
    weights as g_params; use_ema=False keeps the live params."""
    from uegan_tpu.utils.checkpoint import CheckpointManager, restore_eval_state

    cfg_on = TINY.replace(g_ema_decay=0.999, checkpoint_async=False)
    s_on, _ = create_train_state(cfg_on, jax.random.PRNGKey(0), (32, 32), steps_per_epoch=10)
    s_on = s_on.replace(g_ema=jax.tree_util.tree_map(lambda p: p + 0.5, s_on.g_params))
    path = CheckpointManager(str(tmp_path), cfg_on).save(jax.device_get(s_on), 3)

    template, _ = create_train_state(TINY, jax.random.PRNGKey(1), (32, 32), steps_per_epoch=10)
    got = restore_eval_state(path, jax.device_get(template))
    for a, b in zip(jax.tree_util.tree_leaves(got.g_params),
                    jax.tree_util.tree_leaves(s_on.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    raw = restore_eval_state(path, jax.device_get(template), use_ema=False)
    for a, b in zip(jax.tree_util.tree_leaves(raw.g_params),
                    jax.tree_util.tree_leaves(s_on.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_ema_slot_compat(tmp_path):
    """Restore works across the g_ema_decay on/off boundary in both
    directions (utils/checkpoint.py fallback)."""
    from uegan_tpu.utils.checkpoint import CheckpointManager

    cfg_on = TINY.replace(g_ema_decay=0.999, checkpoint_async=False)
    cfg_off = TINY.replace(checkpoint_async=False)
    s_on, _ = create_train_state(cfg_on, jax.random.PRNGKey(0), (32, 32), steps_per_epoch=10)
    s_off, _ = create_train_state(cfg_off, jax.random.PRNGKey(0), (32, 32), steps_per_epoch=10)

    # saved WITH ema, restored by an EMA-less run config
    m_on = CheckpointManager(str(tmp_path / "on"), cfg_on)
    m_on.save(jax.device_get(s_on), 1)
    m_off_reader = CheckpointManager(str(tmp_path / "on"), cfg_off)
    got = m_off_reader.restore(jax.device_get(s_off), 1)
    assert got.g_ema is not None  # the disk copy is surfaced
    for a, b in zip(jax.tree_util.tree_leaves(got.g_ema),
                    jax.tree_util.tree_leaves(s_on.g_ema)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # saved WITHOUT ema, restored by an EMA run config
    m_off = CheckpointManager(str(tmp_path / "off"), cfg_off)
    m_off.save(jax.device_get(s_off), 2)
    m_on_reader = CheckpointManager(str(tmp_path / "off"), cfg_on)
    got2 = m_on_reader.restore(jax.device_get(s_on), 2)
    assert got2.g_ema is None  # caller re-seeds (Trainer.load_pretrained_model)
    for a, b in zip(jax.tree_util.tree_leaves(got2.g_params),
                    jax.tree_util.tree_leaves(s_off.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
