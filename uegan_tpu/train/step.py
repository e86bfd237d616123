"""The GAN training step as ONE jitted XLA program.

The reference executes, per step: 1 G fwd, pool query, 3 D fwd + D bwd,
optimizer step, 2 D fwd + 2 VGG fwd + 1 G fwd + G bwd, optimizer step
(reference: trainer.py:75-119).  Here the entire block — including the image
pool (lax.scan over the batch) and both optax updates — compiles into a
single program, so there is exactly one host->device transfer per step (the
batch) and zero device->host synchronization.

FLOP parity is kept by re-using the fake-image forward for both the pool and
the generator backward via ``jax.vjp``: the reference builds one autograd
graph for G(raw) and reuses it; we keep its residuals and add the cotangent
from the adversarial+perceptual head, plus the gradient of the identity
branch (the second G forward).

Semantic order is the reference's exactly:

1. fake = G(raw)                       (SN state in G advances, if enabled)
2. store = pool.query(fake)            (stop_gradient)
3. D update on [D(exp), D(store), D(raw)] with rahinge sums;
   Adam step on D                      (SN in D advances 3x)
4. G update against the *updated* D: [D(exp), D(fake)] adv + VGG fidelity
   (fake vs raw, both mapped to [0,1]) + multiscale identity on G(exp);
   Adam step on G                      (SN in D advances 2 more, G once more)

Under a (data, spatial) mesh the batch is sharded on N (and optionally H);
gradient all-reduces are GSPMD-inserted psums over ICI — no hand-written
collectives (SURVEY.md C21 mapping).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from uegan_tpu.losses.gan import multiscale_gan_loss
from uegan_tpu.losses.perceptual import perceptual_loss
from uegan_tpu.losses.reconstruction import multiscale_rec_loss
from uegan_tpu.train.image_pool import pool_query
from uegan_tpu.train.state import ModelBundle, TrainState


def _apply_with_extra(model, params, extra, x, **kw):
    """Apply a flax model threading its non-param collections functionally."""
    variables = {"params": params, **extra}
    if extra:
        out, mut = model.apply(variables, x, mutable=list(extra.keys()), **kw)
        return out, mut
    out = model.apply(variables, x, **kw)
    return out, extra


def make_train_step(bundle: ModelBundle) -> Callable[[TrainState, Dict], Tuple[TrainState, Dict]]:
    cfg = bundle.config
    g_model, d_model = bundle.g_model, bundle.d_model
    vgg_model, vgg_vars = bundle.vgg_model, bundle.vgg_vars
    mode = cfg.adv_loss_type
    use_pool = cfg.pool_size > 0

    # When G is stateless per-sample (the default config: no spectral norm,
    # no norm layers), G(raw) and G(exp) can run as ONE batched forward —
    # identical math, half the generator launches.  With SN the reference
    # runs two power iterations per step; with Instance/BatchNorm the
    # running-stats bookkeeping differs — keep two sequential calls then.
    fuse_g = (not cfg.g_use_sn) and cfg.g_norm_fun == "none"

    # Optional packed (space-to-depth) G execution inside the train step:
    # the full-res tail runs on 128-lane tensors, kernels packed from the
    # live params at trace time (differentiable — infer/packed.py).  Equal
    # math to float tolerance, not bit-identical, hence opt-in.
    packed_g = None
    # fuse_g already guarantees no SN / no norm; the act check mirrors
    # make_packed_eval's build-time assert
    if getattr(cfg, "packed_train", False) and fuse_g and g_model.act_fun == "LeakyReLU":
        from uegan_tpu.infer.packed import make_packed_eval

        packed_g = make_packed_eval(
            bundle, None,
            l2_interior=getattr(cfg, "packed_train_l2", False))

    # fused_d: all D inputs of a phase run as ONE batched forward.  With
    # spectral norm (the default D) each branch's output is scaled by its own
    # per-iteration sigma (SNConv sn_branches) — exact torch-SN semantics, so
    # this is on by default.  Batch/Instance norm running stats would still
    # see one fused batch instead of sequential ones, so those configs keep
    # the sequential forwards.
    fuse_d = cfg.fused_d and cfg.d_norm_fun == "none"

    def train_step(state: TrainState, img_raw: jnp.ndarray, img_exp: jnp.ndarray):
        rng, k_pool = jax.random.split(state.rng)
        batch = img_raw.shape[0]

        # ---- 1. G forward(s), keeping VJP residuals for the G update ----
        if fuse_g:
            def g_forward(g_params):
                both = jnp.concatenate([img_raw, img_exp], axis=0)
                if packed_g is not None:
                    return packed_g(g_params, both), state.g_extra
                out, mut = _apply_with_extra(
                    g_model, g_params, state.g_extra, both,
                    train=True, update_sn=True,
                )
                return out, mut

            g_both, g_vjp, g_extra1 = jax.vjp(g_forward, state.g_params, has_aux=True)
            fake_exp = g_both[:batch]
        else:
            def g_forward(g_params):
                out, mut = _apply_with_extra(
                    g_model, g_params, state.g_extra, img_raw, train=True, update_sn=True
                )
                return out, mut

            g_both, g_vjp, g_extra1 = jax.vjp(g_forward, state.g_params, has_aux=True)
            fake_exp = g_both

        # ---- 2. image pool (on-device ring buffer) ----
        if use_pool:
            pool, store = pool_query(state.pool, fake_exp, k_pool)
        else:
            pool, store = state.pool, jax.lax.stop_gradient(fake_exp)

        # ---- 3. D update (trainer.py:88-98) ----
        # fused_d: all D inputs of a phase run as ONE batched forward; with
        # SN each branch is scaled by its own per-iteration sigma (exact
        # torch semantics — see SNConv).  Without SN the math is identical
        # (test-enforced).
        def d_loss_fn(d_params):
            extra = state.d_extra
            if fuse_d:
                parts = [img_exp, store] + ([img_raw] if cfg.adv_input else [])
                preds, extra = _apply_with_extra(
                    d_model, d_params, extra, jnp.concatenate(parts, axis=0),
                    train=True, update_sn=True, sn_branches=len(parts),
                )
                preds_real = [p[:batch] for p in preds]
                preds_fake = [p[batch : 2 * batch] for p in preds]
                loss = multiscale_gan_loss(preds_real, preds_fake, mode, for_discriminator=True)
                if cfg.adv_input:
                    preds_input = [p[2 * batch :] for p in preds]
                    loss = loss + multiscale_gan_loss(
                        preds_real, preds_input, mode, for_discriminator=True
                    )
                return loss, extra
            preds_real, extra = _apply_with_extra(
                d_model, d_params, extra, img_exp, train=True, update_sn=True
            )
            preds_fake, extra = _apply_with_extra(
                d_model, d_params, extra, store, train=True, update_sn=True
            )
            loss = multiscale_gan_loss(preds_real, preds_fake, mode, for_discriminator=True)
            if cfg.adv_input:
                preds_input, extra = _apply_with_extra(
                    d_model, d_params, extra, img_raw, train=True, update_sn=True
                )
                loss = loss + multiscale_gan_loss(
                    preds_real, preds_input, mode, for_discriminator=True
                )
            return loss, extra

        (d_loss, d_extra1), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        d_updates, d_opt = bundle.d_tx.update(d_grads, state.d_opt, state.d_params)
        d_params1 = optax.apply_updates(state.d_params, d_updates)

        # ---- 4. G update against updated D (trainer.py:100-118) ----
        def g_losses(fake, idt_out):
            extra = d_extra1
            if fuse_d and not cfg.split_g_adv:
                preds, extra = _apply_with_extra(
                    d_model, d_params1, extra, jnp.concatenate([img_exp, fake], axis=0),
                    train=True, update_sn=True, sn_branches=2,
                )
                preds_real = [p[:batch] for p in preds]
                preds_fake = [p[batch:] for p in preds]
            else:
                preds_real, extra = _apply_with_extra(
                    d_model, d_params1, extra, img_exp, train=True, update_sn=True
                )
                preds_fake, extra = _apply_with_extra(
                    d_model, d_params1, extra, fake, train=True, update_sn=True
                )
            adv = cfg.lambda_adv * multiscale_gan_loss(
                preds_real, preds_fake, mode, for_discriminator=False
            )
            percep = cfg.lambda_percep * perceptual_loss(
                vgg_model, vgg_vars, (fake + 1.0) / 2.0, (img_raw + 1.0) / 2.0,
                split_label=cfg.split_percep_label,
            )
            idt = cfg.lambda_idt * multiscale_rec_loss(idt_out, img_exp, cfg.idt_loss_type)
            return adv, percep, idt, extra

        if fuse_g:

            def g_head(both):
                adv, percep, idt, extra = g_losses(both[:batch], both[batch:])
                loss = adv + percep + idt
                return loss, dict(
                    adv=adv, percep=percep, idt=idt, idt_out=both[batch:],
                    d_extra=extra, g_extra=g_extra1,
                )

            (g_loss, g_aux), dboth = jax.value_and_grad(g_head, has_aux=True)(g_both)
            (g_grads,) = g_vjp(dboth)
        else:

            def g_head(fake, g_params):
                idt_out, g_extra2 = _apply_with_extra(
                    g_model, g_params, g_extra1, img_exp, train=True, update_sn=True
                )
                adv, percep, idt, extra = g_losses(fake, idt_out)
                loss = adv + percep + idt
                return loss, dict(
                    adv=adv, percep=percep, idt=idt, idt_out=idt_out,
                    d_extra=extra, g_extra=g_extra2,
                )

            (g_loss, g_aux), (dfake, g_grads_idt) = jax.value_and_grad(
                g_head, argnums=(0, 1), has_aux=True
            )(fake_exp, state.g_params)
            (g_grads_main,) = g_vjp(dfake)
            g_grads = jax.tree_util.tree_map(jnp.add, g_grads_main, g_grads_idt)

        g_updates, g_opt = bundle.g_tx.update(g_grads, state.g_opt, state.g_params)
        g_params1 = optax.apply_updates(state.g_params, g_updates)

        # ---- Polyak/EMA generator (TPU-native addition; Config.g_ema_decay).
        # Karras-style warmup: effective decay min(d, (1+t)/(10+t)) so the
        # average tracks the live params early instead of dragging the init.
        if cfg.g_ema_decay > 0:
            t = state.step.astype(jnp.float32)
            d_t = jnp.minimum(cfg.g_ema_decay, (1.0 + t) / (10.0 + t))
            g_ema1 = jax.tree_util.tree_map(
                lambda e, p: e + (1.0 - d_t) * (p.astype(e.dtype) - e),
                state.g_ema, g_params1,
            )
        else:
            g_ema1 = state.g_ema

        new_state = state.replace(
            g_ema=g_ema1,
            step=state.step + 1,
            g_params=g_params1,
            d_params=d_params1,
            g_extra=g_aux["g_extra"],
            d_extra=g_aux["d_extra"],
            g_opt=g_opt,
            d_opt=d_opt,
            pool=pool,
            rng=rng,
        )
        metrics = {
            "D/Total": d_loss,
            "G/Total": g_loss,
            "G/adv_loss": g_aux["adv"],
            "G/percep_loss": g_aux["percep"],
            "G/idt_loss": g_aux["idt"],
        }
        images = {
            "fake_exp": fake_exp,
            "fake_exp_store": store,
            "real_exp_idt": jax.lax.stop_gradient(g_aux["idt_out"]),
        }
        return new_state, metrics, images

    return train_step


def make_eval_step(bundle: ModelBundle) -> Callable:
    """Inference forward: G in eval mode (no SN iteration, running stats)."""
    g_model = bundle.g_model

    def eval_step(g_params, g_extra, img_raw):
        out, _ = _apply_with_extra(
            g_model, g_params, g_extra, img_raw, train=False, update_sn=False
        )
        return out

    return eval_step
