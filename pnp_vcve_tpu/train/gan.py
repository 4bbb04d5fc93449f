"""GAN training step (DCNGAN baseline; reference restorers/dcngan.py:144-228).

Generator and discriminator each carry their own TrainState; one jitted step
updates both: D on real/fake (stop-gradient through G), then G on
adversarial + pixel (+ feature-matching) losses. The reference's
``set_requires_grad`` dance (dcngan.py:186-228) is unnecessary — gradients
are taken w.r.t. each state's own params functionally.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .losses import charbonnier_loss, feature_matching_loss, gan_loss
from .state import TrainState

__all__ = ["make_gan_train_step"]


def make_gan_train_step(
    generator,
    discriminator,
    pixel_loss: Callable = charbonnier_loss,
    gan_type: str = "lsgan",
    pixel_weight: float = 1.0,
    gan_weight: float = 0.01,
    fm_weight: float = 0.0,
    perceptual_loss: Callable | None = None,
    donate: bool = True,
):
    """(g_state, d_state, batch) -> (g_state, d_state, metrics).

    batch: lq (b,t,h,w,c) window, gt (b,h,w,c) center frame, base_qps (b,t).
    BatchNorm runs in inference mode inside the step (running averages are
    not updated — matching the reference's effective behavior where BN stats
    update only through momentum on forward passes; a mutable-batch-stats
    variant can be added when a config needs it).
    """

    def g_apply(params, batch):
        return generator.apply(
            {"params": params}, batch["lq"], base_qps=batch.get("base_qps")
        )

    def d_apply(params, img):
        return discriminator.apply({"params": params}, img)

    def train_step(g_state: TrainState, d_state: TrainState, batch):
        fake = g_apply(g_state.params, batch)
        gt = batch["gt"]

        def d_loss_fn(d_params):
            real_out = d_apply(d_params, gt)
            fake_out = d_apply(d_params, jax.lax.stop_gradient(fake))
            loss_real = gan_loss(real_out["prediction"], True, gan_type)
            loss_fake = gan_loss(fake_out["prediction"], False, gan_type)
            return 0.5 * (loss_real + loss_fake)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(d_grads)

        def g_loss_fn(g_params):
            fake_g = g_apply(g_params, batch)
            fake_out = d_apply(d_state.params, fake_g)
            loss = pixel_weight * pixel_loss(fake_g, gt)
            loss = loss + gan_weight * gan_loss(fake_out["prediction"], True, gan_type)
            if fm_weight:
                real_out = d_apply(d_state.params, gt)
                loss = loss + feature_matching_loss(
                    fake_out["feature_maps"], real_out["feature_maps"], fm_weight
                )
            if perceptual_loss is not None:
                # VGG perceptual (+style) terms, reference
                # perceptual_loss.py:172-216 (weights baked into the fn)
                percep, style = perceptual_loss(fake_g, gt)
                loss = loss + percep + style
            return loss

        g_loss, g_grads = jax.value_and_grad(g_loss_fn)(g_state.params)
        g_state = g_state.apply_gradients(g_grads)
        return g_state, d_state, {"loss_g": g_loss, "loss_d": d_loss}

    return jax.jit(train_step, donate_argnums=(0, 1) if donate else ())


def make_cyclegan_train_step(
    generator_a,
    generator_b,
    disc_a,
    disc_b,
    gan_type: str = "lsgan",
    cycle_weight: float = 10.0,
    id_weight: float = 0.5,
    donate: bool = True,
):
    """CycleGAN train step (reference mmedit/models/synthesizers/
    cycle_gan.py:171-199 forward + the standard loss wiring):

        fake_b = G_a(real_a); rec_a = G_b(fake_b)
        fake_a = G_b(real_b); rec_b = G_a(fake_a)
        L_G = gan(D_b(fake_b)) + gan(D_a(fake_a))
              + cycle_weight * (|rec_a - real_a| + |rec_b - real_b|)
              + cycle_weight * id_weight * (|G_a(real_b) - real_b|
                                            + |G_b(real_a) - real_a|)
        L_D* = 0.5 * (gan(real, 1) + gan(fake, 0))

    ``(ga_state, gb_state, da_state, db_state, batch)`` ->
    ``(states..., metrics)``; batch: {'img_a': (b,h,w,c), 'img_b': ...} in
    [-1, 1].
    """
    import jax.numpy as jnp

    def l1(x, y):
        return jnp.abs(x - y).mean()

    def train_step(ga_state, gb_state, da_state, db_state, batch):
        real_a, real_b = batch["img_a"], batch["img_b"]

        def g_loss_fn(ga_params, gb_params):
            fake_b = generator_a.apply({"params": ga_params}, real_a)
            rec_a = generator_b.apply({"params": gb_params}, fake_b)
            fake_a = generator_b.apply({"params": gb_params}, real_b)
            rec_b = generator_a.apply({"params": ga_params}, fake_a)
            pred_fb = disc_b.apply({"params": db_state.params}, fake_b)
            pred_fa = disc_a.apply({"params": da_state.params}, fake_a)
            loss = gan_loss(_pred(pred_fb), True, gan_type)
            loss = loss + gan_loss(_pred(pred_fa), True, gan_type)
            loss = loss + cycle_weight * (l1(rec_a, real_a) + l1(rec_b, real_b))
            if id_weight:
                id_a = generator_a.apply({"params": ga_params}, real_b)
                id_b = generator_b.apply({"params": gb_params}, real_a)
                loss = loss + cycle_weight * id_weight * (
                    l1(id_a, real_b) + l1(id_b, real_a)
                )
            return loss, (fake_a, fake_b)

        (g_loss, (fake_a, fake_b)), (ga_grads, gb_grads) = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1), has_aux=True
        )(ga_state.params, gb_state.params)
        ga_state = ga_state.apply_gradients(ga_grads)
        gb_state = gb_state.apply_gradients(gb_grads)

        def d_loss_fn(d_params, disc, real, fake):
            pr = disc.apply({"params": d_params}, real)
            pf = disc.apply({"params": d_params}, jax.lax.stop_gradient(fake))
            return 0.5 * (
                gan_loss(_pred(pr), True, gan_type)
                + gan_loss(_pred(pf), False, gan_type)
            )

        da_loss, da_grads = jax.value_and_grad(d_loss_fn)(
            da_state.params, disc_a, real_a, fake_a
        )
        da_state = da_state.apply_gradients(da_grads)
        db_loss, db_grads = jax.value_and_grad(d_loss_fn)(
            db_state.params, disc_b, real_b, fake_b
        )
        db_state = db_state.apply_gradients(db_grads)
        return ga_state, gb_state, da_state, db_state, {
            "loss_g": g_loss, "loss_da": da_loss, "loss_db": db_loss,
        }

    return jax.jit(
        train_step, donate_argnums=(0, 1, 2, 3) if donate else (),
        static_argnums=(),
    )


def _pred(out):
    """Discriminators return either raw logits or {'prediction': ...}."""
    return out["prediction"] if isinstance(out, dict) else out
