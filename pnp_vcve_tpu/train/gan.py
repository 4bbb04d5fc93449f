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
