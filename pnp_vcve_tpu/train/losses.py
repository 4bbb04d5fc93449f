"""Pixel losses (reference: mmedit/models/losses/pixelwise_loss.py).

The flagship config trains with Charbonnier (eps=1e-12, mean reduction,
loss_weight=1.0) — configs/HR_davis_LR_128x128.py:26.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["charbonnier_loss", "l1_loss", "mse_loss", "gan_loss", "feature_matching_loss"]


def charbonnier_loss(pred, target, eps: float = 1e-12, weight: float = 1.0):
    """sqrt((pred-target)^2 + eps), mean (pixelwise_loss.py:40-51)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return weight * jnp.mean(jnp.sqrt(diff * diff + eps))


def l1_loss(pred, target, weight: float = 1.0):
    return weight * jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def mse_loss(pred, target, weight: float = 1.0):
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return weight * jnp.mean(d * d)


def gan_loss(pred, target_is_real: bool, gan_type: str = "lsgan", weight: float = 1.0):
    """Adversarial loss (reference mmedit/models/losses/gan_loss.py semantics
    for 'lsgan' and 'vanilla')."""
    import jax

    pred = pred.astype(jnp.float32)
    if gan_type == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return weight * jnp.mean((pred - target) ** 2)
    if gan_type == "vanilla":
        target = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return weight * jnp.mean(
            jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    raise ValueError(f"Unknown gan_type {gan_type!r}")


def feature_matching_loss(fake_feats, real_feats, weight: float = 1.0):
    """L1 over discriminator feature maps (DCNGAN feature-matching term)."""
    total = 0.0
    for f, r in zip(fake_feats, real_feats):
        total = total + jnp.mean(jnp.abs(f.astype(jnp.float32) - r.astype(jnp.float32)))
    return weight * total / max(len(fake_feats), 1)
