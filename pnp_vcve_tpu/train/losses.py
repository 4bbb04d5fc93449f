"""Pixel losses (reference: mmedit/models/losses/pixelwise_loss.py).

The flagship config trains with Charbonnier (eps=1e-12, mean reduction,
loss_weight=1.0) — configs/HR_davis_LR_128x128.py:26.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["charbonnier_loss", "l1_loss", "mse_loss"]


def charbonnier_loss(pred, target, eps: float = 1e-12, weight: float = 1.0):
    """sqrt((pred-target)^2 + eps), mean (pixelwise_loss.py:40-51)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return weight * jnp.mean(jnp.sqrt(diff * diff + eps))


def l1_loss(pred, target, weight: float = 1.0):
    return weight * jnp.mean(jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)))


def mse_loss(pred, target, weight: float = 1.0):
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return weight * jnp.mean(d * d)
