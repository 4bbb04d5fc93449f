"""Pixel losses (reference: mmedit/models/losses/pixelwise_loss.py).

The flagship config trains with Charbonnier (eps=1e-12, mean reduction,
loss_weight=1.0) — configs/HR_davis_LR_128x128.py:26.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["charbonnier_loss", "l1_loss", "mse_loss", "gan_loss", "feature_matching_loss", "make_perceptual_loss", "masked_l1_loss", "l1_composition_loss"]


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


def make_perceptual_loss(
    vgg_params,
    layer_weights: dict,
    layer_weights_style: dict | None = None,
    vgg_type: str = "vgg19",
    use_input_norm: bool = True,
    perceptual_weight: float = 1.0,
    style_weight: float = 0.0,
    norm_img: bool = False,
    criterion: str = "l1",
):
    """Perceptual (+ optional style/Gram) loss on VGG features.

    Reference: mmedit/models/losses/perceptual_loss.py:97-233
    (``PerceptualLoss``): per requested torchvision feature index, the l1/mse
    distance between prediction and stop-gradient gt features, weighted and
    summed; the style term compares Gram matrices. ``norm_img`` maps [-1,1]
    inputs to [0,1] (this repo's pipelines are already [0,1], so default off).

    Returns ``loss_fn(pred, gt) -> (perceptual, style)`` over NHWC [0,1]
    images; entries are 0.0 when their weight is 0.
    """
    from pnp_vcve_tpu.models.vgg import vgg_features

    if layer_weights_style is None:
        layer_weights_style = layer_weights
    names = sorted(set(layer_weights) | set(layer_weights_style), key=int)
    crit = l1_loss if criterion == "l1" else mse_loss

    def gram(feat):
        b, h, w, c = feat.shape
        f = feat.reshape(b, h * w, c).astype(jnp.float32)
        return jnp.einsum("bnc,bnd->bcd", f, f) / (c * h * w)

    def loss_fn(pred, gt):
        if norm_img:
            pred = (pred + 1.0) * 0.5
            gt = (gt + 1.0) * 0.5
        gt = jax.lax.stop_gradient(gt)
        f_pred = vgg_features(vgg_params, pred, names, vgg_type, use_input_norm)
        f_gt = vgg_features(vgg_params, gt, names, vgg_type, use_input_norm)
        percep = 0.0
        if perceptual_weight > 0:
            for k, w in layer_weights.items():
                percep = percep + w * crit(f_pred[k], f_gt[k])
            percep = percep * perceptual_weight
        style = 0.0
        if style_weight > 0:
            for k, w in layer_weights_style.items():
                style = style + w * crit(gram(f_pred[k]), gram(f_gt[k]))
            style = style * style_weight
        return percep, style

    return loss_fn


def masked_l1_loss(pred, target, mask, weight: float = 1.0, sample_wise: bool = False):
    """Mask-weighted L1 (reference mask_reduce_loss semantics,
    losses/utils.py:27-69): the loss is averaged over the masked region
    (weight broadcast over channels; sample_wise averages per sample
    first). The inpainting recipes use it with hole/valid masks."""
    mask = jnp.broadcast_to(mask, pred.shape).astype(jnp.float32)
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32)) * mask
    if sample_wise:
        axes = tuple(range(1, pred.ndim))
        per = diff.sum(axes) / jnp.clip(mask.sum(axes), 1e-12)
        return weight * per.mean()
    return weight * diff.sum() / jnp.clip(mask.sum(), 1e-12)


def l1_composition_loss(pred_alpha, fg, bg, ori_merged, weight=None, loss_weight: float = 1.0):
    """Composition L1 of matting (reference composition_loss.py:11-55):
    |alpha*fg + (1-alpha)*bg - merged|, optionally mask-weighted."""
    merged = pred_alpha * fg + (1.0 - pred_alpha) * bg
    if weight is not None:
        return masked_l1_loss(merged, ori_merged, weight, loss_weight)
    return loss_weight * jnp.mean(jnp.abs(merged - ori_merged))
