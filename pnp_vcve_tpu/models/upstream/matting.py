"""Matting family: DIM (Deep Image Matting) encoder-decoder + refiner.

Reference surfaces: mmedit/models/mattors/dim.py:12-180 (two-stage
predict-alpha then refine protocol), the VGG16-ish SimpleEncoderDecoder the
DIM configs use, and components/refiners/plain_refiner.py:10-60 (three
convs on cat(merged, raw_alpha) predicting a residual).

Input: cat(merged RGB, trimap) (4 channels, [0,1]); outputs alpha in [0,1].
Layout NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["DIMMattor", "PlainRefiner"]


class PlainRefiner(nn.Module):
    """refine_conv1..3 + refine_pred: residual on the raw alpha
    (plain_refiner.py:10-60)."""

    mid_channels: int = 64

    @nn.compact
    def __call__(self, merged_and_alpha, raw_alpha):
        y = merged_and_alpha
        for i in range(3):
            y = nn.relu(
                nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                        name=f"refine_conv{i + 1}")(y)
            )
        residual = nn.Conv(1, (3, 3), padding="SAME", name="refine_pred")(y)
        return nn.sigmoid(raw_alpha + residual)


class DIMMattor(nn.Module):
    """VGG-style encoder (5 pool stages) + mirror decoder predicting raw
    alpha, optional PlainRefiner stage (the DIM two-stage protocol)."""

    base_channels: int = 64
    with_refiner: bool = True

    @nn.compact
    def __call__(self, merged, trimap, refine: bool = True):
        x = jnp.concatenate([merged, trimap], axis=-1)
        c = self.base_channels
        enc_cfg = ((c, 2), (c * 2, 2), (c * 4, 3), (c * 8, 3), (c * 8, 3))
        y = x
        sizes = []
        for stage, (ch, n) in enumerate(enc_cfg):
            for i in range(n):
                y = nn.relu(
                    nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"enc{stage}_{i}")(y)
                )
            sizes.append(y.shape[1:3])
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = nn.relu(nn.Conv(c * 8, (3, 3), padding="SAME", name="bottleneck")(y))
        for stage, (ch, _) in reversed(list(enumerate(enc_cfg))):
            h, w = sizes[stage]
            y = jax.image.resize(y, (y.shape[0], h, w, y.shape[-1]), "nearest")
            y = nn.relu(
                nn.Conv(ch, (5, 5), padding="SAME", name=f"dec{stage}")(y)
            )
        raw_alpha = nn.Conv(1, (5, 5), padding="SAME", name="alpha_pred")(y)
        pred_alpha = nn.sigmoid(raw_alpha)
        if self.with_refiner and refine:
            pred_alpha = PlainRefiner(name="refiner")(
                jnp.concatenate([merged, raw_alpha], axis=-1), raw_alpha
            )
        return pred_alpha
