"""TDAN: temporally-deformable alignment network (upstream zoo).

Reference: mmedit/models/backbones/sr_backbones/tdan_net.py:15-165. Uses
DCNv1 (no modulation) — our gather-based DCN with a unit mask. Outputs both
the x4 HR center frame and the aligned LR frames (TDAN's auxiliary output).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnp_vcve_tpu.models.init import torch_conv_default, torch_conv_bias_default
from pnp_vcve_tpu.ops.deform_conv import modulated_deform_conv2d
from pnp_vcve_tpu.ops.upsample import pixel_shuffle
from pnp_vcve_tpu.ops.dynamic_conv import conv2d_nhwc
from .basicvsr_pp import ResidualBlocksWithInputConv

__all__ = ["TDANNet"]


class DeformConv2dPack(nn.Module):
    """DCNv1 with offsets regressed from its own input (or an extra feature
    when ``augmented``)."""

    channels: int
    deform_groups: int = 8
    augmented: bool = False

    @nn.compact
    def __call__(self, x, extra_feat=None):
        b, h, w, c = x.shape
        g = self.deform_groups
        src = extra_feat if self.augmented else x
        off = nn.Conv(g * 18, (3, 3), padding="SAME",
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="conv_offset")(src)
        offsets = off.reshape(b, h, w, g, 9, 2)
        mask = jnp.ones((b, h, w, g, 9), x.dtype)  # DCNv1: no modulation
        kernel = self.param("weight", torch_conv_default, (3, 3, c, self.channels))
        bias = self.param("bias", torch_conv_bias_default(9 * c), (self.channels,))
        return modulated_deform_conv2d(x, offsets, mask, kernel, bias)


class TDANNet(nn.Module):
    in_channels: int = 3
    mid_channels: int = 64
    out_channels: int = 3
    num_blocks_before_align: int = 5
    num_blocks_after_align: int = 10

    @nn.compact
    def __call__(self, lrs, **_ignored):
        b, t, h, w, c = lrs.shape
        cm = self.mid_channels
        center = t // 2
        lr_center = lrs[:, center]

        feats = ResidualBlocksWithInputConv(
            cm, self.num_blocks_before_align, name="feat_extract"
        )(lrs.reshape(b * t, h, w, c)).reshape(b, t, h, w, cm)
        feat_center = feats[:, center]

        agg_conv = nn.Conv(cm, (3, 3), padding="SAME", name="feat_agg_conv")
        agg_dcn1 = DeformConv2dPack(cm, name="feat_agg_dcn1")
        agg_dcn2 = DeformConv2dPack(cm, name="feat_agg_dcn2")
        align1 = DeformConv2dPack(cm, augmented=True, name="align_1")
        align2 = DeformConv2dPack(cm, name="align_2")
        to_rgb = nn.Conv(3, (3, 3), padding="SAME", name="to_rgb")

        aligned = []
        for i in range(t):
            if i == center:
                aligned.append(lr_center)
            else:
                agg = agg_dcn2(agg_dcn1(agg_conv(
                    jnp.concatenate([feat_center, feats[:, i]], -1)
                )))
                aligned.append(to_rgb(align2(align1(feats[:, i], agg))))
        aligned_lrs = jnp.concatenate(aligned, axis=-1)

        y = ResidualBlocksWithInputConv(
            cm, self.num_blocks_after_align, name="reconstruct"
        )(aligned_lrs)
        up1_k = self.param("upsample1_kernel", torch_conv_default, (3, 3, cm, 4 * cm))
        up1_b = self.param("upsample1_bias", torch_conv_bias_default(9 * cm), (4 * cm,))
        up2_k = self.param("upsample2_kernel", torch_conv_default, (3, 3, cm, 4 * cm))
        up2_b = self.param("upsample2_bias", torch_conv_bias_default(9 * cm), (4 * cm,))
        y = pixel_shuffle(conv2d_nhwc(y, up1_k, up1_b), 2)
        y = pixel_shuffle(conv2d_nhwc(y, up2_k, up2_b), 2)
        hr = nn.Conv(self.out_channels, (3, 3), padding="SAME", use_bias=False,
                     name="conv_out")(y)
        return hr, aligned_lrs.reshape(b, h, w, t, c).transpose(0, 3, 1, 2, 4)
