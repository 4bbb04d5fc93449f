"""EDVR: PCD alignment + TSA fusion (upstream zoo; the PCD module is also
reused by MW-GAN's wavelet-pyramid aligner).

Reference: mmedit/models/backbones/sr_backbones/edvr_net.py:15-470 —
ModulatedDCNPack (offsets/masks regressed from a separate feature),
3-level Pyramid-Cascading-Deformable alignment, Temporal-Spatial-Attention
fusion, reconstruction + x4 pixel-shuffle.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.models.init import torch_conv_default, torch_conv_bias_default
from pnp_vcve_tpu.ops.deform_conv import modulated_deform_conv2d
from pnp_vcve_tpu.ops.resize import resize_bilinear
from pnp_vcve_tpu.ops.upsample import pixel_shuffle
from pnp_vcve_tpu.ops.dynamic_conv import conv2d_nhwc
from .basicvsr_pp import ResidualBlocksWithInputConv

__all__ = ["PCDAlignment", "TSAFusion", "EDVRNet", "EDVRFeatureExtractor"]


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


class ModulatedDCNPack(nn.Module):
    """DCN whose offsets/masks come from a separate feature
    (edvr_net.py:15-59)."""

    channels: int
    deform_groups: int = 8

    @nn.compact
    def __call__(self, x, extra_feat):
        b, h, w, c = x.shape
        g = self.deform_groups
        out = nn.Conv(g * 27, (3, 3), padding="SAME",
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros, name="conv_offset")(extra_feat)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offsets = jnp.concatenate([o1, o2], axis=-1).reshape(b, h, w, g, 9, 2)
        mask = nn.sigmoid(mask).reshape(b, h, w, g, 9)
        kernel = self.param("weight", torch_conv_default, (3, 3, c, self.channels))
        bias = self.param("bias", torch_conv_bias_default(9 * c), (self.channels,))
        return modulated_deform_conv2d(x, offsets, mask, kernel, bias)


class PCDAlignment(nn.Module):
    """3-level pyramid cascading deformable alignment (edvr_net.py:61-188)."""

    mid_channels: int = 64
    deform_groups: int = 8

    @nn.compact
    def __call__(self, neighbor_feats, ref_feats):
        c = self.mid_channels
        conv = lambda name: nn.Conv(c, (3, 3), padding="SAME", name=name)  # noqa: E731

        up_offset, up_feat = None, None
        feat = None
        for i in range(3, 0, -1):
            lv = f"l{i}"
            offset = _lrelu(conv(f"offset_conv1_{lv}")(
                jnp.concatenate([neighbor_feats[i - 1], ref_feats[i - 1]], -1)
            ))
            if i == 3:
                offset = _lrelu(conv(f"offset_conv2_{lv}")(offset))
            else:
                offset = _lrelu(conv(f"offset_conv2_{lv}")(
                    jnp.concatenate([offset, up_offset], -1)
                ))
                offset = _lrelu(conv(f"offset_conv3_{lv}")(offset))

            feat = ModulatedDCNPack(c, self.deform_groups, name=f"dcn_pack_{lv}")(
                neighbor_feats[i - 1], offset
            )
            if i == 3:
                feat = _lrelu(feat)
            else:
                feat = conv(f"feat_conv_{lv}")(
                    jnp.concatenate([feat, up_feat], -1)
                )
                if i == 2:
                    feat = _lrelu(feat)

            if i > 1:
                hh, ww = offset.shape[1] * 2, offset.shape[2] * 2
                up_offset = resize_bilinear(offset, (hh, ww)) * 2.0
                up_feat = resize_bilinear(feat, (hh, ww))

        # cascading refinement at L1
        offset = jnp.concatenate([feat, ref_feats[0]], -1)
        offset = _lrelu(conv("cas_offset_conv2")(
            _lrelu(conv("cas_offset_conv1")(offset))
        ))
        return _lrelu(
            ModulatedDCNPack(c, self.deform_groups, name="cas_dcnpack")(feat, offset)
        )


class TSAFusion(nn.Module):
    """Temporal-spatial attention fusion (edvr_net.py:190-298)."""

    mid_channels: int = 64
    num_frames: int = 5
    center_frame_idx: int = 2

    @nn.compact
    def __call__(self, aligned):
        # aligned: (b, t, h, w, c)
        b, t, h, w, c = aligned.shape
        conv1 = lambda ch, name: nn.Conv(ch, (1, 1), name=name)  # noqa: E731
        conv3 = lambda ch, name: nn.Conv(ch, (3, 3), padding="SAME", name=name)  # noqa: E731

        emb_ref = conv3(c, "temporal_attn1")(aligned[:, self.center_frame_idx])
        emb = conv3(c, "temporal_attn2")(aligned.reshape(b * t, h, w, c)).reshape(
            b, t, h, w, c
        )
        corr = jnp.stack(
            [jnp.sum(emb[:, i] * emb_ref, -1) for i in range(t)], axis=1
        )
        prob = nn.sigmoid(corr)[..., None]  # (b, t, h, w, 1)
        gated = (aligned * prob).transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)

        feat = _lrelu(conv1(c, "feat_fusion")(gated))

        def maxpool(v):
            return nn.max_pool(v, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def avgpool(v):
            return nn.avg_pool(v, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                               count_include_pad=False)

        attn = _lrelu(conv1(c, "spatial_attn1")(gated))
        attn = _lrelu(conv1(c, "spatial_attn2")(
            jnp.concatenate([maxpool(attn), avgpool(attn)], -1)
        ))
        attn_level = _lrelu(conv1(c, "spatial_attn_l1")(attn))
        attn_level = _lrelu(conv3(c, "spatial_attn_l2")(
            jnp.concatenate([maxpool(attn_level), avgpool(attn_level)], -1)
        ))
        attn_level = _lrelu(conv3(c, "spatial_attn_l3")(attn_level))
        attn_level = resize_bilinear(
            attn_level, (attn.shape[1], attn.shape[2])
        )
        attn = _lrelu(conv3(c, "spatial_attn3")(attn)) + attn_level
        attn = _lrelu(conv1(c, "spatial_attn4")(attn))
        attn = resize_bilinear(attn, (h, w))
        attn = conv3(c, "spatial_attn5")(attn)
        attn_add = conv1(c, "spatial_attn_add2")(
            _lrelu(conv1(c, "spatial_attn_add1")(attn))
        )
        attn = nn.sigmoid(attn)
        return feat * attn * 2 + attn_add


class EDVRNet(nn.Module):
    """EDVR x4 VSR (edvr_net.py:300-470)."""

    mid_channels: int = 64
    num_frames: int = 5
    deform_groups: int = 8
    num_blocks_extraction: int = 5
    num_blocks_reconstruction: int = 10

    @nn.compact
    def __call__(self, lrs, **_ignored):
        b, t, h, w, c_in = lrs.shape
        c = self.mid_channels
        center = self.num_frames // 2

        l1 = ResidualBlocksWithInputConv(
            c, self.num_blocks_extraction, name="feat_extract"
        )(lrs.reshape(b * t, h, w, c_in))
        l2 = _lrelu(nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                            name="feat_l2_conv1")(l1))
        l2 = _lrelu(nn.Conv(c, (3, 3), padding="SAME", name="feat_l2_conv2")(l2))
        l3 = _lrelu(nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                            name="feat_l3_conv1")(l2))
        l3 = _lrelu(nn.Conv(c, (3, 3), padding="SAME", name="feat_l3_conv2")(l3))

        l1 = l1.reshape(b, t, h, w, c)
        l2 = l2.reshape(b, t, h // 2, w // 2, c)
        l3 = l3.reshape(b, t, h // 4, w // 4, c)

        ref = [l1[:, center], l2[:, center], l3[:, center]]
        pcd = PCDAlignment(c, self.deform_groups, name="pcd_alignment")
        aligned = jnp.stack(
            [pcd([l1[:, i], l2[:, i], l3[:, i]], ref) for i in range(t)], axis=1
        )
        feat = TSAFusion(
            c, self.num_frames, center, name="fusion"
        )(aligned)

        out = ResidualBlocksWithInputConv(
            c, self.num_blocks_reconstruction, name="reconstruction"
        )(feat)
        up1_k = self.param("upsample1_kernel", torch_conv_default, (3, 3, c, 4 * c))
        up1_b = self.param("upsample1_bias", torch_conv_bias_default(9 * c), (4 * c,))
        up2_k = self.param("upsample2_kernel", torch_conv_default, (3, 3, c, 256))
        up2_b = self.param("upsample2_bias", torch_conv_bias_default(9 * c), (256,))
        out = _lrelu(pixel_shuffle(conv2d_nhwc(out, up1_k, up1_b), 2))
        out = _lrelu(pixel_shuffle(conv2d_nhwc(out, up2_k, up2_b), 2))
        out = _lrelu(nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")(out))
        out = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")(out)
        base = jax.image.resize(
            lrs[:, center], (b, 4 * h, 4 * w, c_in), "bilinear"
        )
        return out + base


class EDVRFeatureExtractor(nn.Module):
    """EDVR-M up to fused features — the information-refill extractor of
    IconVSR (reference iconvsr.py:528-653): feature pyramid + PCD alignment
    to the center frame + TSA fusion, returning (b, h, w, c) features."""

    mid_channels: int = 64
    num_frames: int = 5
    deform_groups: int = 8
    num_blocks_extraction: int = 5

    @nn.compact
    def __call__(self, lrs):
        b, t, h, w, c_in = lrs.shape
        c = self.mid_channels
        center = self.num_frames // 2

        l1 = ResidualBlocksWithInputConv(
            c, self.num_blocks_extraction, name="feat_extract"
        )(lrs.reshape(b * t, h, w, c_in))
        l2 = _lrelu(nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                            name="feat_l2_conv1")(l1))
        l2 = _lrelu(nn.Conv(c, (3, 3), padding="SAME", name="feat_l2_conv2")(l2))
        l3 = _lrelu(nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME",
                            name="feat_l3_conv1")(l2))
        l3 = _lrelu(nn.Conv(c, (3, 3), padding="SAME", name="feat_l3_conv2")(l3))

        l1 = l1.reshape(b, t, h, w, c)
        l2 = l2.reshape(b, t, h // 2, w // 2, c)
        l3 = l3.reshape(b, t, h // 4, w // 4, c)
        ref = [l1[:, center], l2[:, center], l3[:, center]]
        pcd = PCDAlignment(c, self.deform_groups, name="pcd_alignment")
        aligned = jnp.stack(
            [pcd([l1[:, i], l2[:, i], l3[:, i]], ref) for i in range(t)], axis=1
        )
        return TSAFusion(c, self.num_frames, center, name="fusion")(aligned)
