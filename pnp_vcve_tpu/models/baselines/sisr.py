"""Upstream SISR zoo (capability parity for the mmediting fork's
single-image models; none are on the PnP path).

Reference surfaces:
- EDSR: mmedit/models/backbones/sr_backbones/edsr.py:41-120 (rgb mean/std
  normalize, res-scaled plain blocks, pixel-shuffle upsample chain).
- RRDBNet (ESRGAN): rrdb_net.py:13-175 (residual-in-residual dense blocks
  at 0.2 scaling, nearest-upsample conv chain; 1x/2x inputs go through a
  pixel-unshuffle to x4).
- MSRResNet: sr_resnet.py:12-110 (PixelShufflePack chain + bilinear skip).
- SRCNN: srcnn.py:10-65 (bicubic upsample + 3 convs).

Layout: NHWC, [0, 1] inputs.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pnp_vcve_tpu.ops.upsample import pixel_shuffle
from pnp_vcve_tpu.ops.resize import resize_bilinear

__all__ = ["EDSR", "RRDBNet", "MSRResNet", "SRCNN", "RDN"]


def _resize(x, scale, method):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), method)


def pixel_unshuffle(x, scale):
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // scale, w // scale, scale * scale * c
    )


class EDSR(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 16
    upscale_factor: int = 4
    res_scale: float = 1.0
    rgb_mean: tuple = (0.4488, 0.4371, 0.4040)
    rgb_std: tuple = (1.0, 1.0, 1.0)

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray(self.rgb_mean, x.dtype)
        std = jnp.asarray(self.rgb_std, x.dtype)
        x = (x - mean) / std
        feat = nn.Conv(self.mid_channels, (3, 3), padding="SAME", name="conv_first")(x)
        body = feat
        for i in range(self.num_blocks):
            y = nn.relu(nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                                name=f"block{i}_conv1")(body))
            y = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                        name=f"block{i}_conv2")(y)
            body = body + y * self.res_scale
        body = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                       name="conv_after_body")(body)
        feat = feat + body
        # 2^n pixel-shuffle chain (or a single x3 stage)
        s = self.upscale_factor
        stage = 0
        while s > 1:
            r = 3 if s % 3 == 0 else 2
            feat = pixel_shuffle(
                nn.Conv(self.mid_channels * r * r, (3, 3), padding="SAME",
                        name=f"upsample{stage}")(feat), r)
            s //= r
            stage += 1
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv_last")(feat)
        return out * std + mean


class _ResidualDenseBlock(nn.Module):
    mid_channels: int = 64
    growth_channels: int = 32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(4):
            y = nn.Conv(self.growth_channels, (3, 3), padding="SAME",
                        name=f"conv{i + 1}")(jnp.concatenate(feats, -1))
            feats.append(nn.leaky_relu(y, 0.2))
        out = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                      name="conv5")(jnp.concatenate(feats, -1))
        return x + 0.2 * out


class _RRDB(nn.Module):
    mid_channels: int = 64
    growth_channels: int = 32

    @nn.compact
    def __call__(self, x):
        out = _ResidualDenseBlock(self.mid_channels, self.growth_channels, name="rdb1")(x)
        out = _ResidualDenseBlock(self.mid_channels, self.growth_channels, name="rdb2")(out)
        out = _ResidualDenseBlock(self.mid_channels, self.growth_channels, name="rdb3")(out)
        return x + 0.2 * out


class RRDBNet(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 23
    growth_channels: int = 32
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        if self.upscale_factor in (1, 2):
            x = pixel_unshuffle(x, 4 // self.upscale_factor)
        feat = nn.Conv(self.mid_channels, (3, 3), padding="SAME", name="conv_first")(x)
        body = feat
        for i in range(self.num_blocks):
            body = _RRDB(self.mid_channels, self.growth_channels, name=f"rrdb{i}")(body)
        feat = feat + nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                              name="conv_body")(body)
        feat = nn.leaky_relu(nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                                     name="conv_up1")(_resize(feat, 2, "nearest")), 0.2)
        feat = nn.leaky_relu(nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                                     name="conv_up2")(_resize(feat, 2, "nearest")), 0.2)
        feat = nn.leaky_relu(nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                                     name="conv_hr")(feat), 0.2)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv_last")(feat)


class MSRResNet(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 16
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        feat = nn.leaky_relu(
            nn.Conv(self.mid_channels, (3, 3), padding="SAME", name="conv_first")(x),
            0.1,
        )
        body = feat
        for i in range(self.num_blocks):
            y = nn.relu(nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                                name=f"block{i}_conv1")(body))
            y = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                        name=f"block{i}_conv2")(y)
            body = body + y
        s = self.upscale_factor
        ups = [s] if s in (2, 3) else [2, 2]
        for i, r in enumerate(ups):
            body = nn.leaky_relu(pixel_shuffle(
                nn.Conv(self.mid_channels * r * r, (3, 3), padding="SAME",
                        name=f"upsample{i + 1}")(body), r), 0.1)
        body = nn.leaky_relu(
            nn.Conv(self.mid_channels, (3, 3), padding="SAME", name="conv_hr")(body),
            0.1,
        )
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv_last")(body)
        return out + resize_bilinear(
            x, (x.shape[1] * s, x.shape[2] * s)
        )


class SRCNN(nn.Module):
    channels: tuple = (3, 64, 32, 3)
    kernel_sizes: tuple = (9, 1, 5)
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        x = _resize(x, self.upscale_factor, "bicubic")
        for i, (c, k) in enumerate(zip(self.channels[1:], self.kernel_sizes)):
            x = nn.Conv(c, (k, k), padding="SAME", name=f"conv{i + 1}")(x)
            if i < len(self.kernel_sizes) - 1:
                x = nn.relu(x)
        return x


class _RDB(nn.Module):
    """Residual dense block: N dense layers + 1x1 local fusion + residual
    (rdn.py:36-68)."""

    mid_channels: int = 64
    growth: int = 64
    num_layers: int = 8

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(self.num_layers):
            y = nn.relu(nn.Conv(self.growth, (3, 3), padding="SAME",
                                name=f"dense{i}")(jnp.concatenate(feats, -1)))
            feats.append(y)
        fused = nn.Conv(self.mid_channels, (1, 1), name="lff")(
            jnp.concatenate(feats, -1)
        )
        return x + fused


class RDN(nn.Module):
    """Residual Dense Network (rdn.py:71-180): shallow features, D RDBs,
    global fusion over all block outputs, pixel-shuffle upsample."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 16
    num_layers: int = 8
    channel_growth: int = 64
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, x):
        sfe1 = nn.Conv(self.mid_channels, (3, 3), padding="SAME", name="sfe1")(x)
        y = nn.Conv(self.mid_channels, (3, 3), padding="SAME", name="sfe2")(sfe1)
        locals_ = []
        for i in range(self.num_blocks):
            y = _RDB(self.mid_channels, self.channel_growth, self.num_layers,
                     name=f"rdb{i}")(y)
            locals_.append(y)
        y = nn.Conv(self.mid_channels, (1, 1), name="gff1")(
            jnp.concatenate(locals_, -1)
        )
        y = nn.Conv(self.mid_channels, (3, 3), padding="SAME", name="gff2")(y)
        y = y + sfe1
        s = self.upscale_factor
        stages = [s] if s in (2, 3) else [2] * (s // 2)
        for i, r in enumerate(stages):
            y = pixel_shuffle(
                nn.Conv(self.mid_channels * r * r, (3, 3), padding="SAME",
                        name=f"up{i}")(y), r)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME",
                       name="output")(y)
