"""Video frame interpolation family.

Reference surfaces:
- CAINNet: mmedit/models/backbones/vfi_backbones/cain_net.py:235-324 —
  mean-shifted inputs, PixelUnshuffle by 2**depth, residual groups of
  residual channel-attention blocks (reflection-padded convs), PixelShuffle
  back, mean restored.
- TOFlowVFI: vfi_backbones/tof_vfi_net.py — the TOFlow architecture applied
  to the 2-frame interpolation task (SPyNet flow to a virtual middle frame
  + warp + fusion); covered by the TOFlow port for the SR task.
- The BasicInterpolator protocol (video_interpolators/basic_interpolator.py)
  is the CenterFrameRestorer pattern: pairs in, middle frame out.

Layout NHWC, [0, 1].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["CAINNet"]


def _reflect_conv(x, ch, k, name_fn, idx):
    p = k // 2
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return nn.Conv(ch, (k, k), padding="VALID", name=name_fn(idx))(x)


class _ChannelAttention(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2))
        y = nn.relu(nn.Dense(max(1, self.channels // self.reduction), name="fc0")(y))
        y = nn.sigmoid(nn.Dense(self.channels, name="fc1")(y))
        return x * y[:, None, None, :]


class _RCABlock(nn.Module):
    channels: int
    kernel_size: int = 3
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_reflect_conv(x, self.channels, self.kernel_size,
                                  lambda i: f"conv{i}", 0))
        y = _reflect_conv(y, self.channels, self.kernel_size,
                          lambda i: f"conv{i}", 1)
        y = _ChannelAttention(self.channels, self.reduction, name="ca")(y)
        return x + y


class _ResidualGroup(nn.Module):
    channels: int
    num_blocks: int = 12
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.num_blocks):
            y = _RCABlock(self.channels, reduction=self.reduction,
                          name=f"block{i}")(y)
        y = _reflect_conv(y, self.channels, 3, lambda i: "conv_after_body", 0)
        return x + y


def _pixel_unshuffle(x, scale):
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // scale, w // scale, scale * scale * c
    )


def _pixel_shuffle(x, scale):
    b, h, w, c = x.shape
    co = c // (scale * scale)
    x = x.reshape(b, h, w, scale, scale, co)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * scale, w * scale, co)


class CAINNet(nn.Module):
    in_channels: int = 3
    mid_channels: int = 64
    depth: int = 3
    num_block_groups: int = 5
    num_block_layers: int = 12
    reduction: int = 16

    @nn.compact
    def __call__(self, imgs):
        """imgs (b, 2, h, w, c) -> interpolated middle frame (b, h, w, c)."""
        x1, x2 = imgs[:, 0], imgs[:, 1]
        m1 = x1.mean(axis=(1, 2), keepdims=True)
        m2 = x2.mean(axis=(1, 2), keepdims=True)
        x1 = x1 - m1
        x2 = x2 - m2

        scale = 2 ** self.depth
        x = jnp.concatenate(
            [_pixel_unshuffle(x1, scale), _pixel_unshuffle(x2, scale)], axis=-1
        )
        x = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                    name="conv_first")(x)
        y = x
        for g in range(self.num_block_groups):
            y = _ResidualGroup(self.mid_channels, self.num_block_layers,
                               self.reduction, name=f"group{g}")(y)
        y = y + x
        y = nn.Conv(self.in_channels * scale * scale, (3, 3), padding="SAME",
                    name="conv_last")(y)
        out = _pixel_shuffle(y, scale)
        return out + (m1 + m2) / 2
