"""Image-to-image generation backbones (pix2pix / CycleGAN family).

Reference surfaces:
- ResnetGenerator: mmedit/models/backbones/generation_backbones/
  resnet_generator.py:13-110 (c7s1-64, d128, d256, 9 res blocks, u128,
  u64, c7s1-3, reflect padding, instance norm, tanh head).
- UnetGenerator: unet_generator.py:12-88 (8-level U-Net with innermost
  bottleneck, instance norm).
- PatchDiscriminator: components/discriminators/patch_disc.py:12-82
  (70x70 PatchGAN: 3 strided conv blocks + 1 + output conv).

These serve the pix2pix/CycleGAN synthesizer capability of the mmediting
fork; training runs on the existing GAN step machinery (train/gan.py).
Layout NHWC, [-1, 1] images (tanh heads).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ResnetGenerator", "UnetGenerator", "PatchDiscriminator"]


def _instance_norm(x, eps=1e-5):
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class _ResBlock(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3), padding="VALID", name="conv1")(
            _reflect_pad(x, 1)
        )
        y = nn.relu(_instance_norm(y))
        y = nn.Conv(self.channels, (3, 3), padding="VALID", name="conv2")(
            _reflect_pad(y, 1)
        )
        return x + _instance_norm(y)


class ResnetGenerator(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    base_channels: int = 64
    num_blocks: int = 9

    @nn.compact
    def __call__(self, x):
        c = self.base_channels
        y = nn.Conv(c, (7, 7), padding="VALID", name="conv_in")(_reflect_pad(x, 3))
        y = nn.relu(_instance_norm(y))
        for i, mult in enumerate((2, 4)):
            y = nn.Conv(c * mult, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"down{i}")(y)
            y = nn.relu(_instance_norm(y))
        for i in range(self.num_blocks):
            y = _ResBlock(c * 4, name=f"block{i}")(y)
        for i, mult in enumerate((2, 1)):
            y = nn.ConvTranspose(c * mult, (3, 3), strides=(2, 2), padding="SAME",
                                 name=f"up{i}")(y)
            y = nn.relu(_instance_norm(y))
        y = nn.Conv(self.out_channels, (7, 7), padding="VALID",
                    name="conv_out")(_reflect_pad(y, 3))
        return nn.tanh(y)


class _UnetBlock(nn.Module):
    outer_channels: int
    inner_channels: int
    innermost: bool = False
    outermost: bool = False
    submodule: nn.Module = None

    @nn.compact
    def __call__(self, x):
        down = nn.Conv(self.inner_channels, (4, 4), strides=(2, 2),
                       padding="SAME", name="down")(
            x if self.outermost else nn.leaky_relu(x, 0.2)
        )
        if not self.outermost and not self.innermost:
            down = _instance_norm(down)
        mid = down if self.innermost else self.submodule(down)
        up = nn.ConvTranspose(self.outer_channels, (4, 4), strides=(2, 2),
                              padding="SAME", name="up")(nn.relu(mid))
        if self.outermost:
            return nn.tanh(up)
        up = _instance_norm(up)
        return jnp.concatenate([x, up], axis=-1)


class UnetGenerator(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    num_down: int = 8
    base_channels: int = 64

    @nn.compact
    def __call__(self, x):
        c = self.base_channels
        block = _UnetBlock(c * 8, c * 8, innermost=True, name="inner")
        for i in range(self.num_down - 5):
            block = _UnetBlock(c * 8, c * 8, submodule=block, name=f"mid{i}")
        for i, mult in enumerate((4, 2, 1)):
            block = _UnetBlock(c * mult, c * mult * 2, submodule=block,
                               name=f"up{i}")
        block = _UnetBlock(self.out_channels, c, submodule=block,
                           outermost=True, name="outer")
        return block(x)


class PatchDiscriminator(nn.Module):
    """70x70 PatchGAN (patch_disc.py:12-82); returns the patch logits and
    intermediate features (feature-matching-compatible)."""

    in_channels: int = 3
    base_channels: int = 64
    num_conv: int = 3

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        y = nn.leaky_relu(
            nn.Conv(self.base_channels, (4, 4), strides=(2, 2), padding="SAME",
                    name="conv0")(x), 0.2)
        feats.append(y)
        mult = 1
        for i in range(1, self.num_conv):
            mult = min(2 ** i, 8)
            y = nn.Conv(self.base_channels * mult, (4, 4), strides=(2, 2),
                        padding="SAME", name=f"conv{i}")(y)
            y = nn.leaky_relu(_instance_norm(y), 0.2)
            feats.append(y)
        mult = min(2 ** self.num_conv, 8)
        y = nn.Conv(self.base_channels * mult, (4, 4), padding="SAME",
                    name=f"conv{self.num_conv}")(y)
        y = nn.leaky_relu(_instance_norm(y), 0.2)
        feats.append(y)
        pred = nn.Conv(1, (4, 4), padding="SAME", name="conv_out")(y)
        return {"prediction": pred, "feature_maps": feats}
