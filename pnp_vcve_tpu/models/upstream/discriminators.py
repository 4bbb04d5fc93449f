"""Discriminator components (reference
mmedit/models/components/discriminators/): LightCNN (DIC-GAN),
DeepFillv1 global+local pair, MultiLayerDiscriminator (GL / DeepFill /
matting aux), SoftMaskPatchDiscriminator, TTSRDiscriminator, ModifiedVGG
(SRGAN/ESRGAN). NHWC flax rewrites; spectral norm via flax
``nn.SpectralNorm`` (power iteration, stats in ``batch_stats``).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "LightCNN",
    "DeepFillv1Discriminators",
    "MultiLayerDiscriminator",
    "SoftMaskPatchDiscriminator",
    "TTSRDiscriminator",
    "ModifiedVGG",
]


class MaxFeature(nn.Module):
    """Max-feature-map conv/linear (light_cnn.py:10-62): double the
    channels, take the elementwise max of the halves."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    filter_type: str = "conv2d"

    @nn.compact
    def __call__(self, x):
        if self.filter_type == "conv2d":
            y = nn.Conv(
                2 * self.out_channels,
                (self.kernel_size, self.kernel_size),
                strides=(self.stride, self.stride),
                padding="SAME",
                name="filter",
            )(x)
        else:
            y = nn.Dense(2 * self.out_channels, name="filter")(x)
        a, b = jnp.split(y, 2, axis=-1)
        return jnp.maximum(a, b)


def _maxpool_ceil(x):
    """2x2/2 max pool with ceil_mode=True (light_cnn.py:80-93)."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = h % 2, w % 2
    if ph or pw:
        x = jnp.pad(
            x, ((0, 0), (0, ph), (0, pw), (0, 0)),
            constant_values=-jnp.inf,
        )
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class LightCNN(nn.Module):
    """LightCNN discriminator for 128x128 inputs (light_cnn.py:64-126,
    trains DICGAN)."""

    in_channels: int = 3

    @nn.compact
    def __call__(self, x):
        specs = [
            (48, 5, "mf0"), ("pool",), (48, 1, "mf1"), (96, 3, "mf2"),
            ("pool",), (96, 1, "mf3"), (192, 3, "mf4"), ("pool",),
            (192, 1, "mf5"), (128, 3, "mf6"), (128, 1, "mf7"),
            (128, 3, "mf8"), ("pool",),
        ]
        for spec in specs:
            if spec[0] == "pool":
                x = _maxpool_ceil(x)
            else:
                ch, k, name = spec
                x = MaxFeature(ch, k, name=name)(x)
        x = x.reshape(x.shape[0], -1)
        x = MaxFeature(256, filter_type="linear", name="fc0")(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, name="fc1")(x)


class MultiLayerDiscriminator(nn.Module):
    """Stacked stride-2 convs (+ optional out convs / fc head)
    (multi_layer_disc.py:11-169)."""

    in_channels: int = 3
    max_channels: int = 256
    num_convs: int = 5
    fc_in_channels: Optional[int] = None
    fc_out_channels: int = 1024
    kernel_size: int = 5
    with_input_norm: bool = True
    with_out_convs: bool = False
    with_spectral_norm: bool = False
    norm: Optional[str] = None  # None | 'bn'
    act: str = "relu"
    out_act: Optional[str] = "relu"

    def _act(self, x, kind):
        if kind == "relu":
            return nn.relu(x)
        if kind == "leaky_relu":
            return nn.leaky_relu(x, 0.2)
        return x

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size

        def conv(ch, stride, name):
            c = nn.Conv(ch, (k, k), strides=(stride, stride), padding="SAME",
                        name=name)
            if self.with_spectral_norm:
                c = nn.SpectralNorm(c)
            return c

        def apply_conv(c, h):
            return c(h, update_stats=train) if self.with_spectral_norm else c(h)

        for i in range(self.num_convs):
            ch = min(64 * 2 ** i, self.max_channels)
            use_norm = self.norm == "bn"
            act = self.act
            if i == 0 and not self.with_input_norm:
                use_norm = False
            elif (i == self.num_convs - 1 and self.fc_in_channels is None
                  and not self.with_out_convs):
                use_norm = False
                act = self.out_act
            x = apply_conv(conv(ch, 2, f"conv{i + 1}"), x)
            if use_norm:
                x = nn.BatchNorm(use_running_average=not train,
                                 name=f"bn{i + 1}")(x)
            x = self._act(x, act)

        if self.with_out_convs:
            ch = min(64 * 2 ** self.num_convs, self.max_channels)
            x = apply_conv(conv(ch, 1, f"conv{self.num_convs + 1}"), x)
            x = self._act(x, self.act)
            x = apply_conv(conv(1, 1, f"conv{self.num_convs + 2}"), x)

        if self.fc_in_channels is not None:
            x = x.reshape(x.shape[0], -1)
            x = nn.Dense(self.fc_out_channels, name="fc")(x)
            x = self._act(x, self.out_act)
        return x


class DeepFillv1Discriminators(nn.Module):
    """Independent global + local discriminators (deepfill_disc.py:11-69);
    input is a (global_img, local_patch) pair."""

    fc_in_global: int = 16384
    fc_in_local: int = 8192

    @nn.compact
    def __call__(self, x, train: bool = False):
        global_img, local_img = x
        g = MultiLayerDiscriminator(
            in_channels=3, max_channels=256, num_convs=4,
            fc_in_channels=self.fc_in_global, fc_out_channels=1,
            with_input_norm=False, out_act="leaky_relu", act="leaky_relu",
            name="global_disc",
        )(global_img, train)
        l = MultiLayerDiscriminator(
            in_channels=3, max_channels=512, num_convs=4,
            fc_in_channels=self.fc_in_local, fc_out_channels=1,
            with_input_norm=False, out_act="leaky_relu", act="leaky_relu",
            name="local_disc",
        )(local_img, train)
        return g, l


class SoftMaskPatchDiscriminator(nn.Module):
    """PatchGAN with optional spectral norm (smpatch_disc.py:9-133)."""

    in_channels: int = 3
    base_channels: int = 64
    num_conv: int = 3
    with_spectral_norm: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def conv(ch, stride, name, bias=False):
            c = nn.Conv(ch, (4, 4), strides=(stride, stride),
                        padding=((1, 1), (1, 1)), use_bias=bias, name=name)
            if self.with_spectral_norm:
                c = nn.SpectralNorm(c)
            return c

        def apply_conv(c, h):
            return c(h, update_stats=train) if self.with_spectral_norm else c(h)

        x = nn.leaky_relu(apply_conv(conv(self.base_channels, 2, "conv0"), x), 0.2)
        mult = 1
        for n in range(1, self.num_conv):
            mult = min(2 ** n, 8)
            x = nn.leaky_relu(
                apply_conv(conv(self.base_channels * mult, 2, f"conv{n}"), x), 0.2
            )
        mult = min(2 ** self.num_conv, 8)
        x = nn.leaky_relu(
            apply_conv(conv(self.base_channels * mult, 1, "conv_last"), x), 0.2
        )
        return nn.Conv(1, (4, 4), padding=((1, 1), (1, 1)), name="out")(x)


class TTSRDiscriminator(nn.Module):
    """10-conv + 2-fc discriminator for TTSR-GAN (ttsr_disc.py:9-67)."""

    in_channels: int = 3
    in_size: int = 160

    @nn.compact
    def __call__(self, x):
        chans = (32, 32, 64, 64, 128, 128, 256, 256, 512, 512)
        for i, ch in enumerate(chans):
            stride = 2 if i % 2 else 1
            x = nn.leaky_relu(
                nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME",
                        name=f"conv{i}")(x),
                0.2,
            )
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(nn.Dense(1024, name="fc0")(x), 0.2)
        return nn.Dense(1, name="fc1")(x)


class ModifiedVGG(nn.Module):
    """VGG-style 128x128 discriminator for SRGAN/ESRGAN
    (modified_vgg.py:9-118): five conv(3x3 s1)+conv(4x4 s2) stages with BN
    (except the very first conv), then 100-dim + 1-dim linears."""

    in_channels: int = 3
    mid_channels: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.mid_channels

        def block(h, ch, stage, first=False):
            h0 = nn.Conv(ch, (3, 3), padding="SAME", use_bias=first,
                         name=f"conv{stage}_0")(h)
            if not first:
                h0 = nn.BatchNorm(use_running_average=not train,
                                  name=f"bn{stage}_0")(h0)
            h0 = nn.leaky_relu(h0, 0.2)
            h1 = nn.Conv(ch, (4, 4), strides=(2, 2),
                         padding=((1, 1), (1, 1)), use_bias=False,
                         name=f"conv{stage}_1")(h0)
            h1 = nn.BatchNorm(use_running_average=not train,
                              name=f"bn{stage}_1")(h1)
            return nn.leaky_relu(h1, 0.2)

        x = block(x, c, 0, first=True)
        x = block(x, c * 2, 1)
        x = block(x, c * 4, 2)
        x = block(x, c * 8, 3)
        x = block(x, c * 8, 4)
        x = x.reshape(x.shape[0], -1)
        x = nn.leaky_relu(nn.Dense(100, name="linear1")(x), 0.2)
        return nn.Dense(1, name="linear2")(x)
