"""StyleGAN2 synthesizer (generator + discriminator).

Reference surface: mmedit/models/components/stylegan2/
generator_discriminator.py + modules.py (imported by the GLEAN backbone and
the synthesizer zoo). The reference links mmcv's CUDA
``fused_bias_leakyrelu`` / ``upfirdn2d``; here those are the plain-XLA ops
of :mod:`pnp_vcve_tpu.ops.stylegan2`.

Faithful components: 8-layer mapping MLP (lr_mult 0.01), constant input,
modulated/demodulated style convs with noise injection, blur-filtered
up-convs ([1,3,3,1] FIR), ToRGB skip accumulation, and the discriminator's
blurred down-convs + minibatch-stddev head. Layout NHWC, latent (b, 512).
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pnp_vcve_tpu.ops.stylegan2 import (
    fused_bias_leakyrelu,
    make_resample_kernel,
    upfirdn2d,
)

__all__ = ["StyleGAN2Generator", "StyleGAN2Discriminator"]

_BLUR = make_resample_kernel([1, 3, 3, 1])


class _EqualLinear(nn.Module):
    out_features: int
    lr_mult: float = 1.0
    use_act: bool = False

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        w = self.param(
            "weight", nn.initializers.normal(1.0 / self.lr_mult),
            (in_f, self.out_features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.out_features,))
        scale = (1.0 / math.sqrt(in_f)) * self.lr_mult
        y = x @ (w * scale) + b * self.lr_mult
        if self.use_act:
            y = jax.nn.leaky_relu(y, 0.2) * math.sqrt(2)
        return y


class _ModulatedConv(nn.Module):
    out_channels: int
    kernel_size: int = 3
    demodulate: bool = True
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style):
        b, h, w_, cin = x.shape
        k = self.kernel_size
        weight = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, cin, self.out_channels)
        )
        scale = 1.0 / math.sqrt(cin * k * k)
        s = _EqualLinear(cin, name="modulation")(style) + 1.0  # (b, cin)
        w = weight[None] * scale * s[:, None, None, :, None]  # (b,k,k,cin,cout)
        if self.demodulate:
            demod = jax.lax.rsqrt(jnp.sum(w**2, axis=(1, 2, 3)) + 1e-8)
            w = w * demod[:, None, None, None, :]

        if self.upsample:
            x = jnp.zeros((b, h, 2, w_, 2, cin), x.dtype).at[:, :, 0, :, 0, :].set(x)
            x = x.reshape(b, h * 2, w_ * 2, cin)

        def one(xi, wi):
            return jax.lax.conv_general_dilated(
                xi[None], wi, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0]

        out = jax.vmap(one)(x, w)
        if self.upsample:
            out = upfirdn2d(out, _BLUR * 4.0, pad=(2, 1))
        return out


class _StyleConv(nn.Module):
    out_channels: int
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style, noise_rng=None):
        y = _ModulatedConv(self.out_channels, upsample=self.upsample,
                           name="conv")(x, style)
        noise_w = self.param("noise_weight", nn.initializers.zeros, ())
        if noise_rng is not None:
            noise = jax.random.normal(noise_rng, y.shape[:3] + (1,), y.dtype)
            y = y + noise_w * noise
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
        return fused_bias_leakyrelu(y, bias)


class _ToRGB(nn.Module):
    upsample_skip: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        y = _ModulatedConv(3, kernel_size=1, demodulate=False, name="conv")(x, style)
        y = y + self.param("bias", nn.initializers.zeros, (3,))
        if skip is not None:
            skip = upfirdn2d(skip, _BLUR * 4.0, up=2, pad=(2, 1))
            y = y + skip
        return y


class StyleGAN2Generator(nn.Module):
    out_size: int = 64
    style_channels: int = 512
    base_channels: int = 512
    max_channels: int = 512
    channel_multiplier: int = 2
    num_mlps: int = 8

    def _channels(self, log_size):
        table = {4: 512, 8: 512, 16: 512, 32: 512,
                 64: 256 * self.channel_multiplier // 2,
                 128: 128 * self.channel_multiplier // 2,
                 256: 64 * self.channel_multiplier // 2,
                 512: 32 * self.channel_multiplier // 2,
                 1024: 16 * self.channel_multiplier // 2}
        return min(table[2 ** log_size], self.max_channels)

    @nn.compact
    def __call__(self, z, noise_seed: int = 0, return_latents: bool = False):
        b = z.shape[0]
        # mapping network with pixel norm
        w = z * jax.lax.rsqrt(jnp.mean(z**2, axis=-1, keepdims=True) + 1e-8)
        for i in range(self.num_mlps):
            w = _EqualLinear(self.style_channels, lr_mult=0.01, use_act=True,
                             name=f"mlp{i}")(w)

        log_size = int(math.log2(self.out_size))
        rng = jax.random.PRNGKey(noise_seed)

        c0 = self._channels(2)
        const = self.param(
            "constant_input", nn.initializers.normal(1.0), (1, 4, 4, c0)
        )
        x = jnp.broadcast_to(const, (b, 4, 4, c0))
        rng, k = jax.random.split(rng)
        x = _StyleConv(c0, name="conv1")(x, w, k)
        skip = _ToRGB(name="to_rgb1")(x, w)

        for ls in range(3, log_size + 1):
            ch = self._channels(ls)
            sz = 2 ** ls
            rng, k1, k2 = jax.random.split(rng, 3)
            x = _StyleConv(ch, upsample=True, name=f"conv_up_{sz}")(x, w, k1)
            x = _StyleConv(ch, name=f"conv_{sz}")(x, w, k2)
            skip = _ToRGB(name=f"to_rgb_{sz}")(x, w, skip)
        img = skip
        if return_latents:
            return img, w
        return img


class StyleGAN2Discriminator(nn.Module):
    in_size: int = 64
    channel_multiplier: int = 2
    max_channels: int = 512

    def _channels(self, size):
        table = {4: 512, 8: 512, 16: 512, 32: 512,
                 64: 256 * self.channel_multiplier // 2,
                 128: 128 * self.channel_multiplier // 2,
                 256: 64 * self.channel_multiplier // 2,
                 512: 32 * self.channel_multiplier // 2,
                 1024: 16 * self.channel_multiplier // 2}
        return min(table[size], self.max_channels)

    @nn.compact
    def __call__(self, img):
        b = img.shape[0]
        size = self.in_size
        x = fused_bias_leakyrelu(
            nn.Conv(self._channels(size), (1, 1), use_bias=False,
                    name="conv_in")(img),
            self.param("bias_in", nn.initializers.zeros, (self._channels(size),)),
        )
        while size > 4:
            ch = self._channels(size // 2)
            # residual down block: conv, blurred stride-2 conv, skip
            y = fused_bias_leakyrelu(
                nn.Conv(x.shape[-1], (3, 3), padding="SAME", use_bias=False,
                        name=f"b{size}_conv1")(x),
                self.param(f"b{size}_bias1", nn.initializers.zeros, (x.shape[-1],)),
            )
            y = upfirdn2d(y, _BLUR, pad=(2, 1))
            y = fused_bias_leakyrelu(
                nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                        use_bias=False, name=f"b{size}_conv2")(y),
                self.param(f"b{size}_bias2", nn.initializers.zeros, (ch,)),
            )
            skip = upfirdn2d(x, _BLUR, pad=(2, 1))
            skip = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                           use_bias=False, name=f"b{size}_skip")(skip)
            x = (y + skip) / math.sqrt(2)
            size //= 2
        # minibatch stddev
        std = jnp.sqrt(jnp.var(x, axis=0) + 1e-8).mean()
        x = jnp.concatenate(
            [x, jnp.full(x.shape[:3] + (1,), std, x.dtype)], axis=-1
        )
        x = fused_bias_leakyrelu(
            nn.Conv(self._channels(4), (3, 3), padding="SAME", use_bias=False,
                    name="final_conv")(x),
            self.param("final_bias", nn.initializers.zeros, (self._channels(4),)),
        )
        x = x.reshape(b, -1)
        x = _EqualLinear(self._channels(4), use_act=True, name="final_linear1")(x)
        return _EqualLinear(1, name="final_linear2")(x)
