"""GLEAN: latent-bank super-resolution on a StyleGAN2 generator.

Reference surface: mmedit/models/backbones/sr_backbones/
glean_styleganv2.py:15-290 (``GLEANStyleGANv2``):

- encoder: RRDB feature extractor at ``in_size``, then strided conv blocks
  down to 4x4, a final linear producing the per-layer latent codes;
- generator pass: the StyleGAN2 synthesis chain from 4x4 to ``out_size``
  with encoder features FUSED into both the feature and the RGB-skip
  streams at every resolution <= in_size (fusion convs), collecting
  generator features above in_size;
- decoder: PixelShufflePack chain from in_size to out_size, concatenating
  the collected generator features per resolution, ending in a conv head.

Built from this repo's StyleGAN2 components (_StyleConv/_ToRGB on the
native fused ops) and the RRDB blocks of the SISR zoo. Per-layer latents
(the reference splits a (num_styles, C) code) are produced by the encoder
linear; this port feeds each synthesis layer its own code slice just as the
reference does. Layout NHWC.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.models.baselines.sisr import _RRDB
from pnp_vcve_tpu.models.upstream.stylegan2 import _StyleConv, _ToRGB
from pnp_vcve_tpu.ops.upsample import pixel_shuffle

__all__ = ["GLEANStyleGANv2"]


class GLEANStyleGANv2(nn.Module):
    in_size: int = 32
    out_size: int = 128
    img_channels: int = 3
    rrdb_channels: int = 64
    num_rrdbs: int = 4
    style_channels: int = 512
    max_channels: int = 512
    channel_multiplier: int = 2

    def _channels(self, size):
        table = {4: 512, 8: 512, 16: 512, 32: 512,
                 64: 256 * self.channel_multiplier // 2,
                 128: 128 * self.channel_multiplier // 2,
                 256: 64 * self.channel_multiplier // 2,
                 512: 32 * self.channel_multiplier // 2,
                 1024: 16 * self.channel_multiplier // 2}
        return min(table[size], self.max_channels)

    @nn.compact
    def __call__(self, lq, noise_seed: int = 0):
        b, h, w, _ = lq.shape
        if h != self.in_size or w != self.in_size:
            raise ValueError(f"GLEAN expects {self.in_size}px inputs, got {h}x{w}")
        num_styles = int(math.log2(self.out_size)) * 2 - 2

        # ---- encoder (glean_styleganv2.py:138-162)
        feat = lq
        feat = nn.Conv(self.rrdb_channels, (3, 3), padding="SAME",
                       name="rrdb_first")(feat)
        body = feat
        for i in range(self.num_rrdbs):
            body = _RRDB(self.rrdb_channels, self.rrdb_channels // 2,
                         name=f"rrdb{i}")(body)
        feat = feat + nn.Conv(self.rrdb_channels, (3, 3), padding="SAME",
                              name="rrdb_body")(body)
        feat = nn.leaky_relu(
            nn.Conv(self._channels(self.in_size), (3, 3), padding="SAME",
                    name="enc_in")(feat), 0.2)
        encoder_features = [feat]
        res = self.in_size
        while res > 4:
            ch = self._channels(res // 2)
            feat = nn.leaky_relu(
                nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"enc_down_{res}")(feat), 0.2)
            feat = nn.leaky_relu(
                nn.Conv(ch, (3, 3), padding="SAME", name=f"enc_conv_{res}")(feat),
                0.2)
            encoder_features.append(feat)
            res //= 2
        flat = nn.leaky_relu(
            nn.Conv(self._channels(4), (3, 3), padding="SAME",
                    name="enc_final_conv")(feat), 0.2).reshape(b, -1)
        latents = nn.Dense(num_styles * self.style_channels,
                           name="enc_latent")(flat)
        latents = latents.reshape(b, num_styles, self.style_channels)
        # fusion consumes encoder feats from deepest (4x4) upward
        encoder_features = encoder_features[::-1]

        # ---- generator pass with fusion (glean_styleganv2.py:230-262)
        rng = jax.random.PRNGKey(noise_seed)
        c0 = self._channels(4)
        const = self.param("constant_input", nn.initializers.normal(1.0),
                           (1, 4, 4, c0))
        out = jnp.broadcast_to(const, (b, 4, 4, c0))
        rng, k = jax.random.split(rng)
        out = _StyleConv(c0, name="g_conv1")(out, latents[:, 0], k)
        skip = _ToRGB(name="g_to_rgb1")(out, latents[:, 1])

        idx = 1
        generator_features = []
        fusion_i = 0
        for ls in range(3, int(math.log2(self.out_size)) + 1):
            size = 2 ** ls
            if out.shape[1] <= self.in_size:
                enc = encoder_features[fusion_i]
                out = nn.Conv(out.shape[-1], (3, 3), padding="SAME",
                              name=f"fusion_out_{out.shape[1]}")(
                    jnp.concatenate([out, enc], axis=-1))
                skip = nn.Conv(self.img_channels, (3, 3), padding="SAME",
                               name=f"fusion_skip_{out.shape[1]}")(
                    jnp.concatenate([skip, enc], axis=-1))
                fusion_i += 1
            ch = self._channels(size)
            rng, k1, k2 = jax.random.split(rng, 3)
            out = _StyleConv(ch, upsample=True, name=f"g_conv_up_{size}")(
                out, latents[:, idx], k1)
            out = _StyleConv(ch, name=f"g_conv_{size}")(out, latents[:, idx + 1], k2)
            skip = _ToRGB(name=f"g_to_rgb_{size}")(out, latents[:, idx + 2], skip)
            if out.shape[1] > self.in_size:
                generator_features.append(out)
            idx += 2

        # ---- decoder (glean_styleganv2.py:178-268)
        hr = encoder_features[-1]  # the in_size-resolution encoder feature
        res = self.in_size
        i = 0
        while res < self.out_size:
            ch = self._channels(res * 2)
            if i > 0:
                hr = jnp.concatenate([hr, generator_features[i - 1]], axis=-1)
            hr = pixel_shuffle(
                nn.Conv(ch * 4, (3, 3), padding="SAME", name=f"dec_up_{res}")(hr),
                2,
            )
            res *= 2
            i += 1
        hr = jnp.concatenate([hr, generator_features[i - 1]], axis=-1)
        hr = nn.leaky_relu(
            nn.Conv(64, (3, 3), padding="SAME", name="dec_conv")(hr), 0.2)
        return nn.Conv(self.img_channels, (3, 3), padding="SAME",
                       name="dec_out")(hr)
