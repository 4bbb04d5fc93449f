"""Inpainting backbone (Global&Local family).

Reference surface: mmedit/models/backbones/encoder_decoders/
gl_encoder_decoder.py:11-56 with GLEncoder (encoders/gl_encoder.py:9-54:
six convs, channels 64/128/128/256/256/256, strides 1/2/1/2/1/1, 4-channel
masked-image+mask input), GLDilationNeck (necks/gl_dilation.py: four
3x3 convs at dilations 2/4/8/16), and GLDecoder (decoders/gl_decoder.py:
two convs, two stride-2 deconvs with convs between, 3-channel clip head).

Layout NHWC; input = cat(masked_img [-1,1] or [0,1], mask), output clipped
to [-1, 1] like the reference's 'clip' out_act.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["GLEncoderDecoder"]


class GLEncoderDecoder(nn.Module):
    in_channels: int = 4
    mid_channels: int = 256

    @nn.compact
    def __call__(self, x):
        # encoder (gl_encoder.py:22-33)
        chans = (64, 128, 128, 256, 256, 256)
        ks = (5, 3, 3, 3, 3, 3)
        strides = (1, 2, 1, 2, 1, 1)
        y = x
        for i, (c, k, s) in enumerate(zip(chans, ks, strides)):
            y = nn.relu(
                nn.Conv(c, (k, k), strides=(s, s), padding="SAME",
                        name=f"enc{i + 1}")(y)
            )
        # dilation neck (gl_dilation.py: dilations 2,4,8,16)
        for i, d in enumerate((2, 4, 8, 16)):
            y = nn.relu(
                nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                        kernel_dilation=(d, d), name=f"dilation{i + 1}")(y)
            )
        # decoder (gl_decoder.py): conv, conv, deconv, conv, deconv, conv,
        # conv, out
        y = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="dec1")(y))
        y = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="dec2")(y))
        y = nn.relu(nn.ConvTranspose(128, (4, 4), strides=(2, 2),
                                     padding="SAME", name="dec3")(y))
        y = nn.relu(nn.Conv(128, (3, 3), padding="SAME", name="dec4")(y))
        y = nn.relu(nn.ConvTranspose(64, (4, 4), strides=(2, 2),
                                     padding="SAME", name="dec5")(y))
        y = nn.relu(nn.Conv(32, (3, 3), padding="SAME", name="dec6")(y))
        y = nn.Conv(3, (3, 3), padding="SAME", name="dec7")(y)
        return jnp.clip(y, -1.0, 1.0)
