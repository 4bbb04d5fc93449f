"""STDF baseline (spatio-temporal deformable fusion).

Reference: mmedit/models/backbones/sr_backbones/stdf.py:21-262 (itself from
ryanxingql/stdf-pytorch): a U-net over the stacked input window regresses
per-pixel offsets/masks for a modulated deformable conv that fuses all
frames at once, followed by a plain QE net, residual to the center frame.

TPU notes: the deformable fusion uses our gather-based DCNv2
(ops/deform_conv.py, deform_groups = stacked input channels); transposed
convs become flax ConvTranspose (stride-2, k=4). Layout NHWC; the window is
stacked into channels.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnp_vcve_tpu.ops.deform_conv import modulated_deform_conv2d
from pnp_vcve_tpu.ops.resize import resize_bilinear
from pnp_vcve_tpu.models.init import torch_conv_default, torch_conv_bias_default

__all__ = ["STDFNet"]


class _STDF(nn.Module):
    in_nc: int
    out_nc: int = 64
    nf: int = 32
    nb: int = 3
    deform_ks: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kk = self.deform_ks ** 2
        conv = lambda ch, name, s=1: nn.Conv(  # noqa: E731
            ch, (3, 3), strides=(s, s), padding="SAME", name=name
        )

        feat = nn.relu(conv(self.nf, "in_conv")(x))
        skips = [feat]
        for i in range(1, self.nb):
            y = nn.relu(conv(self.nf, f"dn_conv{i}_0", s=2)(skips[-1]))
            y = nn.relu(conv(self.nf, f"dn_conv{i}_1")(y))
            skips.append(y)

        out = nn.relu(conv(self.nf, "tr_conv_0", s=2)(skips[-1]))
        out = nn.relu(conv(self.nf, "tr_conv_1")(out))
        out = nn.relu(
            nn.ConvTranspose(self.nf, (4, 4), strides=(2, 2), padding="SAME",
                             name="tr_conv_up")(out)
        )

        for i in range(self.nb - 1, 0, -1):
            if out.shape[1:3] != skips[i].shape[1:3]:
                out = resize_bilinear(out, skips[i].shape[1:3])
            out = nn.relu(
                conv(self.nf, f"up_conv{i}_0")(
                    jnp.concatenate([out, skips[i]], axis=-1)
                )
            )
            out = nn.relu(
                nn.ConvTranspose(self.nf, (4, 4), strides=(2, 2), padding="SAME",
                                 name=f"up_conv{i}_up")(out)
            )

        out = nn.relu(conv(self.nf, "out_conv")(out))
        if out.shape[1:3] != x.shape[1:3]:
            out = resize_bilinear(out, x.shape[1:3])
        off_msk = nn.Conv(
            self.in_nc * 3 * kk, (3, 3), padding="SAME", name="offset_mask"
        )(out)

        b, h, w, _ = x.shape
        off = off_msk[..., : self.in_nc * 2 * kk].reshape(b, h, w, self.in_nc, kk, 2)
        msk = nn.sigmoid(
            off_msk[..., self.in_nc * 2 * kk :]
        ).reshape(b, h, w, self.in_nc, kk)

        kernel = self.param(
            "deform_kernel", torch_conv_default,
            (self.deform_ks, self.deform_ks, self.in_nc, self.out_nc),
        )
        bias = self.param(
            "deform_bias", torch_conv_bias_default(kk * self.in_nc), (self.out_nc,)
        )
        return nn.relu(modulated_deform_conv2d(x, off, msk, kernel, bias))


class _QENet(nn.Module):
    nf: int = 48
    nb: int = 6
    out_nc: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.Conv(self.nf, (3, 3), padding="SAME", name="in_conv")(x)
        for i in range(self.nb):
            out = nn.Conv(self.nf, (3, 3), padding="SAME", name=f"hid_conv{i}")(
                nn.relu(out)
            )
        return nn.Conv(self.out_nc, (3, 3), padding="SAME", name="out_conv")(
            nn.relu(out)
        )


class STDFNet(nn.Module):
    """Window of 2*radius+1 frames -> enhanced center frame."""

    in_channels: int = 3
    out_channels: int = 3
    radius: int = 3
    nf_stdf: int = 32
    nb_stdf: int = 3
    nf_stdf_out: int = 64
    deform_ks: int = 3
    nf_qe: int = 48
    nb_qe: int = 6

    @nn.compact
    def __call__(self, lrs: jnp.ndarray, **_ignored) -> jnp.ndarray:
        """lrs: (b, t, h, w, c) with t == 2*radius+1 -> (b, h, w, c)."""
        b, t, h, w, c = lrs.shape
        x = jnp.moveaxis(lrs, 1, 3).reshape(b, h, w, t * c)
        feat = _STDF(
            in_nc=t * c, out_nc=self.nf_stdf_out, nf=self.nf_stdf,
            nb=self.nb_stdf, deform_ks=self.deform_ks, name="stdf",
        )(x)
        out = _QENet(
            nf=self.nf_qe, nb=self.nb_qe, out_nc=self.out_channels, name="qenet"
        )(feat)
        return out + lrs[:, self.radius]
