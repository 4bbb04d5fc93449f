"""MW-GAN (multi-level wavelet GAN) PSNR generator.

Reference: mmedit/models/backbones/sr_backbones/mwgan.py:764-880
(``DenseMWNet_Mini_PSNR``): wavelet-domain multi-frame enhancement — DWT-CNN
downsamplers, a pyramid aligner built on pixel-adaptive convs (MWP_Align,
mwgan.py:161-235), residual-dense wavelet blocks (WDRB_Mini), and IWT-CNN
upsampling, residual to the center frame. Haar DWT/IWT in ops/wavelet.py,
PAC in ops/pac.py.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnp_vcve_tpu.ops.wavelet import dwt, iwt
from pnp_vcve_tpu.ops.pac import pac_conv2d
from pnp_vcve_tpu.ops.resize import resize_bilinear
from pnp_vcve_tpu.models.init import torch_conv_default, torch_conv_bias_default

__all__ = ["DenseMWNetMiniPSNR"]


def _lrelu(x, s=0.2):
    return nn.leaky_relu(x, s)


class _DWTCNN(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        return _lrelu(nn.Conv(self.ch, (1, 1), name="conv")(dwt(x)), 0.1)


class _IWTCNN(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        return _lrelu(nn.Conv(self.ch, (1, 1), name="conv")(iwt(x)), 0.1)


class _RDB5C(nn.Module):
    """Residual dense block (mwgan.py:237-258)."""

    nf: int
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        feats = [x]
        for i in range(4):
            y = _lrelu(nn.Conv(self.gc, (3, 3), padding="SAME", name=f"conv{i + 1}")(
                jnp.concatenate(feats, -1)))
            feats.append(y)
        out = nn.Conv(self.nf, (3, 3), padding="SAME", name="conv5")(
            jnp.concatenate(feats, -1)
        )
        return out * 0.2 + x


class _WDRBMini(nn.Module):
    """Wavelet-domain residual-in-residual dense block (mwgan.py:278-298)."""

    nf: int
    gc: int = 32

    @nn.compact
    def __call__(self, x):
        y = _DWTCNN(self.nf, name="dwt")(x)
        for i in range(3):
            y = _RDB5C(self.nf, self.gc, name=f"RDB{i + 1}")(y)
        y = _IWTCNN(self.nf, name="iwt")(y)
        return y * 0.2 + x


class _PacPack(nn.Module):
    """PacConv2d parameter holder."""

    nf: int

    @nn.compact
    def __call__(self, x, guide):
        kernel = self.param("weight", torch_conv_default, (3, 3, x.shape[-1], self.nf))
        bias = self.param("bias", torch_conv_bias_default(9 * x.shape[-1]), (self.nf,))
        return pac_conv2d(x, guide, kernel, bias)


class MWPAlign(nn.Module):
    """Pyramid cascading alignment with PAC (mwgan.py:161-235)."""

    nf: int = 64

    @nn.compact
    def __call__(self, nbr, ref):
        c = self.nf
        conv = lambda name: nn.Conv(c, (3, 3), padding="SAME", name=name)  # noqa: E731

        l3_off = _lrelu(conv("L3_offset_conv1")(jnp.concatenate([nbr[2], ref[2]], -1)), 0.1)
        l3_off = _lrelu(conv("L3_offset_conv2")(l3_off), 0.1)
        l3_fea = _lrelu(_PacPack(c, name="L3_pcnpack")(nbr[2], l3_off), 0.1)

        l2_off = _lrelu(conv("L2_offset_conv1")(jnp.concatenate([nbr[1], ref[1]], -1)), 0.1)
        l3_off_up = resize_bilinear(l3_off, (l2_off.shape[1], l2_off.shape[2]))
        l2_off = _lrelu(conv("L2_offset_conv2")(
            jnp.concatenate([l2_off, l3_off_up * 2], -1)), 0.1)
        l2_off = _lrelu(conv("L2_offset_conv3")(l2_off), 0.1)
        l2_fea = _PacPack(c, name="L2_pcnpack")(nbr[1], l2_off)
        l3_fea_up = resize_bilinear(l3_fea, (l2_fea.shape[1], l2_fea.shape[2]))
        l2_fea = _lrelu(conv("L2_fea_conv")(
            jnp.concatenate([l2_fea, l3_fea_up], -1)), 0.1)

        l1_off = _lrelu(conv("L1_offset_conv1")(jnp.concatenate([nbr[0], ref[0]], -1)), 0.1)
        l2_off_up = resize_bilinear(l2_off, (l1_off.shape[1], l1_off.shape[2]))
        l1_off = _lrelu(conv("L1_offset_conv2")(
            jnp.concatenate([l1_off, l2_off_up * 2], -1)), 0.1)
        l1_off = _lrelu(conv("L1_offset_conv3")(l1_off), 0.1)
        l1_fea = _PacPack(c, name="L1_pcnpack")(nbr[0], l1_off)
        l2_fea_up = resize_bilinear(l2_fea, (l1_fea.shape[1], l1_fea.shape[2]))
        l1_fea = conv("L1_fea_conv")(jnp.concatenate([l1_fea, l2_fea_up], -1))

        off = _lrelu(conv("cas_offset_conv1")(jnp.concatenate([l1_fea, ref[0]], -1)), 0.1)
        off = _lrelu(conv("cas_offset_conv2")(off), 0.1)
        return _lrelu(_PacPack(c, name="cas_pcnpack")(l1_fea, off), 0.1)


class _MultiExtFea(nn.Module):
    """Multi-kernel-size extraction (mwgan.py:341-370; note the reference
    applies conv1 twice — its conv0 is effectively unused — replicated)."""

    nf: int

    @nn.compact
    def __call__(self, x):
        c1 = nn.Conv(self.nf, (3, 3), padding="SAME", name="conv1")
        x0 = _lrelu(c1(x))
        x1 = _lrelu(c1(x))
        x2 = _lrelu(nn.Conv(self.nf, (5, 5), padding="SAME", name="conv2")(x))
        x3 = _lrelu(nn.Conv(self.nf, (7, 7), padding="SAME", name="conv3")(x))
        return nn.Conv(self.nf, (3, 3), padding="SAME", name="conv_out")(
            jnp.concatenate([x0, x1, x2, x3], -1)
        )


class DenseMWNetMiniPSNR(nn.Module):
    """5-frame wavelet-domain enhancement, same-size output
    (mwgan.py:764-880). Inputs must be divisible by 16 (the reference
    replicate-pads at eval; we require it upfront)."""

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 6
    nframes: int = 5
    front_rbs: int = 3
    gc: int = 32

    @nn.compact
    def __call__(self, lrs, **_ignored):
        b, n, h, w, c = lrs.shape
        nf = self.nf
        center = self.nframes // 2
        x_center = lrs[:, center]

        y = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv_first_1")(
            lrs.reshape(b * n, h, w, c)), 0.1)
        dwt1 = _DWTCNN(nf, name="DWT_1")
        y = dwt1(y)
        y = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv_first_2")(y), 0.1)
        y = dwt1(y)  # reference reuses DWT_1 twice (mwgan.py:833-836)
        y = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="conv_first_3")(y), 0.1)
        hh, ww = h // 4, w // 4

        y = _MultiExtFea(nf, name="multi_fea_l1")(y)
        for i in range(self.front_rbs):
            r = nn.relu(nn.Conv(nf, (3, 3), padding="SAME", name=f"fe{i}_conv1")(y))
            y = y + nn.Conv(nf, (3, 3), padding="SAME", name=f"fe{i}_conv2")(r)

        l2 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="fea_L2_conv1")(
            _DWTCNN(nf, name="DWT_3")(y)), 0.1)
        l2 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="fea_L2_conv2")(l2), 0.1)
        l3 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="fea_L3_conv1")(
            _DWTCNN(nf, name="DWT_4")(l2)), 0.1)
        l3 = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="fea_L3_conv2")(l3), 0.1)

        l1 = y.reshape(b, n, hh, ww, nf)
        l2 = l2.reshape(b, n, hh // 2, ww // 2, nf)
        l3 = l3.reshape(b, n, hh // 4, ww // 4, nf)

        ref = [l1[:, center], l2[:, center], l3[:, center]]
        align = MWPAlign(nf, name="motion_align")
        aligned = [
            align([l1[:, i], l2[:, i], l3[:, i]], ref) for i in range(n)
        ]
        fea = nn.Conv(nf, (1, 1), name="attention_fusion")(
            jnp.concatenate(aligned, -1)
        )

        for i in range(self.nb):
            fea = _WDRBMini(nf, self.gc, name=f"WDRB{i}")(fea)

        out = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="upconv1")(
            _IWTCNN(nf, name="IWT_1")(fea)), 0.1)
        out = _lrelu(nn.Conv(nf, (3, 3), padding="SAME", name="upconv2")(
            _IWTCNN(nf, name="IWT_2")(out)), 0.1)
        out = nn.Conv(self.out_nc, (3, 3), padding="SAME", name="conv_last")(out)
        return out + x_center
