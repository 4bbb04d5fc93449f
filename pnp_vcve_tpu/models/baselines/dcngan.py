"""DCNGAN baseline (deformable-alignment GAN enhancement).

Reference: mmedit/models/backbones/sr_backbones/dcngan.py — FA module
(U-net offset head + modulated-DCN fusion over a 3-frame window, same shape
as STDF's), a pix2pixHD-style QE generator whose 9 resblocks are gated by a
QP one-hot embedding (FiLM multiply), and a DCGAN-style discriminator that
also returns intermediate feature maps (for feature-matching losses).

Replicated quirks: the 'transposed convs' in the decoder are stride-1 after
an explicit x2 bilinear resize (dcngan.py:205-214), so they act as plain
3x3 convs; the QP conditioning one-hots ``int(base_qp)`` into 4 classes
(dcngan.py:189-196).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.ops.resize import resize_bilinear
from .stdf import _STDF

__all__ = ["DCNGANNet", "DCNGANDiscriminator"]


def _reflect_pad(x, p):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class _BatchStatsNorm(nn.Module):
    """Batch-statistics normalization with learned scale/bias.

    The reference uses nn.BatchNorm2d; in this adversarial training setup we
    normalize with the current batch statistics in both train and eval (no
    running averages) — the standard simplification for GAN generators,
    keeping the train step a pure function of params.
    """

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return y * scale + bias


class _QPResBlock(nn.Module):
    """conv -> *qp_embed -> BN -> relu -> conv -> BN -> +x (dcngan.py:219-271)."""

    dim: int

    @nn.compact
    def __call__(self, x, qp_embed, train: bool):
        y = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv1")(_reflect_pad(x, 1))
        y = y * qp_embed[:, None, None, :]
        y = nn.relu(_BatchStatsNorm(name="bn1")(y, train))
        y = nn.Conv(self.dim, (3, 3), padding="VALID", name="conv2")(_reflect_pad(y, 1))
        y = _BatchStatsNorm(name="bn2")(y, train)
        return x + y


class _QEModule(nn.Module):
    input_nc: int = 64
    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 3
    n_blocks: int = 9

    @nn.compact
    def __call__(self, x, base_qp, train: bool):
        b = x.shape[0]
        # QP conditioning: one-hot(4) -> Dense(512) + softplus (dcngan.py:164-167)
        qp = jax.nn.one_hot(jnp.clip(base_qp.astype(jnp.int32), 0, 3), 4)
        qp_embed = jax.nn.softplus(nn.Dense(512, name="fc")(qp))

        def bn(name):
            norm = _BatchStatsNorm(name=name)
            return lambda v: norm(v, train)

        y = nn.Conv(self.ngf, (7, 7), padding="VALID", name="head")(_reflect_pad(x, 3))
        y = nn.relu(bn("head_bn")(y))
        for i in range(self.n_downsampling):
            ch = self.ngf * 2 ** (i + 1)
            y = nn.Conv(ch, (3, 3), strides=(2, 2), padding="SAME", name=f"down{i}")(y)
            y = nn.relu(bn(f"down{i}_bn")(y))

        for i in range(self.n_blocks):
            y = _QPResBlock(self.ngf * 8, name=f"resB{i}")(y, qp_embed, train)

        # decoder: x2 bilinear resize then a stride-1 'transposed' conv
        for i, ch in enumerate((self.ngf * 4, self.ngf * 2, self.ngf)):
            y = resize_bilinear(y, (2 * y.shape[1], 2 * y.shape[2]))
            y = nn.Conv(ch, (3, 3), padding="SAME", name=f"up{i}")(y)
            y = nn.relu(bn(f"up{i}_bn")(y))

        y = nn.Conv(self.output_nc, (7, 7), padding="VALID", name="tail")(
            _reflect_pad(y, 3)
        )
        return nn.tanh(y)


class DCNGANNet(nn.Module):
    """3-frame window -> enhanced center frame (generator)."""

    in_channels: int = 3
    radius: int = 1
    nf_fa: int = 32
    nb_fa: int = 3

    @nn.compact
    def __call__(self, lrs, base_qps=None, train: bool = False, **_ignored):
        """lrs (b, 3, h, w, c); base_qps (b, t) -> (b, h, w, c)."""
        b, t, h, w, c = lrs.shape
        x = jnp.moveaxis(lrs, 1, 3).reshape(b, h, w, t * c)
        feat = _STDF(
            in_nc=t * c, out_nc=64, nf=self.nf_fa, nb=self.nb_fa, name="FA"
        )(x)
        base_qp = (
            base_qps[:, 0] if base_qps is not None else jnp.zeros((b,), jnp.float32)
        )
        return _QEModule(name="QE")(feat, base_qp, train)


class DCNGANDiscriminator(nn.Module):
    """DCGAN-style patch discriminator returning feature maps
    (dcngan.py:321-355)."""

    d: int = 128

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        y = nn.leaky_relu(
            nn.Conv(self.d, (4, 4), strides=(2, 2), padding="SAME", name="conv1")(x),
            0.2,
        )
        feats.append(y)
        for i, mult in enumerate((2, 4, 8)):
            y = nn.Conv(self.d * mult, (4, 4), strides=(2, 2), padding="SAME",
                        name=f"conv{i + 2}")(y)
            y = nn.leaky_relu(_BatchStatsNorm(name=f"bn{i + 2}")(y, train), 0.2)
            feats.append(y)
        pred = nn.Conv(1, (4, 4), padding="VALID", name="conv5")(y)
        return {"prediction": pred, "feature_maps": feats}
