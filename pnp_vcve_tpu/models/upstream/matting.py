"""Matting family: DIM (Deep Image Matting) encoder-decoder + refiner.

Reference surfaces: mmedit/models/mattors/dim.py:12-180 (two-stage
predict-alpha then refine protocol), the VGG16-ish SimpleEncoderDecoder the
DIM configs use, and components/refiners/plain_refiner.py:10-60 (three
convs on cat(merged, raw_alpha) predicting a residual).

Input: cat(merged RGB, trimap) (4 channels, [0,1]); outputs alpha in [0,1].
Layout NHWC.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "DIMMattor",
    "PlainRefiner",
    "GCAModule",
    "GCAMattor",
    "ResGCAEncoder",
    "ResGCADecoder",
    "IndexNetMattor",
    "IndexNetEncoder",
    "IndexNetDecoder",
    "ASPP",
]


class PlainRefiner(nn.Module):
    """refine_conv1..3 + refine_pred: residual on the raw alpha
    (plain_refiner.py:10-60)."""

    mid_channels: int = 64

    @nn.compact
    def __call__(self, merged_and_alpha, raw_alpha):
        y = merged_and_alpha
        for i in range(3):
            y = nn.relu(
                nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                        name=f"refine_conv{i + 1}")(y)
            )
        residual = nn.Conv(1, (3, 3), padding="SAME", name="refine_pred")(y)
        return nn.sigmoid(raw_alpha + residual)


class DIMMattor(nn.Module):
    """VGG-style encoder (5 pool stages) + mirror decoder predicting raw
    alpha, optional PlainRefiner stage (the DIM two-stage protocol)."""

    base_channels: int = 64
    with_refiner: bool = True

    @nn.compact
    def __call__(self, merged, trimap, refine: bool = True):
        x = jnp.concatenate([merged, trimap], axis=-1)
        c = self.base_channels
        enc_cfg = ((c, 2), (c * 2, 2), (c * 4, 3), (c * 8, 3), (c * 8, 3))
        y = x
        sizes = []
        for stage, (ch, n) in enumerate(enc_cfg):
            for i in range(n):
                y = nn.relu(
                    nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"enc{stage}_{i}")(y)
                )
            sizes.append(y.shape[1:3])
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
        y = nn.relu(nn.Conv(c * 8, (3, 3), padding="SAME", name="bottleneck")(y))
        for stage, (ch, _) in reversed(list(enumerate(enc_cfg))):
            h, w = sizes[stage]
            y = jax.image.resize(y, (y.shape[0], h, w, y.shape[-1]), "nearest")
            y = nn.relu(
                nn.Conv(ch, (5, 5), padding="SAME", name=f"dec{stage}")(y)
            )
        raw_alpha = nn.Conv(1, (5, 5), padding="SAME", name="alpha_pred")(y)
        pred_alpha = nn.sigmoid(raw_alpha)
        if self.with_refiner and refine:
            pred_alpha = PlainRefiner(name="refiner")(
                jnp.concatenate([merged, raw_alpha], axis=-1), raw_alpha
            )
        return pred_alpha


# ---------------------------------------------------------------------------
# GCA (Guided Contextual Attention matting, reference mattors/gca.py:11-105,
# common/gca_module.py:8-358, encoders/resnet_enc.py:100-527,
# decoders/resnet_dec.py:10-383)


def _gca_pad(x, k, stride, mode="reflect"):
    """Reference GCAModule.pad (gca_module.py:333-337)."""
    left = (k - stride + 1) // 2
    right = (k - stride) // 2
    return jnp.pad(x, ((0, 0), (left, right), (left, right), (0, 0)), mode=mode)


class GCAModule(nn.Module):
    """Guided contextual attention (gca_module.py:8-358): image-feature
    patches attend over the image feature; the attention scores propagate
    alpha-feature patches; unknown-area scaling + self-correlation penalty.

    TPU form: the per-batch-item conv/conv_transpose loops become batched
    einsums + an overlap-add fold."""

    in_channels: int
    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    rate: int = 2
    penalty: float = -1e4
    eps: float = 1e-4

    @nn.compact
    def __call__(self, img_feat, alpha_feat, unknown=None,
                 softmax_scale=1.0, train: bool = False):
        from pnp_vcve_tpu.models.upstream.inpainting import (
            _extract_patches,
            _fold_overlap_add,
        )

        r = self.rate
        b = img_feat.shape[0]
        img_feat = nn.Conv(self.in_channels // 2, (1, 1), name="guidance_conv")(img_feat)
        img_feat = img_feat[:, ::r, ::r, :]  # nearest 1/rate

        h, w = img_feat.shape[1], img_feat.shape[2]
        L = h * w
        if unknown is not None:
            unknown = unknown[:, ::r, ::r, :]
            u_mean = unknown.mean(axis=(1, 2, 3))
            k_mean = 1.0 - u_mean
            u_scale = jnp.clip(jnp.sqrt(u_mean / (k_mean + 1e-12)), 0.1, 10.0)
            k_scale = jnp.clip(jnp.sqrt(k_mean / (u_mean + 1e-12)), 0.1, 10.0)
        else:
            unknown = jnp.ones((b, h, w, 1), img_feat.dtype)
            u_scale = jnp.full((b,), softmax_scale, img_feat.dtype)
            k_scale = jnp.full((b,), softmax_scale, img_feat.dtype)

        ks = self.kernel_size
        # patches: (b, h, w, k*k, c) on the reflect-padded maps
        img_p = _extract_patches(
            _gca_pad(img_feat, ks, self.stride), ks, self.stride, 0
        ).reshape(b, L, -1)
        alpha_p = _extract_patches(
            _gca_pad(alpha_feat, 2 * r, r), 2 * r, r, 0
        )
        ac = alpha_feat.shape[-1]
        alpha_p = alpha_p.reshape(b, L, (2 * r) ** 2, ac)
        unk_p = _extract_patches(
            _gca_pad(unknown, ks, self.stride), ks, self.stride, 0
        ).reshape(b, L, -1).mean(axis=-1)  # (b, L)

        # similarity: conv(img_feat, normalized patches) == im2col @ patchesT
        pnorm = jnp.sqrt(jnp.sum(img_p ** 2, axis=-1, keepdims=True))
        img_pn = img_p / jnp.maximum(pnorm, self.eps)
        q = _extract_patches(
            _gca_pad(img_feat, ks, self.stride), ks, self.stride, 0
        ).reshape(b, L, -1)
        sim = jnp.einsum("bqd,bld->bql", q, img_pn)  # (b, pos, L)

        # guided score (gca_module.py:232-249)
        gate = jnp.where(unk_p > 0, u_scale[:, None], k_scale[:, None])  # (b, L)
        out = sim * gate[:, None, :]
        self_mask = jnp.eye(L, dtype=sim.dtype) * self.penalty  # (pos, L)
        out = out + self_mask[None] * unk_p[:, None, :]
        score = jax.nn.softmax(out, axis=-1)

        # propagate alpha patches (conv_transpose s=rate p=1, / 4)
        out_cols = jnp.einsum("bql,blkc->bqkc", score, alpha_p)
        ha, wa = alpha_feat.shape[1], alpha_feat.shape[2]
        out_img = _fold_overlap_add(
            out_cols.reshape(b, h, w, 2 * r, 2 * r, ac), ha, wa, 2 * r, r, 1
        ) / 4.0

        y = nn.Conv(self.out_channels, (1, 1), use_bias=False, name="out_conv")(out_img)
        y = nn.BatchNorm(use_running_average=not train, name="out_bn")(y)
        return y + alpha_feat


class _EncBlock(nn.Module):
    """resnet_enc.py:12-98 BasicBlock: conv-bn-relu + conv-bn, avgpool+1x1
    shortcut on stride 2, relu after the sum."""

    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbn(h, ch, stride, name, act=True):
            h = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME",
                        use_bias=False, name=f"{name}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, name=f"{name}_bn")(h)
            return nn.relu(h) if act else h

        identity = x
        out = cbn(x, self.channels, self.stride, "conv1")
        out = cbn(out, self.channels, 1, "conv2", act=False)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.avg_pool(x, (2, 2), strides=(self.stride, self.stride)) \
                if self.stride != 1 else x
            identity = cbn(identity, self.channels, 1, "downsample", act=False)
        return nn.relu(out + identity)


class _DecBlock(nn.Module):
    """resnet_dec.py:10-84 BasicBlockDec: deconv(4,2) on stride 2 +
    conv-bn; nearest x2 + 1x1 shortcut; LeakyReLU(0.2)."""

    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        if self.stride == 2:
            out = nn.ConvTranspose(cin, (4, 4), strides=(2, 2), padding="SAME",
                                   use_bias=False, name="conv1")(x)
        else:
            out = nn.Conv(cin, (3, 3), padding="SAME", use_bias=False,
                          name="conv1")(x)
        out = nn.BatchNorm(use_running_average=not train, name="bn1")(out)
        out = nn.leaky_relu(out, 0.2)
        out = nn.Conv(self.channels, (3, 3), padding="SAME", use_bias=False,
                      name="conv2")(out)
        out = nn.BatchNorm(use_running_average=not train, name="bn2")(out)
        identity = x
        if self.stride == 2 or cin != self.channels:
            if self.stride == 2:
                bsh = x.shape
                identity = jax.image.resize(
                    x, (bsh[0], 2 * bsh[1], 2 * bsh[2], bsh[3]), "nearest"
                )
            identity = nn.Conv(self.channels, (1, 1), use_bias=False,
                               name="upsample_conv")(identity)
            identity = nn.BatchNorm(use_running_average=not train,
                                    name="upsample_bn")(identity)
        return nn.leaky_relu(out + identity, 0.2)


class ResGCAEncoder(nn.Module):
    """resnet_enc.py:271-527 (ResShortcutEnc + GCA guidance head)."""

    in_channels: int = 6
    layers: Sequence[int] = (3, 4, 4, 2)
    with_gca: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbnr(h, ch, stride, name):
            h = nn.Conv(ch, (3, 3), strides=(stride, stride), padding="SAME",
                        use_bias=False, name=f"{name}_conv")(h)
            h = nn.BatchNorm(use_running_average=not train, name=f"{name}_bn")(h)
            return nn.relu(h)

        def stack(h, ch, n, stride, name):
            h = _EncBlock(ch, stride, name=f"{name}_0")(h, train)
            for i in range(1, n):
                h = _EncBlock(ch, 1, name=f"{name}_{i}")(h, train)
            return h

        def shortcut(h, ch, name):
            for i in range(2):
                h = nn.Conv(ch, (3, 3), padding="SAME", name=f"{name}_conv{i}")(h)
                h = nn.relu(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 name=f"{name}_bn{i}")(h)
            return h

        out = cbnr(x, 32, 2, "conv1")
        x1 = cbnr(out, 32, 1, "conv2")
        out = cbnr(x1, 64, 2, "conv3")
        x2 = stack(out, 64, self.layers[0], 1, "layer1")
        x3 = stack(x2, 128, self.layers[1], 2, "layer2")

        feats = {}
        if self.with_gca:
            g = x[..., :3]
            for i, ch in enumerate((16, 32, 128)):
                g = jnp.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
                g = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            name=f"guidance{i}_conv")(g)
                g = nn.relu(g)
                g = nn.BatchNorm(use_running_average=not train,
                                 name=f"guidance{i}_bn")(g)
            if self.in_channels == 6:
                unknown = (x[..., 4:5] == 1.0).astype(x.dtype)
            else:
                unknown = (x[..., 3:] == 1.0).astype(x.dtype)
            unknown = unknown[:, ::8, ::8, :]
            x3 = GCAModule(128, 128, name="gca")(g, x3, unknown, train=train)
            feats["img_feat"] = g
            feats["unknown"] = unknown

        x4 = stack(x3, 256, self.layers[2], 2, "layer3")
        out = stack(x4, 512, self.layers[3], 2, "layer4")

        feats.update(
            out=out,
            feat1=shortcut(x, 32, "shortcut0"),
            feat2=shortcut(x1, 32, "shortcut1"),
            feat3=shortcut(x2, 64, "shortcut2"),
            feat4=shortcut(x3, 128, "shortcut3"),
            feat5=shortcut(x4, 256, "shortcut4"),
        )
        return feats


class ResGCADecoder(nn.Module):
    """resnet_dec.py:229-383 (ResShortcutDec + GCA between layer2/3)."""

    layers: Sequence[int] = (2, 3, 3, 2)
    with_gca: bool = True

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        def stack(h, ch, n, name):
            h = _DecBlock(ch, 2, name=f"{name}_0")(h, train)
            for i in range(1, n):
                h = _DecBlock(ch, 1, name=f"{name}_{i}")(h, train)
            return h

        x = inputs["out"]
        x = stack(x, 256, self.layers[0], "layer1") + inputs["feat5"]
        x = stack(x, 128, self.layers[1], "layer2") + inputs["feat4"]
        if self.with_gca:
            x = GCAModule(128, 128, name="gca")(
                inputs["img_feat"], x, inputs["unknown"], train=train
            )
        x = stack(x, 64, self.layers[2], "layer3") + inputs["feat3"]
        x = stack(x, 32, self.layers[3], "layer4") + inputs["feat2"]
        x = nn.ConvTranspose(32, (4, 4), strides=(2, 2), padding="SAME",
                             use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="conv1_bn")(x)
        x = nn.leaky_relu(x, 0.2) + inputs["feat1"]
        return nn.Conv(1, (3, 3), padding="SAME", name="conv2")(x)


class GCAMattor(nn.Module):
    """GCA matting model (mattors/gca.py:11-105): encoder-decoder on
    cat(merged, trimap); pred_alpha = (tanh(raw) + 1) / 2."""

    in_channels: int = 6
    enc_layers: Sequence[int] = (3, 4, 4, 2)
    dec_layers: Sequence[int] = (2, 3, 3, 2)

    @nn.compact
    def __call__(self, merged, trimap, train: bool = False):
        x = jnp.concatenate([merged, trimap], axis=-1)
        feats = ResGCAEncoder(
            in_channels=self.in_channels, layers=self.enc_layers,
            name="encoder",
        )(x, train)
        raw = ResGCADecoder(layers=self.dec_layers, name="decoder")(feats, train)
        return (jnp.tanh(raw) + 1.0) / 2.0


# ---------------------------------------------------------------------------
# IndexNet (reference mattors/indexnet.py:14-115,
# encoders/indexnet_encoder.py:16-500, decoders/indexnet_decoder.py:13-139,
# common/aspp.py): MobileNetV2 trunk with learned index-guided down/up
# sampling.


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class _CBR6(nn.Module):
    """ConvModule(norm=BN, act=ReLU6)."""

    channels: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    pad: str | int = "SAME"
    act: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = self.pad if isinstance(self.pad, str) else [
            (self.pad, self.pad)] * 2
        x = nn.Conv(
            self.channels, (self.kernel, self.kernel),
            strides=(self.stride, self.stride), padding=padding,
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups, use_bias=self.use_bias,
            name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return _relu6(x) if self.act else x


class _SepConv(nn.Module):
    """DepthwiseSeparableConvModule with ReLU6 dw act, configurable pw act
    (common/separable_conv_module.py)."""

    channels: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    pad: str | int = "SAME"
    pw_act: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        cin = x.shape[-1]
        x = _CBR6(
            cin, self.kernel, self.stride, self.dilation, groups=cin,
            pad=self.pad, name="depthwise",
        )(x, train)
        return _CBR6(self.channels, 1, act=self.pw_act, name="pointwise")(x, train)


class InvertedResidual(nn.Module):
    """indexnet_encoder.py:206-285: MobileNetV2 block with the reference's
    asymmetric effective-kernel padding."""

    channels: int
    dilation: int = 1
    expand_ratio: float = 1.0
    use_res: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        eff = 3 + 2 * (self.dilation - 1)
        left, right = (eff - 1) // 2, eff // 2
        h = jnp.pad(x, ((0, 0), (left, right), (left, right), (0, 0)))
        if self.expand_ratio == 1:
            out = _SepConv(
                self.channels, 3, 1, self.dilation, pad=0, name="conv"
            )(h, train)
        else:
            hidden = round(x.shape[-1] * self.expand_ratio)
            h2 = _CBR6(hidden, 1, name="expand")(h, train)
            out = _SepConv(
                self.channels, 3, 1, self.dilation, pad=0, name="conv"
            )(h2, train)
        return out + x if self.use_res else out


class HolisticIndexBlock(nn.Module):
    """indexnet_encoder.py:87-135."""

    use_context: bool = True
    use_nonlinear: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pnp_vcve_tpu.ops.upsample import pixel_shuffle

        k, p = (4, 1) if self.use_context else (2, 0)
        cin = x.shape[-1]
        if self.use_nonlinear:
            h = _CBR6(cin * 2, k, 2, pad=p, name="idx0")(x, train)
            h = nn.Conv(4, (1, 1), use_bias=False, name="idx1")(h)
        else:
            h = nn.Conv(4, (k, k), strides=(2, 2),
                        padding=[(p, p)] * 2, use_bias=False, name="idx0")(x)
        y = nn.sigmoid(h)
        z = jax.nn.softmax(y, axis=-1)  # over the 4 shuffle positions
        return pixel_shuffle(z, 2), pixel_shuffle(y, 2)


class DepthwiseIndexBlock(nn.Module):
    """indexnet_encoder.py:138-204 ('o2o' grouped / 'm2o' dense)."""

    mode: str = "m2o"
    use_context: bool = True
    use_nonlinear: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pnp_vcve_tpu.ops.upsample import pixel_shuffle

        n, h, w, c = x.shape
        k, p = (4, 1) if self.use_context else (2, 0)
        groups = c if self.mode == "o2o" else 1
        feats = []
        for i in range(4):
            if self.use_nonlinear:
                f = _CBR6(c, k, 2, groups=groups, pad=p, name=f"idx{i}_0")(x, train)
                f = nn.Conv(c, (1, 1), feature_group_count=groups,
                            use_bias=False, name=f"idx{i}_1")(f)
            else:
                f = nn.Conv(c, (k, k), strides=(2, 2), padding=[(p, p)] * 2,
                            feature_group_count=groups, use_bias=False,
                            name=f"idx{i}_0")(x)
            feats.append(f)
        stacked = jnp.stack(feats, axis=-1)  # (n, h/2, w/2, c, 4)
        y = nn.sigmoid(stacked)
        z = jax.nn.softmax(y, axis=-1)
        # torch layout (n, c, 4, h, w).view(n, c*4, h, w) + PixelShuffle(2):
        # channel-major c, fast index 4 == our (..., c, 4) flatten
        y = y.reshape(n, h // 2, w // 2, c * 4)
        z = z.reshape(n, h // 2, w // 2, c * 4)
        return pixel_shuffle(z, 2), pixel_shuffle(y, 2)


class ASPP(nn.Module):
    """common/aspp.py: 1x1 + three (separable) dilated 3x3 + global pooling
    branch, concat, 1x1 project (+ dropout, off at eval)."""

    mid_channels: int = 256
    out_channels: int = 160
    dilations: Sequence[int] = (2, 4, 8)
    separable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        res = [_CBR6(self.mid_channels, 1, name="conv0")(x, train)]
        for i, d in enumerate(self.dilations):
            if self.separable:
                res.append(
                    _SepConv(self.mid_channels, 3, 1, d, pad=d, pw_act=True,
                             name=f"branch{i}")(x, train)
                )
            else:
                res.append(
                    _CBR6(self.mid_channels, 3, 1, d, pad=d,
                          name=f"branch{i}")(x, train)
                )
        pool = x.mean(axis=(1, 2), keepdims=True)
        pool = _CBR6(self.mid_channels, 1, name="pool_conv")(pool, train)
        pool = jnp.broadcast_to(pool, res[0].shape[:3] + (self.mid_channels,))
        res.append(pool)
        out = _CBR6(self.out_channels, 1, name="project")(
            jnp.concatenate(res, axis=-1), train
        )
        return out  # dropout is eval-off; training uses deterministic=False


_MOBILENET_SETTINGS = [
    # expand, in, out, num_blocks, stride(for dilation0 only), dilation
    (1, 32, 16, 1, 1, 1),
    (6, 16, 24, 2, 2, 1),
    (6, 24, 32, 3, 2, 1),
    (6, 32, 64, 4, 2, 1),
    (6, 64, 96, 3, 1, 1),
    (6, 96, 160, 3, 2, 1),
    (6, 160, 320, 1, 1, 1),
]


class IndexNetEncoder(nn.Module):
    """indexnet_encoder.py:288-500 (out_stride=32, index_mode='m2o')."""

    in_channels: int = 4
    index_mode: str = "m2o"
    use_context: bool = True
    use_nonlinear: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        downsampled = (0, 2, 3, 4, 6)
        x = _CBR6(32, 3, name="layer0")(x, train)
        shortcuts, dec_feats = [], []

        def index_block(ch_idx, name):
            if self.index_mode == "holistic":
                return HolisticIndexBlock(
                    self.use_context, self.use_nonlinear, name=name)
            return DepthwiseIndexBlock(
                self.index_mode, self.use_context, self.use_nonlinear,
                name=name)

        def maybe_downsample(x, i):
            if i in downsampled:
                enc_idx, dec_idx = index_block(i, f"index{i}")(x, train)
                x = enc_idx * x
                shortcuts.append(x)
                dec_feats.append(dec_idx)
                x = 4.0 * nn.avg_pool(x, (2, 2), strides=(2, 2))
            elif i != 7:
                shortcuts.append(x)
                dec_feats.append(None)
            return x

        x = maybe_downsample(x, 0)
        for li, (exp, cin, cout, nblk, stride, dil) in enumerate(_MOBILENET_SETTINGS):
            d0 = max(dil // 2, 1) if stride == 2 else dil
            x = InvertedResidual(
                cout, d0, exp, use_res=False, name=f"layer{li + 1}_0"
            )(x, train)
            for bi in range(1, nblk):
                x = InvertedResidual(
                    cout, dil, exp, use_res=True, name=f"layer{li + 1}_{bi}"
                )(x, train)
            x = maybe_downsample(x, li + 1)

        out = ASPP(name="aspp")(x, train)
        return {"out": out, "shortcuts": shortcuts, "dec_idx_feats": dec_feats}


class IndexNetDecoder(nn.Module):
    """indexnet_decoder.py:13-139: indexed upsampling + separable convs."""

    separable: bool = True
    kernel: int = 5

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        out = inputs["out"]
        shortcuts = list(reversed(inputs["shortcuts"]))
        dec_feats = list(reversed(inputs["dec_idx_feats"]))
        outs = (96, 64, 32, 24, 16, 32, 32)
        conv = _SepConv if self.separable else _CBR6
        for i, (sc, df, ch) in enumerate(zip(shortcuts, dec_feats, outs)):
            if df is not None:
                b, hs, ws, _ = sc.shape
                out = df * jax.image.resize(
                    out, (b, hs, ws, out.shape[-1]), "nearest"
                )
            out = jnp.concatenate([out, sc], axis=-1)
            if self.separable:
                out = _SepConv(ch, self.kernel, pw_act=True, name=f"dec{i}")(out, train)
            else:
                out = _CBR6(ch, self.kernel, name=f"dec{i}")(out, train)
        if self.separable:
            out = _SepConv(1, self.kernel, pw_act=True, name="pred0")(out, train)
        else:
            out = _CBR6(1, self.kernel, name="pred0")(out, train)
        return nn.Conv(1, (self.kernel, self.kernel), padding="SAME",
                       use_bias=False, name="pred1")(out)


class IndexNetMattor(nn.Module):
    """IndexNet matting (mattors/indexnet.py:14-115): encoder-decoder on
    cat(merged, trimap); raw alpha output (losses/eval clamp as needed)."""

    in_channels: int = 4
    index_mode: str = "m2o"

    @nn.compact
    def __call__(self, merged, trimap, train: bool = False):
        x = jnp.concatenate([merged, trimap], axis=-1)
        feats = IndexNetEncoder(
            in_channels=self.in_channels, index_mode=self.index_mode,
            name="encoder",
        )(x, train)
        return IndexNetDecoder(name="decoder")(feats, train)
