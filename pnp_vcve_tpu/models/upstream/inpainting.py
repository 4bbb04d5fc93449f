"""Inpainting backbones: Global&Local, DeepFill (v1/v2), PConv, AOT.

Reference surface:
- GL: mmedit/models/backbones/encoder_decoders/gl_encoder_decoder.py:11-56
  (encoders/gl_encoder.py:9-54, necks/gl_dilation.py, decoders/gl_decoder.py).
- DeepFill: two_stage_encoder_decoder.py:13-97 (stage1 GL-shaped coarse net
  with DeepFillEncoder/Decoder, stage2 DeepFillRefiner with a conv branch
  and a contextual-attention branch), common/contextual_attention.py:9-379,
  components/refiners/deepfill_refiner.py:11-80, gated convs
  (common/gated_conv_module.py) for the v2 variant.
- PConv: pconv_encoder_decoder.py + common/partial_conv.py:22-110 +
  common/mask_conv_module.py (7-level partial-conv U-net).
- AOT: aot_encoder_decoder.py:8-30, necks/aot_neck.py:10-140 (split-
  transform-merge dilation blocks with a normalized spatial gate).

TPU redesign notes: NHWC throughout; contextual attention is expressed as
two batched matmuls (im2col(x) @ patchesᵀ for correlation; scores @
raw-patches for the copy) plus an explicit k·k overlap-add fold — the MXU
form of the reference's groups=batch conv / conv_transpose tricks
(contextual_attention.py:146-187). Output clipped to [-1, 1] like the
reference's 'clip' out_act.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "GLEncoderDecoder",
    "contextual_attention",
    "DeepFillEncoder",
    "DeepFillDecoder",
    "DeepFillRefiner",
    "DeepFillEncoderDecoder",
    "PConvEncoderDecoder",
    "AOTEncoderDecoder",
]


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


# ---------------------------------------------------------------------------
# Contextual attention (DeepFill stage-2 attention branch)


def _extract_patches(x, k, stride, padding, dilation=1):
    """(b, h, w, c) -> (b, h', w', k*k, c) patches, (ky, kx)-major order
    (torch F.unfold channel order, contextual_attention.py:334-379)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    hs = (h + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    ws = (w + 2 * padding - dilation * (k - 1) - 1) // stride + 1
    cols = []
    for ky in range(k):
        for kx in range(k):
            cols.append(
                xp[
                    :,
                    ky * dilation : ky * dilation + (hs - 1) * stride + 1 : stride,
                    kx * dilation : kx * dilation + (ws - 1) * stride + 1 : stride,
                    :,
                ]
            )
    return jnp.stack(cols, axis=3)  # (b, hs, ws, k*k, c)


def _fold_overlap_add(cols, out_h, out_w, k, stride, padding):
    """Inverse of unfold: overlap-add (b, hs, ws, k, k, c) patches into
    (b, out_h, out_w, c) — the reference's conv_transpose2d patch-copy
    (contextual_attention.py:168-187) without the groups=batch trick."""
    b, hs, ws, _, _, c = cols.shape
    ph, pw = out_h + 2 * padding, out_w + 2 * padding
    out = jnp.zeros((b, ph, pw, c), cols.dtype)
    for ky in range(k):
        for kx in range(k):
            patch = cols[:, :, :, ky, kx]  # (b, hs, ws, c)
            # scatter-add at rows ky + stride*i: dilate by stride then pad
            up = jnp.zeros((b, ph, pw, c), cols.dtype)
            up = up.at[
                :, ky : ky + (hs - 1) * stride + 1 : stride,
                kx : kx + (ws - 1) * stride + 1 : stride, :,
            ].set(patch)
            out = out + up
    return out[:, padding : padding + out_h, padding : padding + out_w, :]


def _fuse_correlation(corr, h_u, w_u, fuse_k):
    """Eye-kernel fusing over the (patch-index, position) plane
    (contextual_attention.py:189-234)."""
    b, h_m, w_m, L = corr.shape
    eye = jnp.eye(fuse_k, dtype=corr.dtype).reshape(fuse_k, fuse_k, 1, 1)

    def conv_eye(img):  # (b, H, W, 1) same-padded conv
        return jax.lax.conv_general_dilated(
            img, eye, (1, 1), [(fuse_k // 2, fuse_k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    # horizontal: image (L, h*w) with rows=patch index, cols=position
    map_ = corr.reshape(b, h_m * w_m, L).transpose(0, 2, 1)[..., None]
    map_ = conv_eye(map_)[..., 0]  # (b, L, hw)
    # vertical: transpose both grids (h_u,w_u)->(w_u,h_u), (h,w)->(w,h)
    map_ = map_.reshape(b, h_u, w_u, h_m, w_m)
    map_ = map_.transpose(0, 2, 1, 4, 3).reshape(b, w_u * h_u, h_m * w_m)
    map_ = conv_eye(map_[..., None])[..., 0]
    map_ = map_.reshape(b, w_u, h_u, w_m, h_m).transpose(0, 4, 3, 2, 1)
    return map_.reshape(b, h_m, w_m, h_u * w_u)


def contextual_attention(
    x: jnp.ndarray,
    context: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    unfold_raw_kernel_size: int = 4,
    unfold_raw_stride: int = 2,
    unfold_raw_padding: int = 1,
    unfold_corr_kernel_size: int = 3,
    unfold_corr_stride: int = 1,
    unfold_corr_padding: int = 1,
    scale: float = 0.5,
    fuse_kernel_size: int = 3,
    softmax_scale: float = 10.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Contextual attention (reference common/contextual_attention.py:9-379,
    'Generative Image Inpainting with Contextual Attention').

    x/context: (b, h, w, c); mask: (b, h, w, 1), 1 = hole.
    Returns (out (b, h, w, c), attention_score (b, h', w', L)).
    """
    b, h, w, c = x.shape
    kr, sr, pr = unfold_raw_kernel_size, unfold_raw_stride, unfold_raw_padding
    kc, sc, pc = unfold_corr_kernel_size, unfold_corr_stride, unfold_corr_padding

    # raw patches for the copy step (full resolution)
    raw_cols = _extract_patches(context, kr, sr, pr)  # (b, hu, wu, kr*kr, c)
    h_u, w_u = raw_cols.shape[1], raw_cols.shape[2]
    L = h_u * w_u

    # downscale (nearest, factor 0.5 — F.interpolate default mode)
    step = int(round(1.0 / scale))
    xs = x[:, ::step, ::step, :]
    ctx = context[:, ::step, ::step, :]

    # normalized context patches -> correlation as one matmul per batch
    ctx_cols = _extract_patches(ctx, kc, sc, pc)  # (b, hu2, wu2, kc*kc, c)
    assert ctx_cols.shape[1] * ctx_cols.shape[2] == L, "scale/patch mismatch"
    patches = ctx_cols.reshape(b, L, kc * kc * c)
    norm = jnp.sqrt(jnp.sum(patches**2, axis=-1, keepdims=True))
    patches_n = patches / jnp.maximum(norm, 1e-4)

    x_cols = _extract_patches(xs, kc, sc, pc)  # query positions
    hq, wq = x_cols.shape[1], x_cols.shape[2]
    # NOTE: the reference correlates patch kernels with x via conv (valid
    # kernel layout (c, ky, kx)); our per-position unfold is (ky, kx, c) —
    # consistent on BOTH operands, so the dot product is identical.
    q = x_cols.reshape(b, hq * wq, kc * kc * c)
    corr = jnp.einsum("bqd,bld->bql", q, patches_n).reshape(b, hq, wq, L)

    if fuse_kernel_size > 1:
        corr = _fuse_correlation(corr, h_u, w_u, fuse_kernel_size)

    if mask is not None:
        ms = mask[:, ::step, ::step, :]
        m_cols = _extract_patches(ms, kc, sc, pc)  # (b, hu2, wu2, kk, 1)
        masked = (jnp.sum(m_cols, axis=(3, 4)) > 0).reshape(b, 1, 1, L)
        corr = jnp.where(masked, -1e9, corr)

    score = jax.nn.softmax(corr * softmax_scale, axis=-1)

    # copy: scores @ raw patches, then overlap-add fold + overlap norm
    out_cols = jnp.einsum(
        "bql,bld->bqd", score.reshape(b, hq * wq, L),
        raw_cols.reshape(b, L, kr * kr * c),
    ).reshape(b, hq, wq, kr, kr, c)
    out = _fold_overlap_add(out_cols, h, w, kr, sr, pr)

    ones = jnp.ones((1, hq, wq, 1, 1, 1), out.dtype)
    ones = jnp.broadcast_to(ones, (1, hq, wq, kr, kr, 1))
    overlap = _fold_overlap_add(ones, h, w, kr, sr, pr)
    out = out / jnp.where(overlap == 0, 1.0, overlap)
    return out, score


# ---------------------------------------------------------------------------
# DeepFill


class SimpleGatedConv(nn.Module):
    """Gated conv (common/gated_conv_module.py:10-80): ELU(feat) * sigmoid
    (gate), both halves from one doubled conv."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(
            self.out_channels * 2,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME",
            name="conv",
        )(x)
        feat, gate = jnp.split(y, 2, axis=-1)
        return nn.elu(feat) * nn.sigmoid(gate)


def _df_conv(conv_type, out_ch, k, s, name):
    if conv_type == "gated_conv":
        return SimpleGatedConv(out_ch, k, s, name=name)

    def plain(x):
        return nn.elu(
            nn.Conv(out_ch, (k, k), strides=(s, s), padding="SAME", name=name)(x)
        )

    return plain


class DeepFillEncoder(nn.Module):
    """encoders/deepfill_encoder.py:9-77: six ELU (or gated) convs."""

    encoder_type: str = "stage1"  # stage1 | stage2_conv | stage2_attention
    conv_type: str = "conv"
    channel_factor: float = 1.0

    @nn.compact
    def __call__(self, x):
        chans = dict(
            stage1=(32, 64, 64, 128, 128, 128),
            stage2_conv=(32, 32, 64, 64, 128, 128),
            stage2_attention=(32, 32, 64, 128, 128, 128),
        )[self.encoder_type]
        ks = (5, 3, 3, 3, 3, 3)
        strides = (1, 2, 1, 2, 1, 1)
        for i, (ch, k, s) in enumerate(zip(chans, ks, strides)):
            ch = int(ch * self.channel_factor)
            x = _df_conv(self.conv_type, ch, k, s, f"enc{i + 1}")(x)
        return x


class DeepFillDecoder(nn.Module):
    """decoders/deepfill_decoder.py:14-101: seven convs with x2 nearest
    upsampling after dec2/dec4; final conv linear + clip."""

    conv_type: str = "conv"
    channel_factor: float = 1.0

    @nn.compact
    def __call__(self, x):
        chans = [128, 128, 64, 64, 32, 16, 3]
        chans = [int(v * self.channel_factor) for v in chans]
        chans[-1] = 3
        for i, ch in enumerate(chans):
            if i == 6:  # linear head
                x = nn.Conv(ch, (3, 3), padding="SAME", name=f"dec{i + 1}")(x)
            else:
                x = _df_conv(self.conv_type, ch, 3, 1, f"dec{i + 1}")(x)
            if i in (1, 3):  # nearest x2 (F.interpolate default)
                b, h, w, c = x.shape
                x = jax.image.resize(x, (b, 2 * h, 2 * w, c), "nearest")
        return jnp.clip(x, -1.0, 1.0)


class _DilationNeck(nn.Module):
    """necks/gl_dilation.py with configurable activation (DeepFill uses
    ELU, GL uses ReLU)."""

    channels: int = 128
    act: str = "elu"

    @nn.compact
    def __call__(self, x):
        act = nn.elu if self.act == "elu" else nn.relu
        for i, d in enumerate((2, 4, 8, 16)):
            x = act(
                nn.Conv(
                    self.channels, (3, 3), padding="SAME",
                    kernel_dilation=(d, d), name=f"dilation{i + 1}",
                )(x)
            )
        return x


class DeepFillRefiner(nn.Module):
    """components/refiners/deepfill_refiner.py:11-80: conv branch
    (encoder + dilation neck) + attention branch (encoder + CA neck),
    concatenated into the decoder."""

    conv_type: str = "conv"

    @nn.compact
    def __call__(self, x, mask):
        conv_x = DeepFillEncoder(
            encoder_type="stage2_conv", conv_type=self.conv_type,
            name="encoder_conv",
        )(x)
        conv_x = _DilationNeck(128, name="dilation_neck")(conv_x)

        attn_x = DeepFillEncoder(
            encoder_type="stage2_attention", conv_type=self.conv_type,
            name="encoder_attention",
        )(x)
        hs, ws = attn_x.shape[1], attn_x.shape[2]
        # nearest resize of the mask to the feature size
        m = jax.image.resize(mask, (mask.shape[0], hs, ws, 1), "nearest")
        attn_x, offset = contextual_attention(attn_x, attn_x, m)
        attn_x = _df_conv(self.conv_type, 128, 3, 1, "ca_conv1")(attn_x)
        attn_x = _df_conv(self.conv_type, 128, 3, 1, "ca_conv2")(attn_x)

        out = DeepFillDecoder(conv_type=self.conv_type, name="decoder")(
            jnp.concatenate([conv_x, attn_x], axis=-1)
        )
        return out, offset


class DeepFillEncoderDecoder(nn.Module):
    """Two-stage DeepFill (two_stage_encoder_decoder.py:13-97). Input
    (b, h, w, 5) = cat(masked_img, ones, mask); returns (stage1, stage2)
    results (plus the attention offset when ``return_offset``).

    ``conv_type='gated_conv'`` gives the DeepFillv2 generator."""

    conv_type: str = "conv"
    return_offset: bool = False

    @nn.compact
    def __call__(self, x):
        masked_img = x[..., :3]
        mask = x[..., -1:]
        s1 = DeepFillEncoder(conv_type=self.conv_type, name="stage1_encoder")(x)
        s1 = _DilationNeck(128, name="stage1_neck")(s1)
        stage1_res = DeepFillDecoder(conv_type=self.conv_type, name="stage1_decoder")(s1)

        stage1_img = stage1_res * mask + masked_img * (1.0 - mask)
        stage2_in = jnp.concatenate([stage1_img, x[..., 3:]], axis=-1)
        stage2_res, offset = DeepFillRefiner(
            conv_type=self.conv_type, name="stage2"
        )(stage2_in, mask)
        if self.return_offset:
            return stage1_res, stage2_res, offset
        return stage1_res, stage2_res


# ---------------------------------------------------------------------------
# PConv


class PartialConv(nn.Module):
    """Partial conv (common/partial_conv.py:22-110, multi_channel=True):
    masked conv renormalized by the valid-pixel ratio; returns the updated
    mask."""

    out_channels: int
    kernel_size: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, mask):
        k, s = self.kernel_size, self.stride
        raw = nn.Conv(
            self.out_channels, (k, k), strides=(s, s), padding="SAME",
            use_bias=False, name="conv",
        )(x * mask)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_channels,), raw.dtype
        )
        # valid-count via a ones-kernel conv over the (multi-channel) mask
        cnt = jax.lax.conv_general_dilated(
            mask,
            jnp.ones((k, k, mask.shape[-1], 1), x.dtype),
            (s, s),
            "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        numel = k * k * mask.shape[-1]
        updated = jnp.clip(cnt, 0.0, 1.0)
        ratio = numel / (cnt + 1e-8) * updated
        # mmcv semantics (partial_conv.py:88-95): bias re-added after the
        # ratio renormalization, then zeroed where no valid pixels
        out = (raw * ratio + bias) * updated
        new_mask = jnp.broadcast_to(updated, out.shape)
        return out, new_mask


class _MaskConv(nn.Module):
    """common/mask_conv_module.py: PartialConv + (BN) + act."""

    out_channels: int
    kernel_size: int
    stride: int = 1
    act: Optional[str] = "relu"
    use_norm: bool = False

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        x, mask = PartialConv(
            self.out_channels, self.kernel_size, self.stride, name="conv"
        )(x, mask)
        if self.use_norm:
            x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        if self.act == "relu":
            x = nn.relu(x)
        elif self.act == "leaky_relu":
            x = nn.leaky_relu(x, 0.2)
        return x, mask


class PConvEncoderDecoder(nn.Module):
    """7-level partial-conv U-net (pconv_encoder_decoder.py,
    encoders/pconv_encoder.py:10-120, decoders/pconv_decoder.py:11-130).
    Input image + mask (1 = VALID here, matching the reference convention
    where the mask marks known pixels); returns (output, final mask)."""

    num_layers: int = 7

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        mask = jnp.broadcast_to(mask, x.shape)  # multi_channel=True
        enc_specs = [(64, 7), (128, 5), (256, 5), (512, 3)] + [(512, 3)] * (
            self.num_layers - 4
        )
        feats = {0: x}
        masks = {0: mask}
        h, m = x, mask
        for i, (ch, k) in enumerate(enc_specs):
            h, m = _MaskConv(
                ch, k, stride=2, act="relu", use_norm=i > 0, name=f"enc{i + 1}"
            )(h, m, train)
            feats[i + 1] = h
            masks[i + 1] = m

        for i in range(self.num_layers, 0, -1):
            bshape = feats[i - 1].shape
            h = jax.image.resize(h, (h.shape[0], bshape[1], bshape[2], h.shape[3]), "nearest")
            m = jax.image.resize(m, (m.shape[0], bshape[1], bshape[2], m.shape[3]), "nearest")
            h = jnp.concatenate([h, feats[i - 1]], axis=-1)
            m = jnp.concatenate([m, masks[i - 1]], axis=-1)
            last = i == 1
            h, m = _MaskConv(
                3 if last else feats[i - 1].shape[-1],
                3,
                act=None if last else "leaky_relu",
                use_norm=not last,
                name=f"dec{i}",
            )(h, m, train)
        return h, m


# ---------------------------------------------------------------------------
# AOT


class AOTBlock(nn.Module):
    """necks/aot_neck.py:48-140: split-transform-merge dilated convs with
    a normalized sigmoid spatial gate."""

    channels: int = 256
    dilation_rates: Sequence[int] = (1, 2, 4, 8)

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, d in enumerate(self.dilation_rates):
            y = jnp.pad(x, ((0, 0), (d, d), (d, d), (0, 0)), mode="reflect")
            y = nn.relu(
                nn.Conv(
                    self.channels // 4, (3, 3), padding="VALID",
                    kernel_dilation=(d, d), name=f"block{i}",
                )(y)
            )
            outs.append(y)
        dilate_x = jnp.concatenate(outs, axis=-1)
        dp = jnp.pad(dilate_x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        dilate_x = nn.Conv(self.channels, (3, 3), padding="VALID", name="fuse")(dp)
        gp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        gate = nn.Conv(self.channels, (3, 3), padding="VALID", name="gate")(gp)
        mean = gate.mean(axis=(1, 2), keepdims=True)
        std = gate.std(axis=(1, 2), keepdims=True, ddof=1) + 1e-9
        gate = nn.sigmoid(5.0 * (2.0 * (gate - mean) / std - 1.0))
        return x * (1.0 - gate) + dilate_x * gate


class AOTEncoderDecoder(nn.Module):
    """aot_encoder_decoder.py:8-30: 3 convs -> 8 AOT blocks -> upsample
    decoder. Input (b, h, w, 4) = cat(masked_img, mask)."""

    mid_channels: int = 64
    neck_channels: int = 256
    num_aotblock: int = 8
    dilation_rates: Sequence[int] = (1, 2, 4, 8)

    @nn.compact
    def __call__(self, x):
        c = self.mid_channels
        y = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        y = nn.relu(nn.Conv(c, (7, 7), padding="VALID", name="enc1")(y))
        y = nn.relu(nn.Conv(2 * c, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), name="enc2")(y))
        y = nn.relu(nn.Conv(self.neck_channels, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), name="enc3")(y))
        for i in range(self.num_aotblock):
            y = AOTBlock(
                self.neck_channels, self.dilation_rates, name=f"aot{i}"
            )(y)
        # decoder (decoders/aot_decoder.py): x2 upsample + conv, twice, head
        b, h, w, _ = y.shape
        y = jax.image.resize(y, (b, 2 * h, 2 * w, y.shape[3]), "bilinear")
        y = nn.relu(nn.Conv(2 * c, (3, 3), padding="SAME", name="dec1")(y))
        y = jax.image.resize(y, (b, 4 * h, 4 * w, 2 * c), "bilinear")
        y = nn.relu(nn.Conv(c, (3, 3), padding="SAME", name="dec2")(y))
        y = nn.Conv(3, (3, 3), padding="SAME", name="dec3")(y)
        return jnp.tanh(y)
