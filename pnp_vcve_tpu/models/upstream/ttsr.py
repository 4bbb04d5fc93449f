"""TTSR: reference-based SR via texture transformer.

Reference surfaces:
- TTSRNet (mmedit/models/backbones/sr_backbones/ttsr_net.py:223-439): SFE
  trunk + 3 stages consuming transferred textures under soft-attention,
  cross-scale feature integration (CSFI2/CSFI3), merge head clamped to
  [-1, 1].
- LTE (mmedit/models/extractors/lte.py:13-101): trainable VGG19 slices
  producing (level1 64ch @1x, level2 128ch @1/2, level3 256ch @1/4).
- SearchTransformer (mmedit/models/transformers/search_transformer.py:9-120):
  relevance embedding between 3x3-unfolded normalized Q/K, hard-attention
  gather of multi-scale V patches, soft-attention map, overlap-add fold /9.

TPU notes: the unfold/fold pair is expressed as shift-stacks and block-grid
overlap-add (no scatter); the relevance matmul is one (HW, 9C) x (9C, HW)
batched matmul on the MXU; the hard-attention gather is a single
take_along_axis over flattened patches. Layout NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.ops.upsample import pixel_shuffle

__all__ = ["TTSRNet", "LTE", "search_transformer"]

_VGG_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
_VGG_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def _conv(ch, k, name, strides=1):
    return nn.Conv(ch, (k, k), strides=(strides, strides), padding="SAME",
                   name=name)


def _bicubic(x, scale):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * scale, w * scale, c), method="bicubic")


class _ResBlocks(nn.Module):
    """ResidualBlockNoBN chain (reference sr_backbone_utils.py style)."""

    mid_channels: int
    num_blocks: int
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_blocks):
            y = nn.relu(_conv(self.mid_channels, 3, f"block{i}_conv1")(x))
            y = _conv(self.mid_channels, 3, f"block{i}_conv2")(y)
            x = x + y * self.res_scale
        return x


class LTE(nn.Module):
    """Learnable texture extractor: VGG19 conv slices, trainable.

    Returns (level3, level2, level1) = (256ch @1/4, 128ch @1/2, 64ch @1x),
    matching lte.py:69-101 (slice boundaries at torchvision feature indices
    2 / 7 / 12)."""

    pixel_range: float = 1.0

    @nn.compact
    def __call__(self, x):
        x = (x - _VGG_MEAN * self.pixel_range) / (_VGG_STD * self.pixel_range)
        x = nn.relu(_conv(64, 3, "conv0")(x))          # conv1_1
        level1 = x
        x = nn.relu(_conv(64, 3, "conv2")(x))          # conv1_2
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(_conv(128, 3, "conv5")(x))         # conv2_1
        level2 = x
        x = nn.relu(_conv(128, 3, "conv7")(x))         # conv2_2
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(_conv(256, 3, "conv10")(x))        # conv3_1
        level3 = x
        return level3, level2, level1


def _unfold3x3(x):
    """(b, h, w, c) -> (b, h*w, 9c): 3x3 'same' patches (zero pad)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [
        xp[:, dy : dy + h, dx : dx + w]
        for dy in range(3)
        for dx in range(3)
    ]
    return jnp.concatenate(cols, axis=-1).reshape(b, h * w, 9 * c)


def _unfold_patches(x, s):
    """Patches of kernel 3s, stride s, pad s: (b, H, W, c) with H = h*s ->
    (b, h*w, 9*s*s*c). Patch (p, q) = padded x[p*s : p*s+3s, q*s : q*s+3s],
    viewed as a 3x3 grid of s x s cells."""
    b, H, W, c = x.shape
    h, w = H // s, W // s
    xp = jnp.pad(x, ((0, 0), (s, s), (s, s), (0, 0)))
    xb = xp.reshape(b, h + 2, s, w + 2, s, c)
    cells = [
        xb[:, di : di + h, :, dj : dj + w]  # (b, h, s, w, s, c)
        for di in range(3)
        for dj in range(3)
    ]
    stacked = jnp.stack(cells, axis=2)  # (b, h, 9, s, w, s, c)
    stacked = stacked.transpose(0, 1, 4, 2, 3, 5, 6)  # (b, h, w, 9, s, s, c)
    return stacked.reshape(b, h * w, 9 * s * s * c)


def _fold_patches(patches, h, w, s, c):
    """Inverse of :func:`_unfold_patches` with overlap-add:
    (b, h*w, 9*s*s*c) -> (b, h*s, w*s, c)."""
    b = patches.shape[0]
    p = patches.reshape(b, h, w, 3, 3, s, s, c)
    out = jnp.zeros((b, h + 2, s, w + 2, s, c), patches.dtype)
    for di in range(3):
        for dj in range(3):
            # cell (di, dj) of patch (p, q) lands at block (p+di, q+dj);
            # (b, h, w, s, s, c) -> block-grid order (b, h, s, w, s, c)
            cell = p[:, :, :, di, dj].transpose(0, 1, 3, 2, 4, 5)
            out = out.at[:, di : di + h, :, dj : dj + w].add(cell)
    out = out[:, 1 : 1 + h, :, 1 : 1 + w]
    return out.reshape(b, h * s, w * s, c)


def search_transformer(lq_up, ref_downup, refs):
    """Relevance embedding + hard/soft attention texture transfer
    (search_transformer.py:39-120).

    Args:
      lq_up: level-3 LTE feature of the 4x-upsampled lq, (b, h, w, C).
      ref_downup: level-3 LTE feature of down-up-sampled ref, same shape.
      refs: (ref_level3, ref_level2, ref_level1) LTE features of ref:
        [(b, h, w, C), (b, 2h, 2w, C/2), (b, 4h, 4w, C/4)].

    Returns:
      soft_attention (b, h, w, 1) and transferred textures
      [(b, h, w, C), (b, 2h, 2w, C/2), (b, 4h, 4w, C/4)].
    """
    b, h, w, _ = lq_up.shape
    query = _unfold3x3(lq_up)          # (b, HW, 9C)
    key = _unfold3x3(ref_downup)       # (b, HW, 9C)
    query = query / (
        jnp.linalg.norm(query, axis=-1, keepdims=True) + 1e-12
    )
    key = key / (jnp.linalg.norm(key, axis=-1, keepdims=True) + 1e-12)

    # relevance: (b, HW_key, HW_query); argmax over the key axis
    rel = jnp.einsum(
        "bkc,bqc->bkq", key, query, preferred_element_type=jnp.float32
    )
    max_val = rel.max(axis=1)          # (b, HW_q)
    max_index = rel.argmax(axis=1)     # (b, HW_q)

    textures = []
    for i, ref in enumerate(refs):
        s = 2 ** i
        c = ref.shape[-1]
        vals = _unfold_patches(ref, s)  # (b, HW, 9ssc)
        picked = jnp.take_along_axis(vals, max_index[:, :, None], axis=1)
        textures.append(_fold_patches(picked, h, w, s, c) / 9.0)

    soft_attention = max_val.reshape(b, h, w, 1)
    return soft_attention, textures


class _CSFI2(nn.Module):
    """Cross-scale integration 1x <-> 2x (ttsr_net.py:65-108)."""

    mid_channels: int

    @nn.compact
    def __call__(self, x1, x2):
        c = self.mid_channels
        x12 = nn.relu(_conv(c, 1, "conv1to2")(_bicubic(x1, 2)))
        x21 = nn.relu(_conv(c, 3, "conv2to1", strides=2)(x2))
        x1 = nn.relu(_conv(c, 3, "conv_merge1")(jnp.concatenate([x1, x21], -1)))
        x2 = nn.relu(_conv(c, 3, "conv_merge2")(jnp.concatenate([x2, x12], -1)))
        return x1, x2


class _CSFI3(nn.Module):
    """Cross-scale integration 1x <-> 2x <-> 4x (ttsr_net.py:110-176)."""

    mid_channels: int

    @nn.compact
    def __call__(self, x1, x2, x4):
        c = self.mid_channels
        x12 = nn.relu(_conv(c, 1, "conv1to2")(_bicubic(x1, 2)))
        x14 = nn.relu(_conv(c, 1, "conv1to4")(_bicubic(x1, 4)))
        x21 = nn.relu(_conv(c, 3, "conv2to1", strides=2)(x2))
        x24 = nn.relu(_conv(c, 1, "conv2to4")(_bicubic(x2, 2)))
        x41 = nn.relu(_conv(c, 3, "conv4to1_1", strides=2)(x4))
        x41 = nn.relu(_conv(c, 3, "conv4to1_2", strides=2)(x41))
        x42 = nn.relu(_conv(c, 3, "conv4to2", strides=2)(x4))
        x1 = nn.relu(
            _conv(c, 3, "conv_merge1")(jnp.concatenate([x1, x21, x41], -1))
        )
        x2 = nn.relu(
            _conv(c, 3, "conv_merge2")(jnp.concatenate([x2, x12, x42], -1))
        )
        x4 = nn.relu(
            _conv(c, 3, "conv_merge4")(jnp.concatenate([x4, x14, x24], -1))
        )
        return x1, x2, x4


class TTSRNet(nn.Module):
    """TTSR main net (ttsr_net.py:223-439); textures come from
    :func:`search_transformer` over :class:`LTE` features."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    texture_channels: int = 64
    num_blocks: tuple = (16, 16, 8, 4)
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x, soft_attention, textures):
        """x (b, h, w, 3); soft_attention (b, h, w, 1); textures
        [(b, h, w, 4T), (b, 2h, 2w, 2T), (b, 4h, 4w, T)] -> (b, 4h, 4w, 3)."""
        if textures[-1].shape[-1] != self.texture_channels:
            raise ValueError("texture channel mismatch")
        c = self.mid_channels

        # SFE trunk
        x1 = feat = nn.relu(_conv(c, 3, "sfe_conv_first")(x))
        feat = _ResBlocks(c, self.num_blocks[0], self.res_scale,
                          name="sfe_body")(feat)
        x1 = x1 + _conv(c, 3, "sfe_conv_last")(feat)

        # stage 1 (1x)
        x1_res = _conv(c, 3, "conv_first1")(
            jnp.concatenate([x1, textures[0]], -1)
        )
        x1 = x1 + x1_res * soft_attention
        x1_res = _ResBlocks(c, self.num_blocks[1], self.res_scale,
                            name="res_block1")(x1)
        x1 = x1 + _conv(c, 3, "conv_last1")(x1_res)

        # stage 2 (1x + 2x)
        x21 = x1
        x22 = nn.relu(
            pixel_shuffle(_conv(4 * c, 3, "up1")(x1), 2)
        )
        x22_res = _conv(c, 3, "conv_first2")(
            jnp.concatenate([x22, textures[1]], -1)
        )
        x22 = x22 + x22_res * _bicubic(soft_attention, 2)
        x21_res, x22_res = _CSFI2(c, name="csfi2")(x21, x22)
        x21_res = _conv(c, 3, "conv_last2_1")(
            _ResBlocks(c, self.num_blocks[2], self.res_scale,
                       name="res_block2_1")(x21_res)
        )
        x22_res = _conv(c, 3, "conv_last2_2")(
            _ResBlocks(c, self.num_blocks[2], self.res_scale,
                       name="res_block2_2")(x22_res)
        )
        x21 = x21 + x21_res
        x22 = x22 + x22_res

        # stage 3 (1x + 2x + 4x)
        x31, x32 = x21, x22
        x33 = nn.relu(pixel_shuffle(_conv(4 * c, 3, "up2")(x22), 2))
        x33_res = _conv(c, 3, "conv_first3")(
            jnp.concatenate([x33, textures[2]], -1)
        )
        x33 = x33 + x33_res * _bicubic(soft_attention, 4)
        x31_res, x32_res, x33_res = _CSFI3(c, name="csfi3")(x31, x32, x33)
        x31_res = _conv(c, 3, "conv_last3_1")(
            _ResBlocks(c, self.num_blocks[3], self.res_scale,
                       name="res_block3_1")(x31_res)
        )
        x32_res = _conv(c, 3, "conv_last3_2")(
            _ResBlocks(c, self.num_blocks[3], self.res_scale,
                       name="res_block3_2")(x32_res)
        )
        x33_res = _conv(c, 3, "conv_last3_3")(
            _ResBlocks(c, self.num_blocks[3], self.res_scale,
                       name="res_block3_3")(x33_res)
        )
        x31 = x31 + x31_res
        x32 = x32 + x32_res
        x33 = x33 + x33_res

        # merge head (ttsr_net.py:177-222)
        x14 = nn.relu(_conv(c, 1, "merge_conv1to4")(_bicubic(x31, 4)))
        x24 = nn.relu(_conv(c, 1, "merge_conv2to4")(_bicubic(x32, 2)))
        out = nn.relu(
            _conv(c, 3, "merge_conv")(jnp.concatenate([x33, x14, x24], -1))
        )
        out = _conv(c // 2, 3, "merge_conv_last1")(out)
        out = _conv(self.out_channels, 1, "merge_conv_last2")(out)
        return jnp.clip(out, -1.0, 1.0)
