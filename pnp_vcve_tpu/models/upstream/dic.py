"""DIC: face SR with iterative collaboration between SR and landmark
estimation.

Reference surfaces:
- DICNet (mmedit/models/backbones/sr_backbones/dic_net.py:351-476):
  conv_first (+PixelShuffle 2x), FeedbackBlockCustom at step 0, then
  FeedbackBlockHeatmapAttention driven by 5 reduced landmark heatmaps; a
  FeedbackHourglass re-estimates landmarks from each SR output. Returns the
  per-step SR and heatmap lists.
- FeedbackBlock / FeedbackBlockCustom / FeedbackBlockHeatmapAttention
  (dic_net.py:12-348): up/down projection pairs (transpose conv k=s+4,
  stride s, pad 2) with dense 1x1 skip fusions, PReLU activations.
- FeatureHeatmapFusingBlock (dic_net.py:209-268): per-heatmap feature
  groups, softmax heatmap attention, grouped residual blocks.
- FeedbackHourglass + reduce_to_five_heatmaps
  (mmedit/models/extractors/feedback_hour_glass.py:8-230).

TPU notes: the reference's stateful ``last_hidden``/``need_reset`` module
attributes become explicit loop carries inside ``DICNet.__call__`` (all
feedback state is intra-forward). Transpose convs are lowered as
lhs-dilated convolutions (exact torch ConvTranspose2d semantics for
output_padding=0). The hourglass's align_corners=True bilinear x2 resize is
a pair of precomputed interpolation matrices applied as matmuls (MXU
friendly, no gather). Layout NHWC.
"""

from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.ops.upsample import pixel_shuffle

__all__ = ["DICNet", "FeedbackHourglass", "reduce_to_five_heatmaps"]


class _PReLU(nn.Module):
    """Single-parameter PReLU (torch nn.PReLU(num_parameters=1))."""

    init: float = 0.2

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", lambda _k: jnp.asarray(self.init, jnp.float32))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def _conv(ch, k, name, strides=1, groups=1, pad=None):
    if pad is None:
        pad = k // 2
    return nn.Conv(
        ch, (k, k), strides=(strides, strides),
        padding="SAME" if strides == 1 else [(pad, pad)] * 2,
        feature_group_count=groups, name=name,
    )


class _ConvTranspose(nn.Module):
    """torch ConvTranspose2d(k, stride, padding) with output_padding=0:
    lhs-dilated conv with symmetric pad k-1-p (exact s-times upsampling for
    k = s + 4, p = 2)."""

    channels: int
    kernel: int
    stride: int
    pad: int

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel, self.stride, self.pad
        w = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (k, k, x.shape[-1], self.channels),
        )
        b = self.param("bias", nn.initializers.zeros, (self.channels,))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(k - 1 - p, k - 1 - p)] * 2,
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (y + b).astype(x.dtype)


def _resize_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix."""
    m = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        if align_corners:
            pos = i * (n_in - 1) / max(n_out - 1, 1)
        else:
            pos = (i + 0.5) * n_in / n_out - 0.5
        pos = min(max(pos, 0.0), n_in - 1)
        lo = int(np.floor(pos))
        hi = min(lo + 1, n_in - 1)
        f = pos - lo
        m[i, lo] += 1.0 - f
        m[i, hi] += f
    return m


def _bilinear_resize_to(x, hw, align_corners=False):
    """Separable bilinear resize via two interp-matrix matmuls."""
    b, h, w, c = x.shape
    ho, wo = hw
    ah = jnp.asarray(_resize_matrix(h, ho, align_corners), x.dtype)
    aw = jnp.asarray(_resize_matrix(w, wo, align_corners), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", ah, x)
    return jnp.einsum("ow,bhwc->bhoc", aw, y)


# ---------------------------------------------------------------------------
# Feedback blocks


class _FeedbackCore(nn.Module):
    """The shared up/down projection loop (dic_net.py:96-117)."""

    mid_channels: int
    num_blocks: int
    upscale_factor: int
    prelu_init: float = 0.2

    @nn.compact
    def __call__(self, x):
        c = self.mid_channels
        s = self.upscale_factor
        k = s + 4
        lr_features = [x]
        hr_features = []
        for idx in range(self.num_blocks):
            lr = jnp.concatenate(lr_features, -1)
            if idx > 0:
                lr = _PReLU(self.prelu_init, name=f"lr_prelu{idx}")(
                    _conv(c, 1, f"lr_block{idx}")(lr)
                )
            hr = _PReLU(self.prelu_init, name=f"up_prelu{idx}")(
                _ConvTranspose(c, k, s, 2, name=f"up_block{idx}")(lr)
            )
            hr_features.append(hr)
            hr = jnp.concatenate(hr_features, -1)
            if idx > 0:
                hr = _PReLU(self.prelu_init, name=f"hr_prelu{idx}")(
                    _conv(c, 1, f"hr_block{idx}")(hr)
                )
            lr = _PReLU(self.prelu_init, name=f"down_prelu{idx}")(
                _conv(c, k, f"down_block{idx}", strides=s, pad=2)(hr)
            )
            lr_features.append(lr)
        out = jnp.concatenate(lr_features[1:], -1)
        return _PReLU(self.prelu_init, name="last_prelu")(
            _conv(c, 1, "conv_last")(out)
        )


class _FeedbackBlockCustom(nn.Module):
    """First-step feedback block (no hidden state, dic_net.py:121-168)."""

    mid_channels: int
    num_blocks: int
    upscale_factor: int

    @nn.compact
    def __call__(self, x):
        x = _PReLU(0.2, name="first_prelu")(
            _conv(self.mid_channels, 1, "conv_first")(x)
        )
        return _FeedbackCore(
            self.mid_channels, self.num_blocks, self.upscale_factor,
            name="core",
        )(x)


class _GroupResBlock(nn.Module):
    """Grouped residual block (dic_net.py:170-207)."""

    channels: int
    mid_channels: int
    groups: int
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        y = _conv(self.mid_channels, 3, "conv1", groups=self.groups)(x)
        y = nn.leaky_relu(y, negative_slope=0.2)
        y = _conv(self.channels, 3, "conv2", groups=self.groups)(y)
        return x + y * self.res_scale


class _FeatureHeatmapFusing(nn.Module):
    """Softmax heatmap attention over per-heatmap feature groups
    (dic_net.py:209-268)."""

    in_channels: int
    num_heatmaps: int
    num_blocks: int

    @nn.compact
    def __call__(self, feature, heatmap):
        b, h, w, _ = feature.shape
        nh = self.num_heatmaps
        cg = self.in_channels
        feat = nn.leaky_relu(
            _conv(cg * nh, 1, "conv_first")(feature), negative_slope=0.2
        )
        for i in range(self.num_blocks):
            feat = _GroupResBlock(
                cg * nh, cg * nh, nh, name=f"body{i}"
            )(feat)
        attention = jax.nn.softmax(heatmap, axis=-1)  # (b, h, w, nh)
        feat = feat.reshape(b, h, w, nh, cg) * attention[..., None]
        return feat.sum(axis=3)


class _FeedbackBlockHeatmapAttention(nn.Module):
    """Feedback block with hidden-state concat + heatmap fusion
    (dic_net.py:271-348); ``last_hidden`` is an explicit argument."""

    mid_channels: int
    num_blocks: int
    upscale_factor: int
    num_heatmaps: int
    num_fusion_blocks: int

    @nn.compact
    def __call__(self, x, last_hidden, heatmap):
        x = jnp.concatenate([x, last_hidden], -1)
        x = _PReLU(0.2, name="first_prelu")(
            _conv(self.mid_channels, 1, "conv_first")(x)
        )
        x = _FeatureHeatmapFusing(
            self.mid_channels, self.num_heatmaps, self.num_fusion_blocks,
            name="fusion",
        )(x, heatmap)
        return _FeedbackCore(
            self.mid_channels, self.num_blocks, self.upscale_factor,
            name="core",
        )(x)


# ---------------------------------------------------------------------------
# Hourglass landmark estimator


class _HGResBlock(nn.Module):
    """Hourglass bottleneck block (feedback_hour_glass.py:8-54)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        co = self.out_channels
        y = _conv(co // 2, 1, "conv1")(x)
        y = nn.relu(y)
        y = _conv(co // 2, 3, "conv2")(y)
        y = _conv(co, 1, "conv3")(y)
        if x.shape[-1] != co:
            x = _conv(co, 1, "skip")(x)
        return x + y


class _Hourglass(nn.Module):
    """Recursive hourglass (feedback_hour_glass.py:57-95); the x2 upsample
    is align_corners=True bilinear, as the reference."""

    depth: int
    mid_channels: int

    @nn.compact
    def __call__(self, x):
        c = self.mid_channels
        up1 = _HGResBlock(c, name="up1")(x)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = _HGResBlock(c, name="low1")(low)
        if self.depth == 1:
            low = _HGResBlock(c, name="low2")(low)
        else:
            low = _Hourglass(self.depth - 1, c, name="low2")(low)
        low = _HGResBlock(c, name="low3")(low)
        up2 = _bilinear_resize_to(
            low, (x.shape[1], x.shape[2]), align_corners=True
        )
        return up1 + up2


class FeedbackHourglass(nn.Module):
    """Landmark heatmap estimator with feedback channel
    (feedback_hour_glass.py:98-160). Returns (heatmap, feedback)."""

    mid_channels: int = 256
    num_keypoints: int = 68

    @nn.compact
    def __call__(self, x, last_hidden=None):
        c = self.mid_channels
        f = nn.relu(_conv(c // 4, 7, "pre_conv", strides=2)(x))
        f = _HGResBlock(c // 2, name="pre_res1")(f)
        f = nn.max_pool(f, (2, 2), strides=(2, 2))
        f = _HGResBlock(c // 2, name="pre_res2")(f)
        f = _HGResBlock(c, name="pre_res3")(f)
        hidden = f if last_hidden is None else last_hidden
        f = _conv(2 * c, 1, "first_conv")(jnp.concatenate([f, hidden], -1))
        f = _Hourglass(4, 2 * c, name="hg")(f)
        head = _HGResBlock(c, name="last_res")(f[..., :c])
        head = nn.relu(_conv(c, 1, "last_conv1")(head))
        heatmap = _conv(self.num_keypoints, 1, "last_conv2")(head)
        feedback = f[..., c:]
        return heatmap, feedback


def reduce_to_five_heatmaps(heatmap: jnp.ndarray, detach: bool) -> jnp.ndarray:
    """(b, h, w, N) landmark heatmaps -> 5 semantic groups (left eye, right
    eye, nose, mouth, silhouette), each map peak-normalized
    (feedback_hour_glass.py:163-230). Supports N in {5, 68, 194}."""
    max_heat = jnp.clip(
        heatmap.max(axis=(1, 2), keepdims=True), 0.05, None
    )
    heatmap = heatmap / max_heat
    n = heatmap.shape[-1]
    if n == 5:
        out = heatmap
    elif n == 68:
        out = jnp.stack(
            [
                heatmap[..., 36:42].sum(-1),
                heatmap[..., 42:48].sum(-1),
                heatmap[..., 27:36].sum(-1),
                heatmap[..., 48:68].sum(-1),
                heatmap[..., 0:27].sum(-1),
            ],
            axis=-1,
        )
    elif n == 194:  # Helen
        idx = np.arange
        le = np.concatenate([idx(134, 153), idx(174, 193)])
        re = np.concatenate([idx(114, 133), idx(154, 173)])
        out = jnp.stack(
            [
                heatmap[..., le].sum(-1),
                heatmap[..., re].sum(-1),
                heatmap[..., 41:57].sum(-1),
                heatmap[..., 58:113].sum(-1),
                heatmap[..., 0:40].sum(-1),
            ],
            axis=-1,
        )
    else:
        raise ValueError(f"unsupported keypoint count {n}")
    return jax.lax.stop_gradient(out) if detach else out


class DICNet(nn.Module):
    """DIC face-SR network (dic_net.py:351-476). Input (b, h, w, 3) at
    1/upscale resolution -> lists of per-step SR images and heatmaps."""

    in_channels: int = 3
    out_channels: int = 3
    mid_channels: int = 64
    num_blocks: int = 6
    hg_mid_channels: int = 256
    hg_num_keypoints: int = 68
    num_steps: int = 4
    upscale_factor: int = 8
    detach_attention: bool = False
    prelu_init: float = 0.2
    num_heatmaps: int = 5
    num_fusion_blocks: int = 7

    @nn.compact
    def __call__(self, x):
        b, h, w, _ = x.shape
        c = self.mid_channels
        # reference hardcodes (128, 128) = 16x16 inputs at x8; generalized
        # to the equivalent (h*s, w*s)
        size = (h * self.upscale_factor, w * self.upscale_factor)
        inter_res = _bilinear_resize_to(x, size, align_corners=False)

        feat = _PReLU(self.prelu_init, name="first_prelu")(
            _conv(4 * c, 3, "conv_first")(x)
        )
        feat = pixel_shuffle(feat, 2)

        first_block = _FeedbackBlockCustom(
            c, self.num_blocks, self.upscale_factor, name="first_block"
        )
        block = _FeedbackBlockHeatmapAttention(
            c, self.num_blocks, self.upscale_factor, self.num_heatmaps,
            self.num_fusion_blocks, name="block",
        )
        hour_glass = FeedbackHourglass(
            self.hg_mid_channels, self.hg_num_keypoints, name="hour_glass"
        )

        up_last = _ConvTranspose(c, 8, 4, 2, name="up_last")
        last_prelu = _PReLU(self.prelu_init, name="last_prelu")
        conv_out = _conv(self.out_channels, 3, "conv_out")

        def conv_last(sf):  # shared across steps (reference reuses the head)
            return conv_out(last_prelu(up_last(sf)))

        sr_outputs, heatmap_outputs = [], []
        last_hidden = None
        block_hidden = None
        heatmap = None
        for step in range(self.num_steps):
            if step == 0:
                sr_feature = first_block(feat)
            else:
                hm5 = reduce_to_five_heatmaps(heatmap, self.detach_attention)
                sr_feature = block(feat, block_hidden, hm5)
            block_hidden = sr_feature
            sr = conv_last(sr_feature) + inter_res
            heatmap, last_hidden = hour_glass(sr, last_hidden)
            sr_outputs.append(sr)
            heatmap_outputs.append(heatmap)
        return sr_outputs, heatmap_outputs
