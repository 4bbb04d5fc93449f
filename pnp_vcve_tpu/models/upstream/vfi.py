"""Video frame interpolation family.

Reference surfaces:
- CAINNet: mmedit/models/backbones/vfi_backbones/cain_net.py:235-324 —
  mean-shifted inputs, PixelUnshuffle by 2**depth, residual groups of
  residual channel-attention blocks (reflection-padded convs), PixelShuffle
  back, mean restored.
- TOFlowVFI: vfi_backbones/tof_vfi_net.py — the TOFlow architecture applied
  to the 2-frame interpolation task (SPyNet flow to a virtual middle frame
  + warp + fusion); covered by the TOFlow port for the SR task.
- The BasicInterpolator protocol (video_interpolators/basic_interpolator.py)
  is the CenterFrameRestorer pattern: pairs in, middle frame out.

Layout NHWC, [0, 1].
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["CAINNet", "TOFlowVFINet", "FLAVRNet"]


def _reflect_conv(x, ch, k, name_fn, idx):
    p = k // 2
    x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
    return nn.Conv(ch, (k, k), padding="VALID", name=name_fn(idx))(x)


class _ChannelAttention(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = x.mean(axis=(1, 2))
        y = nn.relu(nn.Dense(max(1, self.channels // self.reduction), name="fc0")(y))
        y = nn.sigmoid(nn.Dense(self.channels, name="fc1")(y))
        return x * y[:, None, None, :]


class _RCABlock(nn.Module):
    channels: int
    kernel_size: int = 3
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = nn.relu(_reflect_conv(x, self.channels, self.kernel_size,
                                  lambda i: f"conv{i}", 0))
        y = _reflect_conv(y, self.channels, self.kernel_size,
                          lambda i: f"conv{i}", 1)
        y = _ChannelAttention(self.channels, self.reduction, name="ca")(y)
        return x + y


class _ResidualGroup(nn.Module):
    channels: int
    num_blocks: int = 12
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        y = x
        for i in range(self.num_blocks):
            y = _RCABlock(self.channels, reduction=self.reduction,
                          name=f"block{i}")(y)
        y = _reflect_conv(y, self.channels, 3, lambda i: "conv_after_body", 0)
        return x + y


def _pixel_unshuffle(x, scale):
    b, h, w, c = x.shape
    x = x.reshape(b, h // scale, scale, w // scale, scale, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(
        b, h // scale, w // scale, scale * scale * c
    )


def _pixel_shuffle(x, scale):
    b, h, w, c = x.shape
    co = c // (scale * scale)
    x = x.reshape(b, h, w, scale, scale, co)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h * scale, w * scale, co)


class CAINNet(nn.Module):
    in_channels: int = 3
    mid_channels: int = 64
    depth: int = 3
    num_block_groups: int = 5
    num_block_layers: int = 12
    reduction: int = 16

    @nn.compact
    def __call__(self, imgs):
        """imgs (b, 2, h, w, c) -> interpolated middle frame (b, h, w, c)."""
        x1, x2 = imgs[:, 0], imgs[:, 1]
        m1 = x1.mean(axis=(1, 2), keepdims=True)
        m2 = x2.mean(axis=(1, 2), keepdims=True)
        x1 = x1 - m1
        x2 = x2 - m2

        scale = 2 ** self.depth
        x = jnp.concatenate(
            [_pixel_unshuffle(x1, scale), _pixel_unshuffle(x2, scale)], axis=-1
        )
        x = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                    name="conv_first")(x)
        y = x
        for g in range(self.num_block_groups):
            y = _ResidualGroup(self.mid_channels, self.num_block_layers,
                               self.reduction, name=f"group{g}")(y)
        y = y + x
        y = nn.Conv(self.in_channels * scale * scale, (3, 3), padding="SAME",
                    name="conv_last")(y)
        out = _pixel_shuffle(y, scale)
        return out + (m1 + m2) / 2


# ---------------------------------------------------------------------------
# TOFlowVFINet (reference vfi_backbones/tof_vfi_net.py:13-340): 4-level
# TOFlow SPyNet (optionally BN) + warp both frames halfway + 3-conv ResNet
# fusion.

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class _TOFBasicModule(nn.Module):
    """tof_vfi_net.py:13-78: 5 convs 8->32->64->32->16->2, 7x7."""

    use_bn: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, ch in enumerate((32, 64, 32, 16)):
            x = nn.Conv(ch, (7, 7), padding="SAME", name=f"conv{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train, name=f"bn{i}")(x)
            x = nn.relu(x)
        return nn.Conv(2, (7, 7), padding="SAME", name="conv4")(x)


class TOFlowVFINet(nn.Module):
    """2-frame interpolation (tof_vfi_net.py:196-340). Input
    (b, 2, h, w, 3) in [0, 1] -> middle frame (b, h, w, 3)."""

    use_bn: bool = False

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        from pnp_vcve_tpu.ops.resize import resize_bilinear_align_corners
        from pnp_vcve_tpu.ops.warp import flow_warp

        b, t, h_ori, w_ori, c = inputs.shape
        pad_h = (16 - h_ori % 16) % 16
        pad_w = (16 - w_ori % 16) % 16
        if pad_h or pad_w:
            inputs = jnp.pad(
                inputs, ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                mode="reflect",
            )
        h, w = inputs.shape[2], inputs.shape[3]
        mean = jnp.asarray(_MEAN).reshape(1, 1, 1, 1, 3)
        std = jnp.asarray(_STD).reshape(1, 1, 1, 1, 3)
        x = (inputs - mean) / std

        # one set of pyramid modules, applied to both flow directions
        # (reference shares self.spynet, tof_vfi_net.py:270-272)
        basic_modules = [
            _TOFBasicModule(self.use_bn, name=f"basic_module{i}")
            for i in range(4)
        ]

        def spynet(ref, supp):
            refs, supps = [ref], [supp]
            for _ in range(3):
                pool = lambda im: nn.avg_pool(im, (2, 2), strides=(2, 2))
                refs.insert(0, pool(refs[0]))
                supps.insert(0, pool(supps[0]))
            flow = jnp.zeros((b, h // 16, w // 16, 2), x.dtype)
            for i in range(4):
                hs, ws = refs[i].shape[1], refs[i].shape[2]
                flow_up = resize_bilinear_align_corners(flow, (hs, ws)) * 2.0
                inp = jnp.concatenate(
                    [refs[i],
                     flow_warp(supps[i], flow_up, padding_mode="border"),
                     flow_up], axis=-1,
                )
                flow = flow_up + basic_modules[i](inp, train)
            return flow

        flow_10 = spynet(x[:, 0], x[:, 1])
        flow_01 = spynet(x[:, 1], x[:, 0])
        warp0 = flow_warp(x[:, 0], flow_01 / 2.0)
        warp1 = flow_warp(x[:, 1], flow_10 / 2.0)

        # 3-layer fusion ResNet (tof_vfi_net.py:163-193)
        frames = jnp.stack([warp0, warp1], axis=1)
        average = frames.mean(axis=1)
        y = frames.transpose(0, 2, 3, 1, 4).reshape(b, h, w, 2 * c)
        y = nn.relu(nn.Conv(64, (9, 9), padding="SAME", name="res0")(y))
        y = nn.relu(nn.Conv(64, (1, 1), name="res1")(y))
        y = nn.Conv(3, (1, 1), name="res2")(y) + average

        out = y * std[0] + mean[0]
        return out[:, :h_ori, :w_ori]


# ---------------------------------------------------------------------------
# FLAVR (reference vfi_backbones/flavr_net.py:12-572): flow-free 3D U-net
# with SE-gated residual blocks over the (t, h, w) volume.


class _SEGating3d(nn.Module):
    """flavr_net.py:551-572: global-pooled 1x1x1 sigmoid gate."""

    @nn.compact
    def __call__(self, x):
        g = x.mean(axis=(1, 2, 3), keepdims=True)
        g = nn.sigmoid(nn.Conv(x.shape[-1], (1, 1, 1), name="attn")(g))
        return x * g


class _FlavrBlock(nn.Module):
    """flavr_net.py:483-548 BasicBlock (3D, SE-gated)."""

    channels: int
    stride: tuple = (1, 1, 1)
    bias: bool = False

    @nn.compact
    def __call__(self, x):
        out = nn.relu(
            nn.Conv(self.channels, (3, 3, 3), strides=self.stride,
                    padding="SAME", use_bias=self.bias, name="conv1")(x)
        )
        out = nn.Conv(self.channels, (3, 3, 3), padding="SAME",
                      use_bias=self.bias, name="conv2")(out)
        out = _SEGating3d(name="fg")(out)
        identity = x
        if self.stride != (1, 1, 1) or x.shape[-1] != self.channels:
            identity = nn.Conv(self.channels, (1, 1, 1), strides=self.stride,
                               use_bias=False, name="downsample")(x)
        return nn.relu(out + identity)


class _UpConv3d(nn.Module):
    """flavr_net.py:346-407 (transpose mode) + SE gate."""

    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(self.channels, (3, 4, 4), strides=(1, 2, 2),
                             padding="SAME", name="upconv")(x)
        return _SEGating3d(name="fg")(y)


class _GatedConv3d(nn.Module):
    """flavr_net.py:409-457."""

    channels: int

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.channels, (3, 3, 3), padding="SAME", name="conv")(x)
        return _SEGating3d(name="fg")(y)


class FLAVRNet(nn.Module):
    """FLAVR interpolator (flavr_net.py:12-122). Input (b, t, h, w, 3),
    output (b, 3*num_output_frames//3 ... ) == (b, h, w, 3) for one output
    frame; mean-shift residual learning over the whole clip."""

    num_input_frames: int = 4
    num_output_frames: int = 1
    mid_channels: tuple = (512, 256, 128, 64)
    layers: tuple = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, images):
        b, t, h, w, c = images.shape
        mean = images.mean(axis=(1, 2, 3), keepdims=True)
        x = images - mean

        mc = self.mid_channels[::-1]  # encoder order: 64, 128, 256, 512

        # stem (flavr_net.py:459-480): (3,7,7)/(1,2,2)
        x0 = nn.relu(
            nn.Conv(mc[0], (3, 7, 7), strides=(1, 2, 2), padding="SAME",
                    use_bias=False, name="stem")(x)
        )

        def layer(h_in, ch, n, stride, name):
            h_out = _FlavrBlock(ch, stride, name=f"{name}_0")(h_in)
            for i in range(1, n):
                h_out = _FlavrBlock(ch, name=f"{name}_{i}")(h_out)
            return h_out

        x1 = layer(x0, mc[0], self.layers[0], (1, 1, 1), "layer1")
        x2 = layer(x1, mc[1], self.layers[1], (1, 2, 2), "layer2")
        x3 = layer(x2, mc[2], self.layers[2], (1, 2, 2), "layer3")
        x4 = layer(x3, mc[3], self.layers[3], (1, 1, 1), "layer4")

        # decoder (flavr_net.py:250-343), join_type='concat'
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        d3 = lrelu(_GatedConv3d(self.mid_channels[1], name="dec0")(x4))
        d3 = jnp.concatenate([d3, x3], axis=-1)
        d2 = lrelu(_UpConv3d(self.mid_channels[2], name="dec1")(d3))
        d2 = jnp.concatenate([d2, x2], axis=-1)
        d1 = lrelu(_UpConv3d(self.mid_channels[3], name="dec2")(d2))
        d1 = jnp.concatenate([d1, x1], axis=-1)
        d0 = lrelu(_GatedConv3d(self.mid_channels[3], name="dec3")(d1))
        d0 = jnp.concatenate([d0, x0], axis=-1)
        out = lrelu(_UpConv3d(self.mid_channels[3], name="dec4")(d0))

        # unbind time -> channels (flavr_net.py:326-327)
        bb, tt, hh, ww, cc = out.shape
        out = out.transpose(0, 2, 3, 1, 4).reshape(bb, hh, ww, tt * cc)
        out = nn.leaky_relu(
            nn.Conv(self.mid_channels[3], (1, 1), use_bias=False,
                    name="feature_fuse")(out),
            0.2,
        )
        out = jnp.pad(out, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        out = nn.Conv(3 * self.num_output_frames, (7, 7), padding="VALID",
                      name="conv_last")(out)
        out = out.reshape(b, h, w, self.num_output_frames, 3) + mean[:, 0][:, :, :, None]
        if self.num_output_frames == 1:
            return out[:, :, :, 0]
        return out.transpose(0, 3, 1, 2, 4)
