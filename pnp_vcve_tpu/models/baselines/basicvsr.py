"""Upstream BasicVSR / IconVSR backbones (the flagship's ancestors).

Reference: mmedit/models/backbones/sr_backbones/basicvsr_net.py:15-175
(``BasicVSRNet``) and iconvsr.py:15-341 (IconVSR with EDVR refill omitted —
the PnP configs never use it; the refill path is a round-2 item with EDVR).
Bidirectional SPyNet-flow propagation with flow-warped features and
residual-block stacks, x4 pixel-shuffle upsampling.

Same scan formulation as the flagship: both sweeps are nn.scan steps with
the feature buffer carried.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pnp_vcve_tpu.models.spynet import SPyNet
from pnp_vcve_tpu.models.init import torch_conv_default, torch_conv_bias_default
from pnp_vcve_tpu.ops.warp import flow_warp
from pnp_vcve_tpu.ops.upsample import pixel_shuffle, bilinear_resize
from pnp_vcve_tpu.ops.dynamic_conv import conv2d_nhwc
from .basicvsr_pp import ResidualBlocksWithInputConv

__all__ = ["BasicVSRNet", "IconVSRNet"]


class _Sweep(nn.Module):
    mid_channels: int
    num_blocks: int
    concat_current: bool  # forward sweep concatenates the backward feature

    @nn.compact
    def __call__(self, carry, xs):
        feat_prop = carry
        i, lr, flow, extra = xs
        warped = flow_warp(feat_prop, flow)
        warped = jnp.where(i == 0, jnp.zeros_like(warped), warped)
        if self.concat_current:
            feat = jnp.concatenate([extra, lr, warped], axis=-1)
        else:
            feat = jnp.concatenate([lr, warped], axis=-1)
        feat_prop = ResidualBlocksWithInputConv(
            out_channels=self.mid_channels, num_blocks=self.num_blocks,
            name="resblocks",
        )(feat)
        return feat_prop, feat_prop


class BasicVSRNet(nn.Module):
    """Bidirectional SPyNet propagation + x4 upsampling
    (reference basicvsr_net.py:15-175)."""

    mid_channels: int = 64
    num_blocks: int = 30

    @nn.compact
    def __call__(self, lrs, **_ignored):
        b, t, h, w, c = lrs.shape
        cm = self.mid_channels

        spynet = SPyNet(name="spynet")
        prev = lrs[:, :-1].reshape(b * (t - 1), h, w, c)
        nxt = lrs[:, 1:].reshape(b * (t - 1), h, w, c)
        flows_backward = spynet(prev, nxt).reshape(b, t - 1, h, w, 2)
        flows_forward = spynet(nxt, prev).reshape(b, t - 1, h, w, 2)

        def tfirst(x):
            return jnp.moveaxis(x, 1, 0)

        def run(name, lr_seq, flows, extra_seq, concat_current):
            scan = nn.scan(
                _Sweep, variable_broadcast="params",
                split_rngs={"params": False}, in_axes=0, out_axes=0,
            )(mid_channels=cm, num_blocks=self.num_blocks,
              concat_current=concat_current, name=name)
            zero = jnp.zeros((b, 1, h, w, 2), flows.dtype)
            flows_step = jnp.concatenate([zero, flows], axis=1)
            xs = (
                jnp.arange(lr_seq.shape[1], dtype=jnp.int32),
                tfirst(lr_seq),
                tfirst(flows_step),
                tfirst(extra_seq),
            )
            carry = jnp.zeros((b, h, w, cm), lr_seq.dtype)
            _, ys = scan(carry, xs)
            return jnp.moveaxis(ys, 0, 1)

        # backward sweep on flipped time
        dummy = jnp.zeros((b, t, h, w, 0), lrs.dtype)
        bwd = run("backward_resblocks", jnp.flip(lrs, 1),
                  jnp.flip(flows_backward, 1), dummy, False)
        bwd = jnp.flip(bwd, 1)
        fwd = run("forward_resblocks", lrs, flows_forward, bwd, True)

        # per-frame upsampling head (basicvsr_net.py:118-146)
        feat = jnp.concatenate([bwd, fwd], axis=-1).reshape(b * t, h, w, 2 * cm)
        y = nn.leaky_relu(nn.Conv(cm, (1, 1), name="fusion")(feat), 0.1)
        up1_k = self.param("upsample1_kernel", torch_conv_default, (3, 3, cm, 4 * cm))
        up1_b = self.param("upsample1_bias", torch_conv_bias_default(9 * cm), (4 * cm,))
        up2_k = self.param("upsample2_kernel", torch_conv_default, (3, 3, cm, 256))
        up2_b = self.param("upsample2_bias", torch_conv_bias_default(9 * cm), (256,))
        y = nn.leaky_relu(pixel_shuffle(conv2d_nhwc(y, up1_k, up1_b), 2), 0.1)
        y = nn.leaky_relu(pixel_shuffle(conv2d_nhwc(y, up2_k, up2_b), 2), 0.1)
        y = nn.leaky_relu(nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")(y), 0.1)
        y = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")(y)
        y = y.reshape(b, t, 4 * h, 4 * w, 3)

        base = jax.image.resize(
            lrs.reshape(b * t, h, w, c), (b * t, 4 * h, 4 * w, c), "bilinear"
        ).reshape(b, t, 4 * h, 4 * w, c)
        return y + base


class _RefillSweep(nn.Module):
    """One IconVSR propagation step: warp carry, fuse the EDVR refill
    feature at (static-strided) keyframes, run the resblock stack
    (reference iconvsr.py:199-254)."""

    mid_channels: int
    num_blocks: int
    concat_current: bool

    @nn.compact
    def __call__(self, carry, xs):
        feat_prop = carry
        i, lr, flow, refill, is_key, extra = xs
        warped = flow_warp(feat_prop, flow)
        warped = jnp.where(i == 0, jnp.zeros_like(warped), warped)
        fused = nn.Conv(self.mid_channels, (3, 3), padding="SAME", name="fusion")(
            jnp.concatenate([warped, refill], axis=-1)
        )
        warped = jnp.where(is_key, fused, warped)
        if self.concat_current:
            feat = jnp.concatenate([lr, extra, warped], axis=-1)
        else:
            feat = jnp.concatenate([lr, warped], axis=-1)
        feat_prop = ResidualBlocksWithInputConv(
            out_channels=self.mid_channels, num_blocks=self.num_blocks,
            name="resblocks",
        )(feat)
        return feat_prop, feat_prop


class IconVSRNet(nn.Module):
    """IconVSR with EDVR information refill (reference iconvsr.py:15-265):
    keyframes every ``keyframe_stride`` frames (+ the last frame) get their
    propagated features fused with EDVR-M features of a mirrored
    (2*padding+1)-frame window; otherwise BasicVSR propagation + x4 head.

    Keyframe indices are static, so the refill features are computed only
    at keyframes and scattered into a (t,...) scan input; the fusion conv
    runs every step behind a select (cheap vs a ragged gather)."""

    mid_channels: int = 64
    num_blocks: int = 30
    keyframe_stride: int = 5
    padding: int = 2

    @nn.compact
    def __call__(self, lrs, **_ignored):
        from pnp_vcve_tpu.models.baselines.edvr import EDVRFeatureExtractor

        b, t, h, w, c = lrs.shape
        cm = self.mid_channels

        keyframe_idx = list(range(0, t, self.keyframe_stride))
        if keyframe_idx[-1] != t - 1:
            keyframe_idx.append(t - 1)

        # mirrored end padding (iconvsr.py:136-140), then EDVR windows
        p = self.padding
        if p == 2:
            padded = jnp.concatenate([lrs[:, jnp.asarray([4, 3])], lrs,
                                      lrs[:, jnp.asarray([-4, -5])]], axis=1)
        elif p == 3:
            padded = jnp.concatenate([lrs[:, jnp.asarray([6, 5, 4])], lrs,
                                      lrs[:, jnp.asarray([-5, -6, -7])]], axis=1)
        else:
            raise ValueError(f"padding must be 2 or 3, got {p}")
        nf = 2 * p + 1
        edvr = EDVRFeatureExtractor(
            mid_channels=cm, num_frames=nf, name="edvr"
        )
        refill = jnp.zeros((b, t, h, w, cm), lrs.dtype)
        for i in keyframe_idx:
            refill = refill.at[:, i].set(edvr(padded[:, i : i + nf]))
        is_key = np.zeros((t,), bool)
        is_key[keyframe_idx] = True
        is_key = jnp.asarray(is_key)[None, :].repeat(b, 0)

        spynet = SPyNet(name="spynet")
        prev = lrs[:, :-1].reshape(b * (t - 1), h, w, c)
        nxt = lrs[:, 1:].reshape(b * (t - 1), h, w, c)
        flows_backward = spynet(prev, nxt).reshape(b, t - 1, h, w, 2)
        flows_forward = spynet(nxt, prev).reshape(b, t - 1, h, w, 2)

        def tfirst(x):
            return jnp.moveaxis(x, 1, 0)

        def run(name, lr_seq, flows, refill_seq, keys, extra_seq, concat_current):
            scan = nn.scan(
                _RefillSweep, variable_broadcast="params",
                split_rngs={"params": False}, in_axes=0, out_axes=0,
            )(mid_channels=cm, num_blocks=self.num_blocks,
              concat_current=concat_current, name=name)
            zero = jnp.zeros((b, 1, h, w, 2), flows.dtype)
            flows_step = jnp.concatenate([zero, flows], axis=1)
            xs = (
                jnp.arange(t, dtype=jnp.int32),
                tfirst(lr_seq),
                tfirst(flows_step),
                tfirst(refill_seq),
                tfirst(keys[..., None, None, None]),
                tfirst(extra_seq),
            )
            carry = jnp.zeros((b, h, w, cm), lr_seq.dtype)
            _, ys = scan(carry, xs)
            return jnp.moveaxis(ys, 0, 1)

        dummy = jnp.zeros((b, t, h, w, 0), lrs.dtype)
        bwd = run("backward", jnp.flip(lrs, 1), jnp.flip(flows_backward, 1),
                  jnp.flip(refill, 1), jnp.flip(is_key, 1), dummy, False)
        bwd = jnp.flip(bwd, 1)
        fwd = run("forward", lrs, flows_forward, refill, is_key, bwd, True)

        y = fwd.reshape(b * t, h, w, cm)
        up1_k = self.param("upsample1_kernel", torch_conv_default, (3, 3, cm, 4 * cm))
        up1_b = self.param("upsample1_bias", torch_conv_bias_default(9 * cm), (4 * cm,))
        up2_k = self.param("upsample2_kernel", torch_conv_default, (3, 3, cm, 256))
        up2_b = self.param("upsample2_bias", torch_conv_bias_default(9 * cm), (256,))
        y = nn.leaky_relu(pixel_shuffle(conv2d_nhwc(y, up1_k, up1_b), 2), 0.1)
        y = nn.leaky_relu(pixel_shuffle(conv2d_nhwc(y, up2_k, up2_b), 2), 0.1)
        y = nn.leaky_relu(nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")(y), 0.1)
        y = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")(y)
        y = y.reshape(b, t, 4 * h, 4 * w, 3)
        base = jax.image.resize(
            lrs.reshape(b * t, h, w, c), (b * t, 4 * h, 4 * w, c), "bilinear"
        ).reshape(b, t, 4 * h, 4 * w, c)
        return y + base
