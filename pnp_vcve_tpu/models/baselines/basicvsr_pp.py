"""BasicVSR++ with PQF-guided second-order propagation.

Reference: mmedit/models/backbones/sr_backbones/basicvsr_pp_v2.py:17-393
(``BasicVSRPlusPlus_PQF``): four propagation branches (backward/forward x2),
each step aligning (first-order neighbor, second-order nearest PQF) features
with a flow-guided second-order deformable conv, then residual blocks; a
reconstruction head over all branch features.

TPU-native redesign of the data-dependent parts:

- The reference picks the second-order feature by scanning the slice-type
  list at every step (basicvsr_pp_v2.py:213-240) and composes the flow to
  it with a variable-length warp chain. Here both become scan carries:
  ``pqf_feat`` (feature at the last PQF), ``age`` (steps since), and ``D``,
  the chained flow, with the recurrences

      D'   = where(is_pqf[i], flows[i], warp(D, flows[i]))
      age' = where(is_pqf[i], 1, age + 1)

  which reproduce the reference's chain ``warp(...warp(flows[L],
  flows[L+1])..., flows[i-1])`` exactly — including its quirk of
  *resampling* (not composing) the chain segments.
- Backward sweeps reuse the forward scan on time-flipped inputs (the
  flipped flow array lines up index-for-index).
- The reference reads batch item 0's slice types for every batch item
  (basicvsr_pp_v2.py:213); we route per batch item.

Variant family (the ``variant`` field):

- ``'base'``  — BasicVSRPlusPlus_PQF (basicvsr_pp_v2.py:17-393): all four
  branches PQF-guided, resample-style flow chain.
- ``'v2'`` — :395-502: proper flow composition (``tmp + warp(acc, tmp)``).
- ``'v2_withB_skip'`` — :504-628: branches 2 use vanilla BasicVSR++
  second-order (lag-2 frame) instead of PQF guidance.
- ``'v2_onlyB_skip'`` — :630-789: branches 2 key on B frames (slice 66).

NOTE on ``basicvsr_pp_mv.py``: despite the name, the reference file is a
verbatim copy of basicvsr_pp_v2.py plus a DEAD ``MV_Warp`` stub (empty
forward, never instantiated) — verified by diff; there is no actual MV-fed
propagation to port. The same classes registered there resolve to this
module's variants.

Layout: NHWC; flows (b, t-1, h, w, 2) in (dx, dy).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.models.spynet import SPyNet
from pnp_vcve_tpu.models.init import torch_conv_default, torch_conv_bias_default
from pnp_vcve_tpu.ops.warp import flow_warp
from pnp_vcve_tpu.ops.deform_conv import modulated_deform_conv2d
from pnp_vcve_tpu.ops.upsample import pixel_shuffle, bilinear_resize
from pnp_vcve_tpu.ops.dynamic_conv import conv2d_nhwc

__all__ = ["BasicVSRPlusPlusPQF", "BasicVSRPlusPlus"]


class ResidualBlocksWithInputConv(nn.Module):
    """conv + lrelu + N plain residual blocks (reference basicvsr_net.py:393-429)."""

    out_channels: int = 64
    num_blocks: int = 7

    @nn.compact
    def __call__(self, x):
        feat = nn.leaky_relu(
            nn.Conv(self.out_channels, (3, 3), padding="SAME", name="input_conv")(x),
            0.1,
        )
        for i in range(self.num_blocks):
            y = nn.relu(nn.Conv(self.out_channels, (3, 3), padding="SAME",
                                name=f"block{i}_conv1")(feat))
            y = nn.Conv(self.out_channels, (3, 3), padding="SAME",
                        name=f"block{i}_conv2")(y)
            feat = feat + y
        return feat


class SecondOrderDeformableAlignment(nn.Module):
    """Flow-guided second-order DCN (reference basicvsr_pp_v2.py:790-852).

    x = cat(feat_prop, feat_n2) (2c); cond = cat(cond_n1, feat_cur, cond_n2);
    offsets = max_mag * tanh(head) + flow_k, first-half groups guided by
    flow_1 (feat_prop channels), second half by flow_2 (feat_n2 channels).
    """

    channels: int = 64
    deform_groups: int = 16
    max_residue_magnitude: float = 10.0

    @nn.compact
    def __call__(self, x2c, cond, flow1, flow2):
        b, h, w, _ = x2c.shape
        c, g = self.channels, self.deform_groups
        y = jnp.concatenate([cond, flow1, flow2], axis=-1)
        for i in range(3):
            y = nn.leaky_relu(
                nn.Conv(c, (3, 3), padding="SAME", name=f"conv_offset{i}")(y), 0.1
            )
        y = nn.Conv(27 * g, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv_offset3")(y)
        o1, o2, mask = jnp.split(y, 3, axis=-1)
        off = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1)
        )
        off1, off2 = jnp.split(off, 2, axis=-1)
        # (b,h,w,9g) -> (b,h,w,g/2? ) : first-order offsets serve the first
        # half of the deform groups (the feat_prop channels), second-order
        # the rest; each is (dy,dx) interleaved per kernel point
        off1 = off1.reshape(b, h, w, g // 2, 9, 2) + flow1[..., ::-1][:, :, :, None, None, :]
        off2 = off2.reshape(b, h, w, g // 2, 9, 2) + flow2[..., ::-1][:, :, :, None, None, :]
        offsets = jnp.concatenate([off1, off2], axis=3)
        mask = nn.sigmoid(mask).reshape(b, h, w, g, 9)

        kernel = self.param("weight", torch_conv_default, (3, 3, 2 * c, c))
        bias = self.param("bias", torch_conv_bias_default(9 * 2 * c), (c,))
        return modulated_deform_conv2d(x2c, offsets, mask, kernel, bias)


class _PropagateStep(nn.Module):
    """One scan step of a propagation branch.

    Second-order carry design (reference basicvsr_pp_v2.py:200-257): the
    reference rescans the key list per step for the most recent key at lag
    >= 2 and composes the flow to it with a variable-length chain. Here:

    - two slots track keys by lag: ``q`` holds frame i-2 (newly eligible
      this step); (n2_feat, n2_chain, n2_valid) hold the most recent
      ELIGIBLE key — q promotes into n2 when q is a key, which exactly
      reproduces "first key at lag >= 2" even when a newer (lag-1) key
      shadows an older eligible one;
    - the chain updates in O(1) per step. ``flow_compose='resample'`` is the
      base class's quirky warp-only fold with a final flow_n1 add
      (basicvsr_pp_v2.py:225-237); 'compose' is the _v2 family's proper
      ``flow_tmp + warp(acc, flow_tmp)`` fold (:445-472);
    - ``second_order='plain'`` is vanilla BasicVSR++ (n2 = lag-2 frame
      always, the branch-2 mode of _v2_withB_skip, :613-620).
    """

    channels: int
    num_blocks: int
    deform_groups: int
    max_residue_magnitude: float
    n_prev: int  # number of previous-branch feature stacks consumed
    flow_compose: str = "resample"  # 'resample' (base) | 'compose' (_v2)
    second_order: str = "pqf"  # 'pqf' | 'plain'

    @nn.compact
    def __call__(self, carry, xs):
        (feat_prop, p_key, q_feat, q_key, prev_flow,
         n2_feat, n2_chain, n2_valid) = carry
        i, feat_cur, prev_feats, flow_n1, is_key = xs
        b, h, w, c = feat_prop.shape

        is_first = i == 0
        cond_n1 = flow_warp(feat_prop, flow_n1)

        if self.second_order == "plain":
            # vanilla BasicVSR++ second order: lag-2 feature, one-step
            # composed flow (basicvsr_pp.py:613-620 reference lines)
            has_n2 = (i >= 2) & jnp.ones((b,), bool)
            has_n2 = has_n2[:, None, None, None]
            flow_n2 = jnp.where(
                has_n2, flow_n1 + flow_warp(prev_flow, flow_n1), 0.0
            )
            feat_n2 = jnp.where(has_n2, q_feat, 0.0)
        else:
            # promote the newly eligible lag-2 frame if it is a key
            promote = q_key[:, None, None, None]
            n2_feat = jnp.where(promote, q_feat, n2_feat)
            n2_valid = q_key | n2_valid
            chain_prev = jnp.where(promote, prev_flow, n2_chain)
            if self.flow_compose == "compose":
                n2_chain = flow_n1 + flow_warp(chain_prev, flow_n1)
                flow_n2_full = n2_chain
            else:
                n2_chain = flow_warp(chain_prev, flow_n1)
                flow_n2_full = flow_n1 + n2_chain
            has_n2 = (n2_valid & (i >= 2))[:, None, None, None]
            flow_n2 = jnp.where(has_n2, flow_n2_full, 0.0)
            feat_n2 = jnp.where(has_n2, n2_feat, 0.0)

        cond_n2 = jnp.where(has_n2, flow_warp(feat_n2, flow_n2), 0.0)

        cond = jnp.concatenate([cond_n1, feat_cur, cond_n2], axis=-1)
        x2c = jnp.concatenate([feat_prop, feat_n2], axis=-1)
        aligned = SecondOrderDeformableAlignment(
            channels=c, deform_groups=self.deform_groups,
            max_residue_magnitude=self.max_residue_magnitude, name="deform_align",
        )(x2c, cond, flow_n1, flow_n2)
        new_prop = jnp.where(is_first, feat_prop, aligned)

        if self.n_prev:
            feat_in = jnp.concatenate([feat_cur, prev_feats, new_prop], axis=-1)
        else:
            feat_in = jnp.concatenate([feat_cur, new_prop], axis=-1)
        new_prop = new_prop + ResidualBlocksWithInputConv(
            out_channels=c, num_blocks=self.num_blocks, name="backbone"
        )(feat_in)

        # end-of-step shifts: current frame becomes lag-1, lag-1 becomes lag-2
        new_carry = (
            new_prop, is_key, feat_prop, p_key, flow_n1,
            n2_feat, n2_chain, n2_valid,
        )
        return new_carry, new_prop


class BasicVSRPlusPlus(nn.Module):
    """Vanilla BasicVSR++ (reference basicvsr_pp.py:17-383): SPyNet flows,
    four second-order propagation branches where the second-order feature is
    always the branch output at lag 2 (feats[module][-2], :209-220) and the
    second-order flow the one-step composition ``flow_n1 + warp(flow_n2,
    flow_n1)`` — i.e. the ``second_order='plain'`` mode of
    :class:`_PropagateStep` on every branch. The natural downstream VSR for
    the plug-and-play ``--cascade`` story (reference README.md:86-106).

    Same parameter layout as the PQF family, so
    ``core.convert_baselines.convert_bvpp_pqf`` converts its checkpoints.

    ``is_mirror_extended=True`` (reference check_if_mirror_extended,
    :113-127, decided host-side in train/eval.py) reuses flipped backward
    flows for the forward sweeps (:356-359) instead of a second SPyNet pass.
    """

    mid_channels: int = 64
    num_blocks: int = 7
    max_residue_magnitude: float = 10.0
    is_low_res_input: bool = True
    deform_groups: int = 16

    @nn.compact
    def __call__(self, lrs, qps=None, slices=None, is_mirror_extended=False,
                 **_ignored):
        # the sweep driver is shared with the PQF family
        # (BasicVSRPlusPlusPQF._sweep; second_order='plain' ignores the
        # keyframe stream and the flow_compose mode)
        b, t, h, w, c_in = lrs.shape
        cm = self.mid_channels

        if self.is_low_res_input:
            lqs_down = lrs
            feat_fn = ResidualBlocksWithInputConv(cm, 5, name="feat_extract")
            feats = feat_fn(lrs.reshape(b * t, h, w, c_in))
            fh, fw = h, w
        else:
            lqs_down = jax.image.resize(
                lrs.reshape(b * t, h, w, c_in),
                (b * t, h // 4, w // 4, c_in), "bicubic",
            ).reshape(b, t, h // 4, w // 4, c_in)

            y = nn.leaky_relu(nn.Conv(cm, (3, 3), strides=(2, 2), padding="SAME",
                                      name="feat_down0")(lrs.reshape(b * t, h, w, c_in)), 0.1)
            y = nn.leaky_relu(nn.Conv(cm, (3, 3), strides=(2, 2), padding="SAME",
                                      name="feat_down1")(y), 0.1)
            feats = ResidualBlocksWithInputConv(cm, 5, name="feat_extract")(y)
            fh, fw = h // 4, w // 4
        feats = feats.reshape(b, t, fh, fw, cm)

        spynet = SPyNet(name="spynet")
        prev = lqs_down[:, :-1].reshape(b * (t - 1), fh, fw, c_in)
        nxt = lqs_down[:, 1:].reshape(b * (t - 1), fh, fw, c_in)
        flows_backward = spynet(prev, nxt).reshape(b, t - 1, fh, fw, 2)
        if is_mirror_extended:
            # flows_forward = flows_backward.flip(1) (reference :152-153,356-359)
            flows_forward = jnp.flip(flows_backward, 1)
        else:
            flows_forward = spynet(nxt, prev).reshape(b, t - 1, fh, fw, 2)

        keys = jnp.ones((b, t), bool)  # unused by second_order='plain'
        branch_feats = []
        for it in (1, 2):
            for direction in ("backward", "forward"):
                name = f"{direction}_{it}"
                prev_stacks = (
                    jnp.concatenate(branch_feats, axis=-1) if branch_feats else None
                )
                if direction == "backward":
                    fs = jnp.flip(feats, 1)
                    ps = jnp.flip(prev_stacks, 1) if prev_stacks is not None else None
                    fl = jnp.flip(flows_backward, 1)
                    out = BasicVSRPlusPlusPQF._sweep(
                        self, name, len(branch_feats), fs, ps, fl,
                        jnp.flip(keys, 1), "compose", "plain",
                    )
                    out = jnp.flip(out, 1)
                else:
                    out = BasicVSRPlusPlusPQF._sweep(
                        self, name, len(branch_feats), feats, prev_stacks,
                        flows_forward, keys, "compose", "plain",
                    )
                branch_feats.append(out)

        hr = jnp.concatenate([feats] + branch_feats, axis=-1)
        hr = hr.reshape(b * t, fh, fw, 5 * cm)
        hr = ResidualBlocksWithInputConv(cm, 5, name="reconstruction")(hr)
        up1_k = self.param("upsample1_kernel", torch_conv_default, (3, 3, cm, 4 * cm))
        up1_b = self.param("upsample1_bias", torch_conv_bias_default(9 * cm), (4 * cm,))
        up2_k = self.param("upsample2_kernel", torch_conv_default, (3, 3, cm, 256))
        up2_b = self.param("upsample2_bias", torch_conv_bias_default(9 * cm), (256,))
        hr = nn.leaky_relu(pixel_shuffle(conv2d_nhwc(hr, up1_k, up1_b), 2), 0.1)
        hr = nn.leaky_relu(pixel_shuffle(conv2d_nhwc(hr, up2_k, up2_b), 2), 0.1)
        hr = nn.leaky_relu(nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")(hr), 0.1)
        hr = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")(hr)
        hr = hr.reshape(b, t, 4 * fh, 4 * fw, 3)

        if self.is_low_res_input:
            base = jax.image.resize(
                lrs.reshape(b * t, h, w, c_in),
                (b * t, 4 * h, 4 * w, c_in), "bilinear",
            ).reshape(b, t, 4 * h, 4 * w, c_in)
        else:
            base = lrs
            hr = hr[:, :, :h, :w]
        return hr + base


class BasicVSRPlusPlusPQF(nn.Module):
    """4-branch PQF-guided BasicVSR++ (x4 VSR or same-size enhancement)."""

    mid_channels: int = 64
    num_blocks: int = 7
    max_residue_magnitude: float = 10.0
    is_low_res_input: bool = True
    deform_groups: int = 16
    # 'base' (BasicVSRPlusPlus_PQF), 'v2', 'v2_withB_skip', 'v2_onlyB_skip'
    # (basicvsr_pp_v2.py:17,395,504,630)
    variant: str = "base"

    def _sweep(
        self, name, n_prev, feats_stack, prev_stacks, flows, is_key,
        flow_compose, second_order,
    ):
        """Run one propagation branch over time with nn.scan."""
        b, t = feats_stack.shape[0], feats_stack.shape[1]
        c = self.mid_channels
        h, w = feats_stack.shape[2], feats_stack.shape[3]

        scan = nn.scan(
            _PropagateStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(
            channels=c, num_blocks=self.num_blocks,
            deform_groups=self.deform_groups,
            max_residue_magnitude=self.max_residue_magnitude,
            n_prev=n_prev, flow_compose=flow_compose,
            second_order=second_order, name=name,
        )

        def tfirst(x):
            return jnp.moveaxis(x, 1, 0)

        # flows per step: step i consumes flows[i-1]; prepend zeros
        zero_flow = jnp.zeros((b, 1, h, w, 2), flows.dtype)
        flows_step = jnp.concatenate([zero_flow, flows], axis=1)

        xs = (
            jnp.arange(t, dtype=jnp.int32),
            tfirst(feats_stack),
            tfirst(prev_stacks) if prev_stacks is not None else jnp.zeros((t, b, h, w, 0), feats_stack.dtype),
            tfirst(flows_step),
            tfirst(is_key),
        )
        zf = jnp.zeros((b, h, w, c), feats_stack.dtype)
        carry = (
            zf,                                        # feat_prop (lag 1)
            jnp.zeros((b,), bool),                     # p_key
            zf,                                        # q_feat (lag 2)
            jnp.zeros((b,), bool),                     # q_key
            jnp.zeros((b, h, w, 2), flows.dtype),      # prev_flow
            zf,                                        # n2_feat
            jnp.zeros((b, h, w, 2), flows.dtype),      # n2_chain
            jnp.zeros((b,), bool),                     # n2_valid
        )
        _, ys = scan(carry, xs)
        return jnp.moveaxis(ys, 0, 1)  # (b, t, h, w, c)

    @nn.compact
    def __call__(self, lrs, qps=None, slices=None, **_ignored):
        b, t, h, w, c_in = lrs.shape
        cm = self.mid_channels

        if self.is_low_res_input:
            lqs_down = lrs
        else:
            lqs_down = jax.image.resize(
                lrs.reshape(b * t, h, w, c_in),
                (b * t, h // 4, w // 4, c_in), "bicubic",
            ).reshape(b, t, h // 4, w // 4, c_in)

        # spatial features
        if self.is_low_res_input:
            feat_fn = ResidualBlocksWithInputConv(cm, 5, name="feat_extract")
            feats = feat_fn(lrs.reshape(b * t, h, w, c_in))
            fh, fw = h, w
        else:
            def extract(x):
                y = nn.leaky_relu(nn.Conv(cm, (3, 3), strides=(2, 2), padding="SAME",
                                          name="feat_down0")(x), 0.1)
                y = nn.leaky_relu(nn.Conv(cm, (3, 3), strides=(2, 2), padding="SAME",
                                          name="feat_down1")(y), 0.1)
                return ResidualBlocksWithInputConv(cm, 5, name="feat_extract")(y)

            feats = extract(lrs.reshape(b * t, h, w, c_in))
            fh, fw = h // 4, w // 4
        feats = feats.reshape(b, t, fh, fw, cm)

        # flows from SPyNet on the low-res frames
        spynet = SPyNet(name="spynet")
        prev = lqs_down[:, :-1].reshape(b * (t - 1), fh, fw, c_in)
        nxt = lqs_down[:, 1:].reshape(b * (t - 1), fh, fw, c_in)
        flows_backward = spynet(prev, nxt).reshape(b, t - 1, fh, fw, 2)
        flows_forward = spynet(nxt, prev).reshape(b, t - 1, fh, fw, 2)

        if slices is None:
            is_pqf = jnp.ones((b, t), bool)
            is_b = jnp.zeros((b, t), bool)
        else:
            is_pqf = (slices == 73.0) | (slices == 80.0)
            is_b = slices == 66.0

        # per-variant branch behavior (see class docstring / reference lines)
        if self.variant == "base":
            branch_cfg = {1: ("pqf", "resample", is_pqf), 2: ("pqf", "resample", is_pqf)}
        elif self.variant == "v2":
            branch_cfg = {1: ("pqf", "compose", is_pqf), 2: ("pqf", "compose", is_pqf)}
        elif self.variant == "v2_withB_skip":
            # branches 2 fall back to vanilla BasicVSR++ second order
            branch_cfg = {1: ("pqf", "compose", is_pqf), 2: ("plain", "compose", is_pqf)}
        elif self.variant == "v2_onlyB_skip":
            # branches 2 key on B frames (basicvsr_pp_v2.py:694-699)
            branch_cfg = {1: ("pqf", "compose", is_pqf), 2: ("pqf", "compose", is_b)}
        else:
            raise ValueError(f"unknown variant {self.variant!r}")

        branch_feats = []
        for it in (1, 2):
            second_order, flow_compose, keys_it = branch_cfg[it]
            for direction in ("backward", "forward"):
                name = f"{direction}_{it}"
                prev_stacks = (
                    jnp.concatenate(branch_feats, axis=-1) if branch_feats else None
                )
                if direction == "backward":
                    fs = jnp.flip(feats, 1)
                    ps = jnp.flip(prev_stacks, 1) if prev_stacks is not None else None
                    fl = jnp.flip(flows_backward, 1)
                    keys = jnp.flip(keys_it, 1)
                    out = self._sweep(
                        name, len(branch_feats), fs, ps, fl, keys,
                        flow_compose, second_order,
                    )
                    out = jnp.flip(out, 1)
                else:
                    out = self._sweep(
                        name, len(branch_feats), feats, prev_stacks,
                        flows_forward, keys_it, flow_compose, second_order,
                    )
                branch_feats.append(out)

        # reconstruction head
        hr = jnp.concatenate([feats] + branch_feats, axis=-1)
        hr = hr.reshape(b * t, fh, fw, 5 * cm)
        hr = ResidualBlocksWithInputConv(cm, 5, name="reconstruction")(hr)
        up1_k = self.param("upsample1_kernel", torch_conv_default, (3, 3, cm, 4 * cm))
        up1_b = self.param("upsample1_bias", torch_conv_bias_default(9 * cm), (4 * cm,))
        up2_k = self.param("upsample2_kernel", torch_conv_default, (3, 3, cm, 256))
        up2_b = self.param("upsample2_bias", torch_conv_bias_default(9 * cm), (256,))
        hr = nn.leaky_relu(pixel_shuffle(conv2d_nhwc(hr, up1_k, up1_b), 2), 0.1)
        hr = nn.leaky_relu(pixel_shuffle(conv2d_nhwc(hr, up2_k, up2_b), 2), 0.1)
        hr = nn.leaky_relu(nn.Conv(64, (3, 3), padding="SAME", name="conv_hr")(hr), 0.1)
        hr = nn.Conv(3, (3, 3), padding="SAME", name="conv_last")(hr)
        hr = hr.reshape(b, t, 4 * fh, 4 * fw, 3)

        if self.is_low_res_input:
            base = jax.image.resize(
                lrs.reshape(b * t, h, w, c_in),
                (b * t, 4 * h, 4 * w, c_in), "bilinear",
            ).reshape(b, t, 4 * h, 4 * w, c_in)
        else:
            base = lrs
            hr = hr[:, :, :h, :w]  # same-size path: crop back (fh*4 == h)
        return hr + base
