"""PnP-VCVE flagship generator: CAA hyper-network + bidirectional BAE.

Reference model:
``IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par``
(mmedit/models/backbones/sr_backbones/iconvsr_ipb_par.py:17-149, parents
iconvsr_ipb.py:15-46 and iconvsr.py:344-523), flagship config
``configs/HR_davis_LR_128x128.py:4-26``.

TPU-native redesign
-------------------
The reference runs a Python double loop over ``t`` timesteps x ``n`` batch
items, with a data-dependent ``torch.where`` nearest-keyframe lookup per
(batch, step) (iconvsr_ipb_par.py:71-147). Here:

- Keyframe routing is precomputed as dense ``(b, t)`` index arrays from the
  slice-type codes with two cumulative scans (``cummax``/``cummin``) — no
  data-dependent control flow reaches the device loop.
- Both propagation sweeps are single ``nn.scan``-transformed steps with an
  O(1) carry ``(prev_out, last_keyframe_out, prev_was_key)``: in scan order
  the nearest keyframe is always the most recently processed one, so the
  reference's random-access feature list (``outputs[key_idx]``,
  iconvsr_ipb_par.py:81,116) needs no carried (b,t,h,w,c) store at all —
  the backward sweep's outputs are stacked scan outputs consumed by the
  forward sweep as per-step inputs.
- ``use_pallas_kernels=True`` routes every DRT block through the fused
  pixel-pair-packed Pallas kernel (kernels/drt_packed.py).
- Warping uses the bitstream flows directly (``ops.flow_warp``); slice codes
  73/'I' and 80/'P' mark keyframes, with the first/last frame forced
  (iconvsr_ipb_par.py:60-62).
- ``align_key`` aliasing (reuse the key warp as the neighbor warp when the
  neighbor IS the key, iconvsr_ipb_par.py:84-87,119-122) is a vectorized
  per-sample select.

Inputs are NHWC: ``lrs (b,t,h,w,3)``, ``mvs (b,t,h,w,4)`` (fwd x,y, bwd x,y),
``par_map (b,t,h,w,3)``, scalars ``qps/slices/base_qps (b,t)``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.models.alignment import (
    BasicDeformableAlignment,
    FVCDeformableAlignment,
)
from pnp_vcve_tpu.models.caa import BasePredictor, BiasPredictor, SEModule
from pnp_vcve_tpu.models.bae import ResidualBlocksWithInputConvDynamicDRT
from pnp_vcve_tpu.models.init import torch_conv_default, torch_conv_bias_default
from pnp_vcve_tpu.ops.dynamic_conv import conv2d_nhwc
from pnp_vcve_tpu.ops.warp import flow_warp
from pnp_vcve_tpu.ops.upsample import pixel_shuffle, bilinear_resize

__all__ = ["PnPVCVE", "keyframe_indices"]

I_SLICE = 73.0  # ord('I')
P_SLICE = 80.0  # ord('P')


def _fold_key_select() -> bool:
    """Opt-in (PNP_PF_FOLD_SELECT=1): fold the keyframe-carry select into
    the last stack block's epilogue (kernels/drt_stack.py _kernel_select)
    instead of an XLA where on the PF carry. MEASURED SLOWER at 720p/b=1:
    18.63 -> 17.95 f/s — the last block turns DMA-heavy (last_key tile
    read + a second tile write ~ +3x its output DMA) and loses more than
    the 1.8 ms/frame XLA broadcast-select it removes. Kept reachable for
    shapes where the balance flips (e.g. larger b amortizing weight DMA);
    the default is the XLA select."""
    import os

    return os.environ.get("PNP_PF_FOLD_SELECT", "0") == "1"


def keyframe_indices(slices: jnp.ndarray):
    """Dense keyframe routing tables from per-frame slice codes.

    Args:
      slices: (b, t) float/int slice-type codes (ord values).

    Returns:
      (keyframe (b,t) bool, key_fwd (b,t) int32, key_bwd (b,t) int32) where
      ``key_fwd[b,i]`` is the nearest keyframe index strictly before ``i``
      (valid for i>=1) and ``key_bwd[b,i]`` the nearest strictly after ``i``
      (valid for i<=t-2). First/last frames are forced keyframes
      (reference iconvsr_ipb_par.py:60-62).
    """
    slices = jnp.asarray(slices)
    b, t = slices.shape
    keyframe = (slices == I_SLICE) | (slices == P_SLICE)
    keyframe = keyframe.at[:, 0].set(True).at[:, -1].set(True)

    iota = jnp.arange(t, dtype=jnp.int32)[None, :]
    # nearest key at-or-before i, then shift to "strictly before"
    before = jax.lax.cummax(jnp.where(keyframe, iota, -1), axis=1)
    key_fwd = jnp.concatenate(
        [jnp.zeros((b, 1), jnp.int32), before[:, :-1]], axis=1
    )
    # nearest key at-or-after i, then shift to "strictly after"
    after = jnp.flip(
        jax.lax.cummin(jnp.flip(jnp.where(keyframe, iota, t), axis=1), axis=1),
        axis=1,
    )
    key_bwd = jnp.concatenate(
        [after[:, 1:], jnp.full((b, 1), t - 1, jnp.int32)], axis=1
    )
    return keyframe, key_fwd, key_bwd


class _BackwardStep(nn.Module):
    """One step of the backward sweep (scanned over time, last->first)."""

    mid_channels: int
    num_blocks: int
    num_experts: int
    with_se: bool
    one_layer: bool
    channel_first: bool
    with_cat: bool
    align_key: bool
    flow_interpolation: str
    use_dynamic: bool = True
    use_pallas: bool = False
    deform: str = "vos"
    deform_groups: int = 16
    warp_impl: str = "padgather"

    @property
    def pf_resident(self):
        """True = the PF-resident serving pipeline: carries and warps stay in
        the Pallas stack's pixel-pair-packed PF layout end to end (warp_pf ->
        input_conv_pf(part_pf) -> PF stack -> PF carry), eliminating the XLA
        block-window gather (measured 22.3 ms/frame of warp+fallout at 720p)
        AND all pad/transpose glue. Serving-only, like block8: exact for
        8x8-block-constant flows with |MV| <= 16 (kernels/warp_pf.py)."""
        return self.warp_impl == "pf"

    def _align(self, feat, flow):
        """Keyframe aligner (reference self.deform_align, iconvsr_ipb.py:19-28).
        NOTE: the reference shares ONE aligner module between the backward and
        forward sweeps; here each sweep owns its params (flax scan scoping) and
        the checkpoint converter writes the reference weights into both."""
        if self.pf_resident:
            from pnp_vcve_tpu.kernels.warp_pf import flow_warp_pf

            h, w = flow.shape[1:3]
            wh = w // 2
            tile = next(t for t in (128, 64, 32, 16, 8) if wh % t == 0)
            return flow_warp_pf(feat, flow, h, w, tile=tile)
        if self.deform == "vos":
            return flow_warp(
                feat, flow, self.flow_interpolation, impl=self.warp_impl
            )
        if self.deform == "basic":
            return BasicDeformableAlignment(
                channels=self.mid_channels,
                deform_groups=self.deform_groups,
                flow_interpolation=self.flow_interpolation,
                name="deform_align",
            )(feat, flow)
        if self.deform == "fvc":
            return FVCDeformableAlignment(
                channels=self.mid_channels,
                deform_groups=self.deform_groups,
                name="deform_align",
            )(feat, flow)
        raise ValueError(f"No such DCN type: {self.deform!r}")

    def premix(self, weights_t, gammas_t, dtype):
        """Expert mixing + packing for ALL t frames at once, called
        UNSCANNED on the scan-wrapped module (shares the resblocks params).
        Inside the scan the mixing would re-read every block's full fp32
        expert bank per frame (xplane trace: ~150 MB/step of weight
        traffic); hoisted, the banks are read once per window and the scan
        streams the tiny per-frame mixed kernels as xs. Returns None when
        the fused PF path (the only consumer) is off."""
        if not (
            self.use_pallas
            and self.one_layer
            and self.channel_first
            and self.use_dynamic
        ):
            return None
        from pnp_vcve_tpu.kernels.drt_stack import (
            premix_block_params,
            premix_zeros,
        )

        t, b = weights_t.shape[:2]
        c = self.mid_channels
        g_eff = (
            gammas_t
            if (self.with_se and self.use_dynamic)
            else jnp.ones((t, b, c), jnp.float32)
        )
        p = self.variables.get("params", {}).get("resblocks", None)
        out = []
        for i in range(self.num_blocks):
            blk = (p or {}).get(f"block{i}", None)
            if blk is None or "conv2" not in blk:
                out.append(premix_zeros(t, b, c, dtype))  # init pass
            else:
                out.append(
                    premix_block_params(
                        weights_t, g_eff, blk["conv2"]["bank"],
                        blk["conv2"]["bias_bank"], dtype,
                    )
                )
        return out

    @nn.compact
    def __call__(self, carry, xs):
        # O(1) carry: in scan order the nearest future keyframe is always
        # the most recently PROCESSED keyframe, so no (b,t,h,w,c) feature
        # store is needed (the reference keeps a Python list; a carried
        # buffer costs a full copy per step under XLA).
        prev_out, last_key, prev_was_key = carry
        lr, flow, par, weights, gamma, is_key, premixed = xs

        # At the first scan step the carry is all-zeros and warp(0) == 0, so
        # no first-step masking is needed (the reference's i==t-1/i==0 zero
        # features, iconvsr_ipb_par.py:77-79, fall out of the zero carry).
        key_warp = self._align(last_key, flow)

        # the align_key select (reference iconvsr_ipb_par.py:84-87) rides
        # the input conv as per-sample kernel gains on the fused path
        gate = (
            prev_was_key.astype(jnp.float32)
            if (self.align_key and self.with_cat)
            else None
        )
        if self.with_cat:
            feat = (lr, key_warp, prev_out)
        else:
            feat = (lr, key_warp)

        pf = self.pf_resident
        c = self.mid_channels
        out = ResidualBlocksWithInputConvDynamicDRT(
            in_channels=3 + c * (len(feat) - 1) if pf
            else sum(f.shape[-1] for f in feat),
            out_channels=c,
            num_blocks=self.num_blocks,
            num_experts=self.num_experts,
            with_se=self.with_se,
            one_layer=self.one_layer,
            channel_first=self.channel_first,
            use_dynamic=self.use_dynamic,
            use_pallas=self.use_pallas,
            name="resblocks",
        )(feat, par, weights, gamma, align_gate=gate, premixed=premixed,
          part_pf=[False] + [True] * (len(feat) - 1) if pf else None,
          pf_out=pf, pf_hw=lr.shape[1:3] if pf else None,
          key_select=(last_key, is_key.astype(jnp.float32))
          if (pf and _fold_key_select()) else None)

        if pf and _fold_key_select():
            out, last_key = out
        else:
            key_mask = is_key[:, None, None, None]
            last_key = jnp.where(key_mask, out, last_key)
        return (out, last_key, is_key), out


class _ForwardStep(nn.Module):
    """One step of the forward sweep + reconstruction head."""

    mid_channels: int
    num_blocks: int
    num_experts: int
    with_se: bool
    one_layer: bool
    channel_first: bool
    with_cat: bool
    align_key: bool
    flow_interpolation: str
    vsr: bool
    use_dynamic: bool = True
    use_pallas: bool = False
    deform: str = "vos"
    deform_groups: int = 16
    warp_impl: str = "padgather"

    _align = _BackwardStep._align
    premix = _BackwardStep.premix
    pf_resident = _BackwardStep.pf_resident

    @nn.compact
    def __call__(self, carry, xs):
        prev_out, last_key, prev_was_key = carry
        lr, flow, par, weights, gamma, is_key, cur, premixed = xs

        key_warp = self._align(last_key, flow)

        gate = (
            prev_was_key.astype(jnp.float32)
            if (self.align_key and self.with_cat)
            else None
        )
        if self.with_cat:
            feat = (lr, key_warp, prev_out, cur)
        else:
            feat = (lr, key_warp, cur)

        c = self.mid_channels
        hr_k = self.param("conv_hr_kernel", torch_conv_default, (3, 3, c, c))
        hr_b = self.param("conv_hr_bias", torch_conv_bias_default(9 * c), (c,))
        last_k = self.param("conv_last_kernel", torch_conv_default, (3, 3, c, 3))
        last_b = self.param("conv_last_bias", torch_conv_bias_default(9 * c), (3,))
        # vsr=False, b>=2: hand the head to the resblocks module so the fused
        # path runs it as a packed Pallas kernel on the PF stack output.
        # Measured at 720p/t=12: the XLA head convs force a c-minor
        # T(2,128) layout onto the (t,b,h,w,3) scan xs (42.7x HBM padding
        # expansion -> b=2 OOM at 20.4G/15.75G); fusing the head removes
        # that constraint (b=2 fits, 13.98 f/s aggregate). At b=1 the XLA
        # head is ~1 f/s faster (no layout pressure to relieve), so fusion
        # kicks in only for batched serving. PF-resident mode has no
        # unpacked stack output at all, so the fused head is mandatory.
        pf = self.pf_resident
        head = (
            None
            if (self.vsr or (lr.shape[0] < 2 and not pf))
            else (hr_k, hr_b, last_k, last_b)
        )

        res = ResidualBlocksWithInputConvDynamicDRT(
            in_channels=3 + c * (len(feat) - 1) if pf
            else sum(f.shape[-1] for f in feat),
            out_channels=self.mid_channels,
            num_blocks=self.num_blocks,
            num_experts=self.num_experts,
            with_se=self.with_se,
            one_layer=self.one_layer,
            channel_first=self.channel_first,
            use_dynamic=self.use_dynamic,
            use_pallas=self.use_pallas,
            name="resblocks",
        )(feat, par, weights, gamma, align_gate=gate, head=head,
          premixed=premixed,
          part_pf=[False] + [True] * (len(feat) - 1) if pf else None,
          pf_out=pf, pf_hw=lr.shape[1:3] if pf else None,
          key_select=(last_key, is_key.astype(jnp.float32))
          if (pf and _fold_key_select()) else None)

        if pf and _fold_key_select():
            # carry select folded into the stack's last block (see the
            # backward step); head is mandatory in PF mode so res is
            # (out_pf, y_head, new_last_key)
            out, y_head, new_last_key = res
        else:
            out, y_head = res if head is not None else (res, None)
            key_mask = is_key[:, None, None, None]
            new_last_key = jnp.where(key_mask, out, last_key)

        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.1)  # noqa: E731
        # the reference hardcodes 64-channel heads (iconvsr.py:365-366,
        # upsample2 -> 64 ch); identical at mid_channels=64, parameterized here
        if self.vsr:
            up1_k = self.param("upsample1_kernel", torch_conv_default, (3, 3, c, 4 * c))
            up1_b = self.param("upsample1_bias", torch_conv_bias_default(9 * c), (4 * c,))
            up2_k = self.param("upsample2_kernel", torch_conv_default, (3, 3, c, 4 * c))
            up2_b = self.param("upsample2_bias", torch_conv_bias_default(9 * c), (4 * c,))
            y = lrelu(pixel_shuffle(conv2d_nhwc(out, up1_k, up1_b), 2))
            y = lrelu(pixel_shuffle(conv2d_nhwc(y, up2_k, up2_b), 2))
            y = lrelu(conv2d_nhwc(y, hr_k, hr_b))
            y = conv2d_nhwc(y, last_k, last_b)
            y = y + bilinear_resize(lr, 4)
        elif y_head is not None:
            y = y_head + lr
        else:  # b == 1: plain XLA head (faster, no layout pressure)
            y = lrelu(conv2d_nhwc(out, hr_k, hr_b))
            y = conv2d_nhwc(y, last_k, last_b)
            y = y + lr
        return (out, new_last_key, is_key), y


class PnPVCVE(nn.Module):
    """Flagship generator (config configs/HR_davis_LR_128x128.py:4-26)."""

    def carry_feature_shape(self, h: int, w: int) -> tuple:
        """Per-batch-item shape of the scan carry's feature tensors (and of
        one backward-sweep output frame) at input size (h, w). In the
        PF-resident serving mode carries live in the Pallas stack's packed
        pixel-pair layout (b, HP, WP, 2c); everywhere else (b, h, w, c).
        parallel/seqpar.py sizes its boundary-carry / feature buffers with
        this, so the exact multi-chip pipeline works for every warp_impl."""
        if self.warp_impl == "pf":
            from pnp_vcve_tpu.kernels.drt_stack import pf_geometry

            HP, WP, _, _, _ = pf_geometry(h, w, 16)
            return (HP, WP, 2 * self.mid_channels)
        return (h, w, self.mid_channels)

    mid_channels: int = 64
    num_blocks: int = 8
    num_experts: int = 6
    expert_softmax: bool = True
    use_base_qp: bool = True
    with_bias: bool = True
    with_se: bool = True
    with_cat: bool = True
    one_layer: bool = True
    channel_first: bool = True
    align_key: bool = True
    vsr: bool = False
    blocktype: str = "drt"  # 'drt' | 'drt_woqp' (plain conv2)
    se_reduction: int = 16
    flow_interpolation: str = "bilinear"
    deform: str = "vos"  # 'vos' | 'basic' | 'fvc' (reference iconvsr_ipb.py:19-28)
    deform_groups: int = 16
    # 'padgather' (generic grid_sample parity) | 'block8' (exploits the MV
    # rasterizer's 8x8 block-constant structure; exact ONLY on such flows —
    # use for serving on uncropped rasterized inputs)
    warp_impl: str = "padgather"
    use_pallas_kernels: bool = False
    remat: bool = True
    feature_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        lrs: jnp.ndarray,
        qps: jnp.ndarray,
        slices: jnp.ndarray,
        mvs: jnp.ndarray,
        base_qps: jnp.ndarray,
        par_map: jnp.ndarray,
        is_mirror_extended: bool = False,
        sweep: str = "full",
        carry=None,
        bwd_feats: Optional[jnp.ndarray] = None,
        keyframe_mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """``sweep``/``carry``/``bwd_feats``/``keyframe_mask`` drive the
        EXACT multi-chip chunked two-sweep pipeline (SURVEY §7.3.9,
        parallel/seqpar.py): ``sweep='backward'`` runs only the backward
        propagation from an explicit boundary ``carry`` and returns
        ``(bwd_feats (b,t,h,w,c), carry_out)``; ``sweep='forward'``
        consumes a chunk's ``bwd_feats`` and returns ``(ys, carry_out)``.
        ``keyframe_mask`` overrides the first/last-frame keyframe forcing
        (a chunk boundary is NOT a clip boundary). ``sweep='full'`` is the
        unchanged single-device path."""
        b, t, h_in, w_in, _ = lrs.shape
        # Spatial padding to x4 (reference spatial_padding, iconvsr.py:371-394:
        # reflect-pad lrs bottom/right). The reference pads ONLY lrs — its MV
        # path would size-mismatch in flow_warp on non-/4 input and it never
        # crops the output (iconvsr_ipb_par.py:54,147), so this is the sane
        # extension: zero-pad the bitstream priors (zero motion, no partition)
        # and crop the output back. Makes KITTI's 375x1242 frames runnable.
        pad_h = (4 - h_in % 4) % 4
        pad_w = (4 - w_in % 4) % 4
        if pad_h or pad_w:
            sp = ((0, 0), (0, 0), (0, pad_h), (0, pad_w), (0, 0))
            lrs = jnp.pad(lrs, sp, mode="reflect")
            mvs = jnp.pad(mvs, sp)
            par_map = jnp.pad(par_map, sp)
        b, t, h, w, _ = lrs.shape
        c = self.mid_channels

        used_qps = base_qps if self.use_base_qp else qps
        weights = BasePredictor(
            nf=c, num_experts=self.num_experts, softmax=self.expert_softmax,
            name="base_predictor",
        )(used_qps)
        if self.with_bias:
            predictor = (
                SEModule(channels=c, reduction=self.se_reduction, name="bias_predictor")
                if self.with_se
                else BiasPredictor(nf=c, name="bias_predictor")
            )
            gammas, _betas = predictor(qps)
        else:
            gammas = jnp.ones((b, t, c), jnp.float32)

        # bitstream flows (reference iconvsr_ipb.py:33-46):
        # forward step i warps with mvs[:, i, ..., 0:2] (flow i-1 in the
        # reference's shifted array), backward step i with mvs[:, i, ..., 2:4].
        flows_fwd = mvs[..., 0:2]
        flows_bwd = mvs[..., 2:4]
        if is_mirror_extended:
            # flows_forward is None -> forward step i uses flows_backward[-i]
            # (iconvsr_ipb_par.py:113-115 with the ipb compute_flow layout)
            th = t // 2
            fwd_tail = jnp.flip(flows_fwd[:, th:], axis=1)
            flows_fwd = jnp.concatenate([flows_bwd[:, :1] * 0, fwd_tail[:, : t - 1]], 1)

        if keyframe_mask is not None:
            keyframe = keyframe_mask.astype(bool)
        else:
            keyframe, _, _ = keyframe_indices(slices)

        dtype = self.feature_dtype
        lrs_c = lrs.astype(dtype)

        common = dict(
            mid_channels=c,
            num_blocks=self.num_blocks,
            num_experts=self.num_experts,
            with_se=self.with_se,
            one_layer=self.one_layer,
            channel_first=self.channel_first,
            with_cat=self.with_cat,
            align_key=self.align_key,
            flow_interpolation=self.flow_interpolation,
            use_dynamic=self.blocktype == "drt",
            use_pallas=self.use_pallas_kernels,
            deform=self.deform,
            deform_groups=self.deform_groups,
            warp_impl=self.warp_impl,
        )

        scan_kwargs = dict(
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        bwd_cls = nn.remat(_BackwardStep) if self.remat else _BackwardStep
        fwd_cls = nn.remat(_ForwardStep) if self.remat else _ForwardStep
        bwd = nn.scan(bwd_cls, **scan_kwargs)(**common, name="backward")
        fwd = nn.scan(fwd_cls, **scan_kwargs)(**common, vsr=self.vsr, name="forward")

        # scan xs have time on axis 0: (t, b, ...)
        def tfirst(x):
            return jnp.moveaxis(x, 1, 0)

        rev = slice(None, None, -1)
        if self.warp_impl == "pf":
            # PF-resident serving pipeline: carries live in the Pallas
            # stack's packed PF layout; see _BackwardStep.pf_resident.
            from pnp_vcve_tpu.kernels.drt_stack import pf_geometry

            if self.vsr or self.deform != "vos" or not self.use_pallas_kernels:
                raise ValueError(
                    "warp_impl='pf' requires use_pallas_kernels=True, "
                    "deform='vos', vsr=False"
                )
            if c != 64 or h % 16 or w % 16:
                raise ValueError(
                    f"warp_impl='pf' needs mid_channels=64 and h,w %% 16 == 0,"
                    f" got c={c}, {h}x{w}"
                )
            HP, WP, _, _, _ = pf_geometry(h, w, 16)
            zero_frame = jnp.zeros((b, HP, WP, 2 * c), dtype)
        else:
            zero_frame = jnp.zeros((b, h, w, c), dtype)
        carry0 = (
            carry
            if carry is not None
            else (zero_frame, zero_frame, jnp.zeros((b,), bool))
        )

        # per-frame flows: backward step i warps with mvs[:, i, ..., 2:4],
        # forward step i with mvs[:, i, ..., 0:2] (the reference's shifted
        # flows_forward[:, i-1] equals mvs[:, i] directly, iconvsr_ipb.py:33-46)
        wt = tfirst(weights.astype(jnp.float32))
        gt = tfirst(gammas.astype(jnp.float32))
        # expert mixing hoisted out of both scans (premix docstring); the
        # unscanned method call shares the scanned modules' params
        pm_bwd = bwd.premix(wt[rev], gt[rev], dtype)
        pm_fwd = fwd.premix(wt, gt, dtype)

        if sweep != "forward":
            xs_bwd = (
                tfirst(lrs_c)[rev],
                tfirst(flows_bwd.astype(dtype))[rev],
                tfirst(par_map.astype(dtype))[rev],
                wt[rev],
                gt[rev],
                tfirst(keyframe)[rev],
                pm_bwd,
            )
            carry_b, bwd_stack = bwd(carry0, xs_bwd)
            bwd_stack = bwd_stack[rev]  # back to time order, (t, b, h, w, c)
            if sweep == "backward":
                return jnp.moveaxis(bwd_stack, 0, 1), carry_b
        else:
            if bwd_feats is None:
                raise ValueError("sweep='forward' requires bwd_feats")
            bwd_stack = tfirst(bwd_feats.astype(dtype))

        xs_fwd = (
            tfirst(lrs_c),
            tfirst(flows_fwd.astype(dtype)),
            tfirst(par_map.astype(dtype)),
            wt,
            gt,
            tfirst(keyframe),
            bwd_stack,
            pm_fwd,
        )
        carry_f, ys = fwd(carry0, xs_fwd)

        ys = jnp.moveaxis(ys, 0, 1).astype(jnp.float32)
        if pad_h or pad_w:
            s = 4 if self.vsr else 1
            ys = ys[:, :, : s * h_in, : s * w_in]
        if sweep == "forward":
            return ys, carry_f
        return ys
