"""BAE (bitstream-aware enhancement) building blocks.

The workhorse is the DRT residual block (reference:
mmedit/models/common/sr_backbone_utils.py:278-333,
``ResidualBlockNoBNDynamic_drt``): a per-sample expert-mixed 3x3 conv
(routing weights from the CAA) plus a partition-guided side path — three 1x1
convs gated by the macroblock-partition one-hot channels (16x16 / 16x8 / 8x8).

TPU-native formulation:

- the MoE conv is einsum-mixed kernels + batched matmuls
  (:mod:`pnp_vcve_tpu.ops.dynamic_conv`), not a ``groups=batch`` grouped conv;
- the three partition 1x1 convs run as ONE ``(cin -> 3*cout)`` matmul whose
  result is contracted against the partition map;
- with ``use_pallas=True`` the whole block STACK executes as chained fused
  Pallas kernels in a shared padded-packed format, with the input conv
  fused too (:mod:`pnp_vcve_tpu.kernels.drt_stack`; the per-block kernel
  lives in :mod:`pnp_vcve_tpu.kernels.drt_packed`): pixel-pair packed MXU
  layout, one HBM read + one write per block. TRAINABLE: a custom VJP runs
  the fused kernels forward and differentiates the numerically-identical
  XLA composition backward (gradient-parity-tested);
- the sparse eval path of the reference (index_select matmuls,
  sr_backbone_utils.py:294-302) is intentionally NOT replicated: gather/
  scatter sparsity loses to dense MXU work on TPU (the shipped flagship
  config has ``sparse_val=False``).

Layout: NHWC; partition map is ``(b, h, w, 3)``.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pnp_vcve_tpu.ops.dynamic_conv import (
    conv2d_nhwc,
    dynamic_conv2d,
    mix_expert_kernels,
)
from pnp_vcve_tpu.models.init import (
    kaiming_uniform_expert,
    scaled_kaiming_normal,
    torch_conv_default,
    torch_conv_bias_default,
)

__all__ = ["DRTBlock", "ResidualBlocksWithInputConvDynamicDRT"]


class _ExpertBank(nn.Module):
    """Parameter container for one expert-mixed conv (reference
    Dynamic_conv2d_se weight/bias banks)."""

    channels: int
    num_experts: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self):
        k = self.kernel_size
        bank = self.param(
            "bank",
            kaiming_uniform_expert,
            (self.num_experts, k, k, self.channels, self.channels),
        )
        bias_bank = self.param(
            "bias_bank", nn.initializers.zeros, (self.num_experts, self.channels)
        )
        return bank, bias_bank


class DRTBlock(nn.Module):
    """Partition-guided dynamic residual block (flagship BAE block).

    ``channel_first=True`` order (reference sr_backbone_utils.py:304-313):
        dyres = sum_r par_r * conv1x1_r(x)
        out   = relu(dyn_conv(x) + dyres)
        out   = conv1(out)          # plain 3x3 when one_layer
        return x + out * res_scale
    """

    mid_channels: int = 64
    num_experts: int = 6
    with_se: bool = True
    one_layer: bool = True
    channel_first: bool = True
    res_scale: float = 1.0
    use_dynamic: bool = True  # False = blocktype='drt_woqp' (plain conv2,
    # reference sr_backbone_utils.py:336-383 with one_layer=True)
    use_pallas: bool = False
    pallas_th: int = 16

    def setup(self):
        c = self.mid_channels
        self.par_kernel = self.param(
            "par_kernel", scaled_kaiming_normal(0.1), (c, 3, c)
        )
        if self.use_dynamic:
            self.conv2_bank = _ExpertBank(
                channels=c, num_experts=self.num_experts, name="conv2"
            )
        else:
            self.conv2_kernel = self.param(
                "conv2_kernel", scaled_kaiming_normal(0.1), (3, 3, c, c)
            )
            self.conv2_bias = self.param("conv2_bias", nn.initializers.zeros, (c,))
        if self.one_layer:
            self.conv1_kernel = self.param(
                "conv1_kernel", scaled_kaiming_normal(0.1), (3, 3, c, c)
            )
            self.conv1_bias = self.param("conv1_bias", nn.initializers.zeros, (c,))
        else:
            self.conv1_bank = _ExpertBank(
                channels=c, num_experts=self.num_experts, name="conv1"
            )

    def _mixed_conv2(self, weights, b):
        c = self.mid_channels
        if self.use_dynamic:
            bank, bias_bank = self.conv2_bank()
            return mix_expert_kernels(weights, bank, bias_bank)
        dyn_kernels = jnp.broadcast_to(self.conv2_kernel[None], (b, 3, 3, c, c))
        dyn_biases = jnp.broadcast_to(self.conv2_bias[None], (b, c))
        return dyn_kernels, dyn_biases

    def packed_inputs(self, weights, gamma) -> dict:
        """Per-block parameter dict for the chained PF kernel
        (kernels.drt_stack.drt_stack_packed). Only valid for the fast-path
        configuration (one_layer, channel_first, res_scale=1)."""
        b = weights.shape[0]
        c = self.mid_channels
        dyn_kernels, dyn_biases = self._mixed_conv2(weights, b)
        se_gamma = gamma if (self.with_se and self.use_dynamic) else None
        g = se_gamma if se_gamma is not None else jnp.ones((b, c), jnp.float32)
        return dict(
            dyn_kernels=dyn_kernels,
            dyn_biases=dyn_biases,
            par_kernel=self.par_kernel,
            conv1_kernel=self.conv1_kernel,
            conv1_bias=self.conv1_bias,
            gamma=g,
        )

    def packed_inputs_premixed(self, pm: dict) -> dict:
        """Block param dict from PREMIXED per-frame packed dynamics
        (kernels.drt_stack.premix_block_params) + this block's static
        par/conv1 params."""
        return dict(
            pm,
            par_kernel=self.par_kernel,
            conv1_kernel=self.conv1_kernel,
            conv1_bias=self.conv1_bias,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        par: jnp.ndarray,
        weights: jnp.ndarray,
        gamma: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        c = self.mid_channels
        b = x.shape[0]

        par_kernel = self.par_kernel
        dyn_kernels, dyn_biases = self._mixed_conv2(weights, b)
        se_gamma = gamma if (self.with_se and self.use_dynamic) else None

        if self.one_layer:
            conv1_kernel = self.conv1_kernel
            conv1_bias = self.conv1_bias
        else:
            c1_bank, c1_bias_bank = self.conv1_bank()

        if (
            self.use_pallas
            and self.one_layer
            and self.channel_first
            and self.res_scale == 1.0
            and x.shape[2] % 2 == 0
            and x.shape[1] % self.pallas_th == 0
        ):
            from pnp_vcve_tpu.kernels.drt_packed import drt_block_packed

            g = se_gamma if se_gamma is not None else jnp.ones((x.shape[0], c), x.dtype)
            return drt_block_packed(
                x, par, dyn_kernels, dyn_biases, par_kernel,
                conv1_kernel, conv1_bias, g, th=self.pallas_th,
            )

        def partition_path(feat: jnp.ndarray) -> jnp.ndarray:
            # dyres = sum_r (feat * par_r) @ K_r: three gated matmuls with an
            # fp32 register accumulator. The alternative single einsum
            # "bhwi,iro->bhwro" materializes an (b,h,w,3,c) fp32 tensor in
            # HBM (708 MB at 720p) — ~2x slower, measured.
            out = None
            for r in range(3):
                gated = feat * par[..., r : r + 1].astype(feat.dtype)
                term = jnp.einsum(
                    "bhwi,io->bhwo",
                    gated,
                    par_kernel[:, r].astype(feat.dtype),
                    preferred_element_type=jnp.float32,
                )
                out = term if out is None else out + term
            return out.astype(feat.dtype)

        def dyn(feat):
            return dynamic_conv2d(feat, dyn_kernels, dyn_biases, gamma=se_gamma)

        def conv1(feat):
            if self.one_layer:
                return conv2d_nhwc(feat, conv1_kernel, conv1_bias)
            k1, b1 = mix_expert_kernels(weights, c1_bank, c1_bias_bank)
            return dynamic_conv2d(feat, k1, b1, gamma=se_gamma)

        if self.channel_first:
            dyres = partition_path(x)
            out = nn.relu(dyn(x) + dyres)
            out = conv1(out)
        else:
            out = nn.relu(conv1(x))
            dyres = partition_path(out)
            out = dyn(out) + dyres

        return x + out * self.res_scale


class ResidualBlocksWithInputConvDynamicDRT(nn.Module):
    """3x3 input conv + LeakyReLU(0.1) + N DRT blocks
    (reference basicvsr_net.py:478-519)."""

    in_channels: int
    out_channels: int = 64
    num_blocks: int = 8
    num_experts: int = 6
    with_se: bool = True
    one_layer: bool = True
    channel_first: bool = True
    use_dynamic: bool = True
    use_pallas: bool = False
    pallas_th: int = 16

    @nn.compact
    def __call__(
        self,
        x,
        par: jnp.ndarray,
        weights: jnp.ndarray,
        gamma: Optional[jnp.ndarray],
        align_gate: Optional[jnp.ndarray] = None,
        head=None,
        premixed=None,
        part_pf=None,
        pf_out: bool = False,
        pf_hw=None,
        key_select=None,
    ) -> jnp.ndarray:
        """``x``: (b,h,w,cin) array, or a SEQUENCE of arrays whose channels
        sum to ``in_channels`` — conv(concat(parts)) is computed as
        sum(conv_i(part_i)), which skips materializing the concat (measured
        16-25 ms/frame at 720p when the operands carry gather-dictated
        layouts; the parameter stays ONE (3,3,cin,cout) kernel, checkpoint-
        compatible, sliced per part).

        ``align_gate``: optional (b,) 0/1 floats for the BAE part layout
        (lr, key_warp, neighbor[, cur]) meaning the effective neighbor is
        ``where(gate, key_warp, neighbor)`` — on the fused path the select
        becomes per-sample KERNEL gains (free); fallbacks select the
        tensor.

        ``head``: optional (hr_kernel, hr_bias, last_kernel, last_bias) —
        when given, ALSO computes the reconstruction head
        ``y = conv_last(lrelu(conv_hr(out)))`` (no residual) and returns
        ``(out, y)``. On the fused path the head runs as a packed Pallas
        kernel directly on the PF stack output, which keeps the scan-xs lrs
        stack away from the XLA head convs' layout constraints (a 42.7x
        HBM padding expansion at b=2, found via the OOM allocation dump).

        ``part_pf``/``pf_out``/``pf_hw``: the PF-resident pipeline
        (kernels/drt_stack.py input_conv_pf part_pf docs). ``part_pf[i]``
        marks part i as ALREADY in the stack's packed PF layout (a warp_pf
        output or the previous step's PF carry — no pad/transpose glue);
        ``pf_out=True`` returns the raw PF stack output. ``pf_hw=(h, w)``
        supplies the logical spatial shape (required when part 0 is PF).
        Only valid on the fused path; a non-fused fall-through raises.

        ``key_select=(last_key, is_key)`` (PF array, (b,) flags) folds the
        scan's keyframe-carry update ``where(is_key, out, last_key)`` into
        the last stack block's epilogue (kernels/drt_stack.py
        make_fused_pipeline_select) and appends ``new_last_key`` to the
        return value. Requires ``pf_out=True`` on the fused path."""
        kernel = self.param(
            "input_conv_kernel",
            torch_conv_default,
            (3, 3, self.in_channels, self.out_channels),
        )
        bias = self.param(
            "input_conv_bias",
            torch_conv_bias_default(9 * self.in_channels),
            (self.out_channels,),
        )
        if align_gate is not None and not isinstance(x, (tuple, list)):
            raise ValueError("align_gate requires the parts form of x")
        pf_in = part_pf is not None and any(part_pf)
        if pf_hw is not None:
            h_, w_ = pf_hw
        else:
            h_, w_ = x[0].shape[1:3] if isinstance(x, (tuple, list)) else x.shape[1:3]
        hp_ = -(-(h_ + 16) // self.pallas_th) * self.pallas_th
        # the PF emitted by input_conv_pf (th=8 tiling) must line up with
        # the stack's th-tiled grid: (h+16) divisible by both
        pf_fast = (
            self.use_pallas
            and self.one_layer
            and self.channel_first
            and isinstance(x, (tuple, list))
            and h_ % 8 == 0
            and w_ % 16 == 0
            and hp_ // self.pallas_th >= 2
            and self.pallas_th % 8 == 0
            and (h_ + 16) % self.pallas_th == 0
        )
        if pf_fast:
            # fully-fused PF pipeline: packed input conv (kernels
            # input_conv_pf) -> chained PF blocks; no XLA conv in a
            # warp-dictated layout (measured ~31 ms/frame at 720p)
            from pnp_vcve_tpu.kernels.drt_stack import (
                make_fused_pipeline_select,
                make_trainable_input_stack,
                make_trainable_input_stack_head,
            )

            blocks = [
                DRTBlock(
                    mid_channels=self.out_channels,
                    num_experts=self.num_experts,
                    with_se=self.with_se,
                    one_layer=self.one_layer,
                    channel_first=self.channel_first,
                    use_dynamic=self.use_dynamic,
                    use_pallas=self.use_pallas,
                    pallas_th=self.pallas_th,
                    name=f"block{i}",
                )
                for i in range(self.num_blocks)
            ]
            if premixed is not None:
                params = [
                    blk.packed_inputs_premixed(pm)
                    for blk, pm in zip(blocks, premixed)
                ]
            else:
                params = [blk.packed_inputs(weights, gamma) for blk in blocks]
            gate = (
                align_gate.astype(jnp.float32)
                if align_gate is not None
                else None
            )
            if key_select is not None:
                if not pf_out:
                    raise ValueError("key_select requires pf_out=True")
                fused = make_fused_pipeline_select(
                    self.pallas_th, h_, w_, self.out_channels,
                    gated=gate is not None, part_pf=part_pf,
                    with_head=head is not None,
                )
                args = (
                    tuple(x), kernel, bias, par, params,
                    tuple(head) if head is not None else None,
                    key_select[0], key_select[1],
                )
                return fused(*args, gate) if gate is not None else fused(*args)
            if head is not None:
                fused = make_trainable_input_stack_head(
                    self.pallas_th, h_, w_, self.out_channels,
                    gated=gate is not None, part_pf=part_pf, pf_out=pf_out,
                )
                args = (tuple(x), kernel, bias, par, params, tuple(head))
                return fused(*args, gate) if gate is not None else fused(*args)
            # fused Pallas forward, XLA-composition backward (trainable)
            fused = make_trainable_input_stack(
                self.pallas_th, h_, w_, self.out_channels,
                gated=gate is not None, part_pf=part_pf, pf_out=pf_out,
            )
            if gate is not None:
                return fused(tuple(x), kernel, bias, par, params, gate)
            return fused(tuple(x), kernel, bias, par, params)
        if pf_in or pf_out or key_select is not None:
            raise ValueError(
                "PF-resident parts require the fused Pallas input-stack path "
                "(use_pallas + one_layer + channel_first + aligned shapes)"
            )
        if align_gate is not None:
            # non-fused fallback: materialize the select
            g = align_gate[:, None, None, None] != 0
            x = (x[0], x[1], jnp.where(g, x[1], x[2])) + tuple(x[3:])
        if isinstance(x, (tuple, list)):
            import jax

            acc = None
            off = 0
            for part in x:
                cin = part.shape[-1]
                term = jax.lax.conv_general_dilated(
                    part,
                    kernel[:, :, off : off + cin, :].astype(part.dtype),
                    (1, 1),
                    "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32,
                )
                acc = term if acc is None else acc + term
                off += cin
            if off != self.in_channels:
                raise ValueError(f"parts sum to {off} channels, expected {self.in_channels}")
            dtype = x[0].dtype
            feat = nn.leaky_relu(acc + bias, negative_slope=0.1).astype(dtype)
            x = None
        else:
            feat = nn.leaky_relu(conv2d_nhwc(x, kernel, bias), negative_slope=0.1)
        blocks = [
            DRTBlock(
                mid_channels=self.out_channels,
                num_experts=self.num_experts,
                with_se=self.with_se,
                one_layer=self.one_layer,
                channel_first=self.channel_first,
                use_dynamic=self.use_dynamic,
                use_pallas=self.use_pallas,
                pallas_th=self.pallas_th,
                name=f"block{i}",
            )
            for i in range(self.num_blocks)
        ]

        h, w = feat.shape[1], feat.shape[2]
        th = self.pallas_th
        hp = -(-(h + 16) // th) * th
        if (
            self.use_pallas
            and self.one_layer
            and self.channel_first
            and w % 2 == 0
            and hp // th >= 2
        ):
            # chained PF kernels: one pack, N fused blocks, one unpack —
            # no per-block XLA pads/reshapes (kernels/drt_stack.py); the
            # custom VJP differentiates the XLA composition, so this path
            # is trainable
            from pnp_vcve_tpu.kernels.drt_stack import make_trainable_stack

            params = [blk.packed_inputs(weights, gamma) for blk in blocks]
            feat = make_trainable_stack(th)(feat, par, params)
        else:
            for blk in blocks:
                feat = blk(feat, par, weights, gamma)
        if head is not None:
            from pnp_vcve_tpu.kernels.drt_stack import _xla_head

            return feat, _xla_head(feat, tuple(head))
        return feat
