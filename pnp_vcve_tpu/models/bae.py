"""BAE (bitstream-aware enhancement) building blocks.

The workhorse is the DRT residual block (reference:
mmedit/models/common/sr_backbone_utils.py:278-333,
``ResidualBlockNoBNDynamic_drt``): a per-sample expert-mixed 3x3 conv
(routing weights from the CAA) plus a partition-guided side path — three 1x1
convs gated by the macroblock-partition one-hot channels (16x16 / 16x8 / 8x8).

TPU-native formulation:

- the MoE conv is einsum-mixed kernels + shifted batched matmuls
  (:mod:`pnp_vcve_tpu.ops.dynamic_conv`), not a ``groups=batch`` grouped conv;
- the three partition 1x1 convs run as ONE ``(cin -> 3*cout)`` matmul whose
  result is contracted against the partition map — a single MXU op followed
  by a VPU gate, instead of three separate convs
  (reference computes them separately at sr_backbone_utils.py:310);
- the sparse eval path of the reference (index_select matmuls,
  sr_backbone_utils.py:294-302) is intentionally NOT replicated: gather/
  scatter sparsity loses to dense MXU work on TPU, and the dense path is
  numerically identical (the reference's sparse path even divides by 255 —
  a quirk that changes numerics; the shipped flagship config has
  ``sparse_val=False``).

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


class _DynamicConvSE(nn.Module):
    """Expert-bank conv with optional SE gain (reference Dynamic_conv2d_se)."""

    channels: int
    num_experts: int
    with_se: bool = True
    kernel_size: int = 3

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        weights: jnp.ndarray,
        gamma: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        k = self.kernel_size
        bank = self.param(
            "bank",
            kaiming_uniform_expert,
            (self.num_experts, k, k, self.channels, self.channels),
        )
        bias_bank = self.param(
            "bias_bank", nn.initializers.zeros, (self.num_experts, self.channels)
        )
        kernels, biases = mix_expert_kernels(weights, bank, bias_bank)
        return dynamic_conv2d(
            x, kernels, biases, gamma=gamma if self.with_se else None
        )


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

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        par: jnp.ndarray,
        weights: jnp.ndarray,
        gamma: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        c = self.mid_channels

        # partition side path: one (c -> 3c) matmul, gated by the partition map
        par_kernel = self.param(
            "par_kernel", scaled_kaiming_normal(0.1), (c, 3, c)
        )

        def partition_path(feat: jnp.ndarray) -> jnp.ndarray:
            y = jnp.einsum(
                "bhwi,iro->bhwro", feat, par_kernel,
                preferred_element_type=jnp.float32,
            )
            return jnp.einsum(
                "bhwro,bhwr->bhwo", y, par.astype(jnp.float32),
            ).astype(feat.dtype)

        dyn = _DynamicConvSE(
            channels=c, num_experts=self.num_experts, with_se=self.with_se,
            name="conv2",
        )

        if self.one_layer:
            conv1_kernel = self.param(
                "conv1_kernel", scaled_kaiming_normal(0.1), (3, 3, c, c)
            )
            conv1_bias = self.param("conv1_bias", nn.initializers.zeros, (c,))

            def conv1(feat, _w, _g):
                return conv2d_nhwc(feat, conv1_kernel, conv1_bias)

        else:
            conv1_dyn = _DynamicConvSE(
                channels=c, num_experts=self.num_experts, with_se=self.with_se,
                name="conv1",
            )

            def conv1(feat, w, g):
                return conv1_dyn(feat, w, g)

        if self.channel_first:
            dyres = partition_path(x)
            out = nn.relu(dyn(x, weights, gamma) + dyres)
            out = conv1(out, weights, gamma)
        else:
            out = nn.relu(conv1(x, weights, gamma))
            dyres = partition_path(out)
            out = dyn(out, weights, gamma) + dyres

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

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        par: jnp.ndarray,
        weights: jnp.ndarray,
        gamma: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
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
        feat = nn.leaky_relu(conv2d_nhwc(x, kernel, bias), negative_slope=0.1)
        for i in range(self.num_blocks):
            feat = DRTBlock(
                mid_channels=self.out_channels,
                num_experts=self.num_experts,
                with_se=self.with_se,
                one_layer=self.one_layer,
                channel_first=self.channel_first,
                name=f"block{i}",
            )(feat, par, weights, gamma)
        return feat
