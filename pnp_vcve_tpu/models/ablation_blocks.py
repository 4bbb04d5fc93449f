"""Research ablation blocks of the BAE (paper ablations, off the flagship
config path).

Reference surfaces:
- SFT / CBAM block variants: mmedit/models/common/sr_backbone_utils.py:
  387-498 (``SFTLayer``, ``ResidualBlockNoBNDynamicSFT``, ``..._res``,
  ``..._cbam``, ``..._cbam_conv``)
- Partition-aware modules: mmedit/models/common/partition_aware.py:35-260
  (``DRConv2d`` dynamic-region conv with the argmax/softmax
  straight-through ``asign_index`` autograd, ``SpatialAttention`` x3)
- SFT input-conv stack: basicvsr_net.py:521-558
  (``ResidualBlocksWithInputConvDynamic_SFT`` incl. its par_conv variants)

TPU notes: the per-sample region kernels of DRConv2d run through the same
vmapped-conv formulation as the MoE conv (ops/dynamic_conv.py) instead of
the reference's groups=batch correlation; the straight-through gradient of
the region assignment is a jax.custom_vjp reproducing asign_index exactly.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.models.init import scaled_kaiming_normal, torch_conv_default, torch_conv_bias_default
from pnp_vcve_tpu.ops.dynamic_conv import conv2d_nhwc, dynamic_conv2d, mix_expert_kernels

__all__ = [
    "SFTLayer",
    "SpatialAttention",
    "SpatialAttentionConv",
    "SpatialAttentionSimple",
    "DRConv2d",
    "ResidualBlockDynamicSFT",
    "ResidualBlockDynamicSFTRes",
    "ResidualBlockDynamicCBAM",
]


class SFTLayer(nn.Module):
    """Spatial feature transform: (scale, shift) from cat(feat, side)
    (sr_backbone_utils.py:387-415; note the reference applies
    ``feat * scale + shift`` WITHOUT the +1 — quirk preserved)."""

    mid_channels: int = 64
    small_sft: bool = False

    @nn.compact
    def __call__(self, feat: jnp.ndarray, side: jnp.ndarray) -> jnp.ndarray:
        x_in = jnp.concatenate([feat, side], axis=-1)
        c = self.mid_channels
        scale = nn.Conv(c, (1, 1), name="SFT_scale_conv0")(x_in)
        shift = nn.Conv(c, (1, 1), name="SFT_shift_conv0")(x_in)
        if not self.small_sft:
            scale = nn.Conv(c, (1, 1), name="SFT_scale_conv1")(
                nn.leaky_relu(scale, 0.1)
            )
            shift = nn.Conv(c, (1, 1), name="SFT_shift_conv1")(
                nn.leaky_relu(shift, 0.1)
            )
        return feat * scale + shift


class SpatialAttention(nn.Module):
    """CBAM-style: sigmoid(conv(cat[mean(par), max(par)])) * x
    (partition_aware.py:122-136)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, par: jnp.ndarray) -> jnp.ndarray:
        avg = jnp.mean(par, axis=-1, keepdims=True)
        mx = jnp.max(par, axis=-1, keepdims=True)
        k = self.kernel_size
        att = nn.Conv(1, (k, k), padding="SAME", use_bias=False, name="conv1")(
            jnp.concatenate([avg, mx], axis=-1)
        )
        return nn.sigmoid(att) * x


def _hsigmoid(x):
    return nn.relu6(x + 3.0) / 6.0


class SpatialAttentionConv(nn.Module):
    """hsigmoid(conv(cat[x, mean(par), max(par)])) * x
    (partition_aware.py:138-151)."""

    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, par: jnp.ndarray) -> jnp.ndarray:
        avg = jnp.mean(par, axis=-1, keepdims=True)
        mx = jnp.max(par, axis=-1, keepdims=True)
        k = self.kernel_size
        att = nn.Conv(1, (k, k), padding="SAME", use_bias=False, name="conv1")(
            jnp.concatenate([x, avg, mx], axis=-1)
        )
        return _hsigmoid(att) * x


class SpatialAttentionSimple(nn.Module):
    """hsigmoid(1x1 conv(cat[x, par])) * x (partition_aware.py:154-165)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, par: jnp.ndarray) -> jnp.ndarray:
        att = nn.Conv(1, (1, 1), use_bias=False, name="conv1")(
            jnp.concatenate([x, par], axis=-1)
        )
        return _hsigmoid(att) * x


@jax.custom_vjp
def assign_region(kernel_out: jnp.ndarray, guide: jnp.ndarray) -> jnp.ndarray:
    """Hard region routing with a softmax straight-through backward.

    Forward: one-hot argmax over regions selects per-pixel which region's
    output survives. Backward: the guide gradient flows through a softmax
    Jacobian (reference asign_index, partition_aware.py:35-51).

    kernel_out: (b, r, h, w, c); guide: (b, h, w, r) -> (b, h, w, c)
    """
    mask = jax.nn.one_hot(jnp.argmax(guide, axis=-1), guide.shape[-1], axis=-1)
    return jnp.einsum("brhwc,bhwr->bhwc", kernel_out, mask)


def _assign_fwd(kernel_out, guide):
    return assign_region(kernel_out, guide), (kernel_out, guide)


def _assign_bwd(res, g):
    kernel_out, guide = res
    mask = jax.nn.one_hot(jnp.argmax(guide, axis=-1), guide.shape[-1], axis=-1)
    grad_kernel = g[:, None] * jnp.moveaxis(mask, -1, 1)[..., None]
    grad_guide = jnp.einsum("bhwc,brhwc->bhwr", g, kernel_out)
    sm = jax.nn.softmax(guide, axis=-1)
    grad_guide = sm * (
        grad_guide - jnp.sum(sm * grad_guide, axis=-1, keepdims=True)
    )
    return grad_kernel, grad_guide


assign_region.defvjp(_assign_fwd, _assign_bwd)


class DRConv2d(nn.Module):
    """Dynamic-region conv: per-sample per-region kernels from an
    adaptive-pool hypernet, routed per pixel by an argmax guide mask with
    straight-through softmax gradients (partition_aware.py:167-197).

    The reference's ``conv_guide`` hardcodes 4 input channels and would
    crash at its one call site (c + 3 partition channels); the input width
    is inferred here (documented deviation).
    """

    channels: int = 64
    out_channels: int = 64
    kernel_size: int = 3
    region_num: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, par: jnp.ndarray) -> jnp.ndarray:
        b, h, w, cin = x.shape
        r, k, cout = self.region_num, self.kernel_size, self.out_channels

        # hypernet: adaptive avg-pool to (k, k) -> 1x1 convs
        ph, pw = h // k, w // k
        pooled = jnp.mean(
            x[:, : ph * k, : pw * k].reshape(b, k, ph, k, pw, cin), axis=(2, 4)
        )
        y = nn.sigmoid(nn.Conv(r * r, (1, 1), name="kernel_conv1")(pooled))
        kern = nn.Conv(
            r * cin * cout, (1, 1), feature_group_count=r, name="kernel_conv2"
        )(y)  # (b, k, k, r*cin*cout)
        kern = kern.reshape(b, k, k, r, cin, cout)

        # per-region per-sample convs (vmapped conv == groups=batch trick)
        outs = []
        for ri in range(r):
            outs.append(dynamic_conv2d(x, kern[:, :, :, ri]))
        region_out = jnp.stack(outs, axis=1)  # (b, r, h, w, cout)

        guide = nn.Conv(r, (k, k), padding="SAME", name="conv_guide")(
            jnp.concatenate([x, par], axis=-1)
        )
        return assign_region(region_out, guide)


class _DynConv(nn.Module):
    """Expert bank + mix + per-sample conv (the Dynamic_conv2d of the
    reference, without the SE gain)."""

    channels: int
    num_experts: int

    @nn.compact
    def __call__(self, x, weights):
        from pnp_vcve_tpu.models.bae import _ExpertBank

        bank, bias_bank = _ExpertBank(
            channels=self.channels, num_experts=self.num_experts, name="bank"
        )()
        k, bias = mix_expert_kernels(weights, bank, bias_bank)
        return dynamic_conv2d(x, k, bias)


class ResidualBlockDynamicSFT(nn.Module):
    """sft1 -> conv1 -> relu -> sft2 -> conv2(dynamic) -> gamma -> +x
    (sr_backbone_utils.py:418-448)."""

    mid_channels: int = 64
    num_experts: int = 6
    with_bias: bool = False
    with_se: bool = False
    one_layer: bool = False
    small_sft: bool = False
    res_scale: float = 1.0

    @nn.compact
    def __call__(self, x, side, weights, gamma=None, beta=None):
        c = self.mid_channels
        out = SFTLayer(c, self.small_sft, name="sft1")(x, side)
        if self.one_layer:
            out = nn.Conv(c, (3, 3), padding="SAME", name="conv1")(out)
        else:
            out = _DynConv(c, self.num_experts, name="conv1")(out, weights)
        out = nn.relu(out)
        out = SFTLayer(c, self.small_sft, name="sft2")(out, side)
        out = _DynConv(c, self.num_experts, name="conv2")(out, weights)
        if self.with_bias:
            if self.with_se:
                out = out * gamma[:, None, None, :]
            else:
                out = gamma[:, None, None, :] * out + beta[:, None, None, :]
        return x + out * self.res_scale


class ResidualBlockDynamicSFTRes(nn.Module):
    """Single-branch SFT/DRConv block (sr_backbone_utils.py:450-482):
    channel_first: relu(dyn conv) -> gamma -> spatial (SFT or DRConv);
    else spatial -> relu(dyn conv) -> gamma. Residual add."""

    mid_channels: int = 64
    num_experts: int = 6
    with_bias: bool = False
    with_se: bool = False
    small_sft: bool = False
    channel_first: bool = False
    drconv: bool = False
    res_scale: float = 1.0

    def _spatial(self, out, side):
        c = self.mid_channels
        if self.drconv:
            return DRConv2d(c, c, 3, name="sft1")(out, side)
        return SFTLayer(c, self.small_sft, name="sft1")(out, side)

    @nn.compact
    def __call__(self, x, side, weights, gamma=None, beta=None):
        c = self.mid_channels

        def gain(out):
            if not self.with_bias:
                return out
            if self.with_se:
                return out * gamma[:, None, None, :]
            return gamma[:, None, None, :] * out + beta[:, None, None, :]

        if self.channel_first:
            out = nn.relu(_DynConv(c, self.num_experts, name="conv1")(x, weights))
            out = gain(out)
            out = self._spatial(out, side)
        else:
            out = self._spatial(x, side)
            out = nn.relu(_DynConv(c, self.num_experts, name="conv1")(out, weights))
            out = gain(out)
        return x + out * self.res_scale


class ResidualBlockDynamicCBAM(ResidualBlockDynamicSFTRes):
    """SFT_res with the spatial branch replaced by CBAM spatial attention
    (sr_backbone_utils.py:484-498); ``conv_attn`` selects the _conv
    variant."""

    conv_attn: bool = False

    def _spatial(self, out, side):
        if self.conv_attn:
            return SpatialAttentionConv(name="sft1")(out, side)
        return SpatialAttention(name="sft1")(out, side)
