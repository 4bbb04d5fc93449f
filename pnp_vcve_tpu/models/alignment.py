"""Feature alignment modules (reference iconvsr_mv.py:12-85).

- :class:`VOSAlignment` — plain bitstream-flow warp (the aligner all three
  shipped configs use, ``deform='vos'``).
- :class:`BasicDeformableAlignment` — flow-warp + offset-residual modulated
  DCN (``deform='basic'``; reference BasiceformableAlignment:53-85).
- :class:`FVCDeformableAlignment` — FVC-style DCN (``deform='fvc'``).

The DCN variants run on :func:`ops.deform_conv.modulated_deform_conv2d`.
Offsets follow the reference's convention: the learned offset map is added
to the flow (flipped to (dy, dx)) and NOT tanh-bounded (the reference
computes a bounded tensor but uses the unbounded one, iconvsr_mv.py:75-78 —
quirk preserved).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnp_vcve_tpu.ops.warp import flow_warp
from pnp_vcve_tpu.ops.deform_conv import modulated_deform_conv2d
from pnp_vcve_tpu.models.init import torch_conv_default, torch_conv_bias_default

__all__ = ["VOSAlignment", "BasicDeformableAlignment", "FVCDeformableAlignment"]


class VOSAlignment(nn.Module):
    flow_interpolation: str = "bilinear"

    def __call__(self, feat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        """feat (b,h,w,c); flow (b,h,w,2) (dx, dy) pixels."""
        return flow_warp(feat, flow, self.flow_interpolation)


class _OffsetHead(nn.Module):
    """conv(c+2 -> c) + lrelu + conv(c -> G*K*3) (iconvsr_mv.py:25-29,58-62)."""

    channels: int
    deform_groups: int
    kk: int = 9

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(
            nn.Conv(self.channels, (3, 3), padding="SAME", name="conv0")(x), 0.1
        )
        return nn.Conv(
            self.deform_groups * self.kk * 3, (3, 3), padding="SAME",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
            name="conv1",
        )(y)


class BasicDeformableAlignment(nn.Module):
    channels: int = 64
    deform_groups: int = 16
    flow_interpolation: str = "bilinear"

    @nn.compact
    def __call__(self, feat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = feat.shape
        g, kk = self.deform_groups, 9
        warped = flow_warp(feat, flow, self.flow_interpolation)
        head_out = _OffsetHead(self.channels, g, name="conv_offset")(
            jnp.concatenate([warped, flow], axis=-1)
        )
        o1, o2, mask = jnp.split(head_out, 3, axis=-1)
        # offset = learned + flow flipped to (dy, dx), repeated per point
        # (iconvsr_mv.py:77-78)
        offs = jnp.concatenate([o1, o2], axis=-1).reshape(b, h, w, g, kk, 2)
        flow_yx = flow[..., ::-1][:, :, :, None, None, :]
        offsets = offs + flow_yx
        mask = nn.sigmoid(mask).reshape(b, h, w, g, kk)

        kernel = self.param("weight", torch_conv_default, (3, 3, c, c))
        bias = self.param("bias", torch_conv_bias_default(9 * c), (c,))
        return modulated_deform_conv2d(feat, offsets, mask, kernel, bias)


class FVCDeformableAlignment(nn.Module):
    channels: int = 64
    deform_groups: int = 16

    @nn.compact
    def __call__(self, feat: jnp.ndarray, offset_info: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = feat.shape
        g, kk = self.deform_groups, 9
        head_out = _OffsetHead(self.channels, g, name="conv_offset")(
            jnp.concatenate([feat, offset_info], axis=-1)
        )
        o1, o2, mask = jnp.split(head_out, 3, axis=-1)
        offsets = jnp.concatenate([o1, o2], axis=-1).reshape(b, h, w, g, kk, 2)
        mask = nn.sigmoid(mask).reshape(b, h, w, g, kk)
        kernel = self.param("weight", torch_conv_default, (3, 3, c, c))
        bias = self.param("bias", torch_conv_bias_default(9 * c), (c,))
        return modulated_deform_conv2d(feat, offsets, mask, kernel, bias)
