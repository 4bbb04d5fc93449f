"""Modulated deformable convolution (DCNv2) — TPU gather-based.

The reference links mmcv's CUDA ``modulated_deform_conv2d`` for its optional
aligners and the baseline zoo (iconvsr_mv.py:21,52 BasiceformableAlignment /
FVCDeformableAlignment; stdf.py:98,134; dcngan.py:72,108; basicvsr_pp*.py;
edvr_net.py PCD; tdan_net.py). On TPU the op decomposes into, per kernel
tap k: a bilinear gather of the input at ``base + tap_offset + learned
offset``, a modulation-mask multiply, and a (cin x cout) matmul — the
gathers use the same one-(2,2,C)-slice-per-pixel formulation as
``ops.warp.flow_warp`` (TPU gathers are issue-rate-bound per row).

Layouts (ours, NHWC-native — the torch-layout conversion happens in model
converters):
  x:       (b, h, w, cin)
  offsets: (b, h, w, groups, k*k, 2)  last dim (dy, dx) in pixels
  mask:    (b, h, w, groups, k*k)    already sigmoid'ed
  kernel:  (kh, kw, cin, cout)       HWIO
Groups split the *input* channels (deform_groups in mmcv terms); cin must
divide by groups.

'same' padding, stride 1, dilation 1 (all the reference call sites use
3x3/s1/p1/d1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .warp import _warp_single_blockgather

__all__ = ["modulated_deform_conv2d"]


def modulated_deform_conv2d(
    x: jnp.ndarray,
    offsets: jnp.ndarray,
    mask: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    groups = offsets.shape[3]
    if cin % groups:
        raise ValueError(f"cin={cin} not divisible by groups={groups}")
    cg = cin // groups
    ph, pw = kh // 2, kw // 2

    xg = x.reshape(b, h, w, groups, cg)

    def sample_group(x_slice, flow_slice):
        # x_slice (b, h, w, cg), flow_slice (b, h, w, 2)
        return jax.vmap(_warp_single_blockgather)(x_slice, flow_slice)

    out = jnp.zeros((b, h, w, cout), jnp.float32)
    for k in range(kh * kw):
        ky, kx = divmod(k, kw)
        # sample position: (y + ky - ph + dy, x + kx - pw + dx), expressed
        # as a flow_warp pixel flow with (dx, dy) channel order
        d = offsets[:, :, :, :, k, :]  # (b, h, w, G, 2) = (dy, dx)
        flow = jnp.stack(
            [d[..., 1] + (kx - pw), d[..., 0] + (ky - ph)], axis=-1
        )
        sampled = jax.vmap(sample_group, in_axes=(3, 3), out_axes=3)(xg, flow)
        sampled = sampled * mask[:, :, :, :, k, None].astype(sampled.dtype)
        out = out + jnp.einsum(
            "bhwi,io->bhwo",
            sampled.reshape(b, h, w, cin),
            kernel[ky, kx],
            preferred_element_type=jnp.float32,
        )
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
