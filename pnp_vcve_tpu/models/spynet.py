"""SPyNet optical-flow network (flax).

Used by the upstream baseline family the reference carries (BasicVSR /
IconVSR / MFQEv2 — reference basicvsr_net.py:561-756): a 6-level spatial
pyramid; at each level a 5-conv module refines the x2-upsampled coarser
flow from [ref, border-warped supp, flow]. Images are resized to a multiple
of 32 before the pyramid and the flow is resized/rescaled back.

Layout: NHWC; flow channels are (dx, dy) in pixels (flow_warp convention).
Checkpoint conversion maps the torch ``basic_module.{i}.basic_module.{j}``
conv weights OIHW->HWIO.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnp_vcve_tpu.ops.warp import flow_warp
from pnp_vcve_tpu.ops.resize import (
    resize_bilinear,
    resize_bilinear_align_corners,
)

__all__ = ["SPyNet", "SPyNetBasicModule"]

_MEAN = (0.485, 0.456, 0.406)
_STD = (0.229, 0.224, 0.225)


class SPyNetBasicModule(nn.Module):
    """[ref(3), warped supp(3), flow(2)] -> flow residual (2); convs 7x7
    8->32->64->32->16->2 with ReLU between (basicvsr_net.py:695-756)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, ch in enumerate((32, 64, 32, 16)):
            x = nn.relu(
                nn.Conv(ch, (7, 7), padding="SAME", name=f"conv{i}")(x)
            )
        return nn.Conv(2, (7, 7), padding="SAME", name="conv4")(x)


class SPyNet(nn.Module):
    """Flow from ref to supp; inputs (b, h, w, 3) in [0, 1]."""

    levels: int = 6

    @nn.compact
    def __call__(self, ref: jnp.ndarray, supp: jnp.ndarray) -> jnp.ndarray:
        b, h, w, _ = ref.shape
        h_up = h if h % 32 == 0 else 32 * (h // 32 + 1)
        w_up = w if w % 32 == 0 else 32 * (w // 32 + 1)
        ref_r = resize_bilinear(ref, (h_up, w_up))
        supp_r = resize_bilinear(supp, (h_up, w_up))

        mean = jnp.asarray(_MEAN, ref.dtype)
        std = jnp.asarray(_STD, ref.dtype)
        refs = [(ref_r - mean) / std]
        supps = [(supp_r - mean) / std]
        for _ in range(self.levels - 1):
            refs.append(nn.avg_pool(refs[-1], (2, 2), (2, 2)))
            supps.append(nn.avg_pool(supps[-1], (2, 2), (2, 2)))
        refs = refs[::-1]
        supps = supps[::-1]

        modules = [
            SPyNetBasicModule(name=f"basic_module{i}") for i in range(self.levels)
        ]
        flow = jnp.zeros_like(refs[0][..., :2])
        for level in range(self.levels):
            if level == 0:
                flow_up = flow
            else:
                hh, ww = refs[level].shape[1:3]
                flow_up = (
                    resize_bilinear_align_corners(flow, (hh, ww)) * 2.0
                )
            warped = flow_warp(supps[level], flow_up, padding_mode="border")
            flow = flow_up + modules[level](
                jnp.concatenate([refs[level], warped, flow_up], axis=-1)
            )

        flow = resize_bilinear(flow, (h, w))
        scale = jnp.asarray(
            [w / w_up, h / h_up], flow.dtype
        )
        return flow * scale
