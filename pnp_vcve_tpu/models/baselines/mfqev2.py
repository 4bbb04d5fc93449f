"""MFQEv2 baseline (multi-frame quality enhancement v2).

Reference: mmedit/models/backbones/sr_backbones/mfqev2.py:12-179: SPyNet
aligns the two peak-quality frames to the center frame, multi-scale (3/5/7)
conv banks extract features, a dense block of PReLU+BatchNorm convs
reconstructs, residual to the center frame.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from pnp_vcve_tpu.models.spynet import SPyNet
from pnp_vcve_tpu.ops.warp import flow_warp

__all__ = ["MFQEv2"]


class _RecBlock(nn.Module):
    """conv + PReLU + BatchNorm (reference rec_conv entries c10-c14)."""

    nf: int

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(self.nf, (3, 3), padding="SAME", name="conv")(x)
        y = nn.PReLU(name="prelu")(y)
        return nn.BatchNorm(
            use_running_average=not train, name="bn"
        )(y)


class MFQEv2(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    nf: int = 32

    @nn.compact
    def __call__(self, lrs: jnp.ndarray, train: bool = False, **_ignored):
        """lrs: (b, 3, h, w, c) = [left PQF, center, right PQF] -> (b, h, w, c)."""
        center = lrs[:, 1]
        spynet = SPyNet(name="spynet")

        def align(frame):
            flow = spynet(center, frame)
            return flow_warp(frame, flow)

        left = align(lrs[:, 0])
        right = align(lrs[:, 2])

        feats = []
        for ks in (3, 5, 7):
            for j, frame in enumerate((left, center, right)):
                feats.append(
                    nn.Conv(self.nf, (ks, ks), padding="SAME",
                            name=f"ks{ks}_conv{j}")(frame)
                )
        feat = jnp.concatenate(feats, axis=-1)

        outs = [_RecBlock(self.nf, name="rec0")(feat, train)]
        for i in range(3):
            outs.append(
                _RecBlock(self.nf, name=f"rec{i + 1}")(
                    jnp.concatenate(outs, axis=-1), train
                )
            )
        out = _RecBlock(self.nf, name="rec4")(jnp.concatenate(outs, axis=-1), train)
        out = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="rec5")(out)
        return out + center
