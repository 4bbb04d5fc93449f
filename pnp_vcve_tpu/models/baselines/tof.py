"""TOFlow and RealBasicVSR (upstream zoo).

Reference surfaces:
- TOFlow: mmedit/models/backbones/sr_backbones/tof.py:144-252 — a 4-level
  SPyNet aligns 6 support frames to the reference frame of a 7-frame
  window (on already-upsampled inputs), then a 9x9/9x9/1x1/1x1 conv head
  reconstructs the center frame; ImageNet mean/std normalization;
  ``adapt_official_weights`` reorders the window so the reference frame
  is index 0.
- RealBasicVSRNet: real_basicvsr_net.py:13-110 — an image-cleaning
  residual module applied (optionally repeatedly) before BasicVSRNet.

Layout: NHWC, [0, 1] inputs.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from pnp_vcve_tpu.models.spynet import SPyNet
from pnp_vcve_tpu.ops.warp import flow_warp

__all__ = ["TOFlow", "RealBasicVSRNet"]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


class TOFlow(nn.Module):
    adapt_official_weights: bool = False

    @nn.compact
    def __call__(self, lrs: jnp.ndarray) -> jnp.ndarray:
        """lrs (b, 7, h, w, 3) -> center SR frame (b, h, w, 3)."""
        if self.adapt_official_weights:
            lrs = lrs[:, jnp.asarray([3, 0, 1, 2, 4, 5, 6])]
            ref_idx = 0
        else:
            ref_idx = 3

        mean = jnp.asarray(_MEAN, lrs.dtype)
        std = jnp.asarray(_STD, lrs.dtype)
        lrs = (lrs - mean) / std
        ref = lrs[:, ref_idx]

        spynet = SPyNet(levels=4, name="spynet")
        aligned = []
        for i in range(7):
            if i == ref_idx:
                aligned.append(ref)
            else:
                supp = lrs[:, i]
                flow = spynet(ref, supp)
                aligned.append(flow_warp(supp, flow))
        hr = jnp.concatenate(aligned, axis=-1)
        hr = nn.relu(nn.Conv(64, (9, 9), padding="SAME", name="conv1")(hr))
        hr = nn.relu(nn.Conv(64, (9, 9), padding="SAME", name="conv2")(hr))
        hr = nn.relu(nn.Conv(64, (1, 1), name="conv3")(hr))
        hr = nn.Conv(3, (1, 1), name="conv4")(hr) + ref
        return hr * std + mean


class RealBasicVSRNet(nn.Module):
    mid_channels: int = 64
    num_propagation_blocks: int = 20
    num_cleaning_blocks: int = 20
    dynamic_refine_thres: float = 255.0
    is_fix_cleaning: bool = False
    is_sequential_cleaning: bool = False

    @nn.compact
    def __call__(self, lqs: jnp.ndarray, return_lqs: bool = False):
        from pnp_vcve_tpu.models.baselines.basicvsr import BasicVSRNet

        b, t, h, w, c = lqs.shape

        def clean(frames):
            x = frames.reshape(b * t, h, w, c)
            feat = nn.leaky_relu(
                nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                        name="clean_in")(x), 0.1)
            for i in range(self.num_cleaning_blocks):
                y = nn.relu(nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                                    name=f"clean{i}_conv1")(feat))
                y = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                            name=f"clean{i}_conv2")(y)
                feat = feat + y
            res = nn.Conv(c, (3, 3), padding="SAME", name="clean_out")(feat)
            return (x + res).reshape(b, t, h, w, c)

        # the reference iterates cleaning until the mean residual is below
        # dynamic_refine_thres (data-dependent, max 3); one pass is the
        # compile-friendly default and the thres>=255 configuration
        lqs = clean(lqs)
        out = BasicVSRNet(
            mid_channels=self.mid_channels,
            num_blocks=self.num_propagation_blocks,
            name="basicvsr",
        )(lqs)
        if return_lqs:
            return out, lqs
        return out
