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


def mfqe_joint_enhance(
    pqf_apply,
    nonpqf_apply,
    frames,
    slice_types,
):
    """The MFQE two-model test protocol (reference restorers/
    mfqev2_restorer.py + the MFQE 2.0 paper's cascade): first enhance every
    PQF with the PQF model (neighbors = nearest OTHER PQFs), then enhance
    each non-PQF using the nearest ENHANCED left/right PQFs.

    Args:
      pqf_apply / nonpqf_apply: callables (lrs (1, 3, h, w, c)) -> (1, h, w, c)
        (e.g. ``functools.partial(model.apply, {'params': params})``).
      frames: (t, h, w, c) decoded clip in [0, 1].
      slice_types: length-t sequence of 'I'/'P'/'B'.

    Returns: (t, h, w, c) enhanced clip (numpy).
    """
    import numpy as np

    from pnp_vcve_tpu.data.ldp import PQF_SLICES, find_left_right_pqf

    t = frames.shape[0]
    slice_of = lambda i: slice_types[i]  # noqa: E731
    is_pqf = [slice_types[i] in PQF_SLICES for i in range(t)]
    out = np.array(frames, np.float32, copy=True)

    def triple(i, left, right, source):
        stack = np.stack([source[left], source[i], source[right]])[None]
        return np.asarray(out_apply(stack)[0])

    # pass 1: PQFs from the DECODED frames (PQF neighbors also decoded)
    out_apply = pqf_apply
    enhanced_pqf = {}
    for i in range(t):
        if not is_pqf[i]:
            continue
        left = i - 1
        while left >= 0 and not is_pqf[left]:
            left -= 1
        right = i + 1
        while right < t and not is_pqf[right]:
            right += 1
        left = i if left < 0 else left
        right = i if right >= t else right
        enhanced_pqf[i] = triple(i, left, right, frames)
    for i, v in enhanced_pqf.items():
        out[i] = v

    # pass 2: non-PQFs referencing the ENHANCED PQFs
    out_apply = nonpqf_apply
    for i in range(t):
        if is_pqf[i]:
            continue
        left, right = find_left_right_pqf(slice_of, i, t, compressed=True)
        out[i] = triple(i, left, right, out)
    return out
