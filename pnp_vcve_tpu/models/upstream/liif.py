"""LIIF: local implicit image function SR (arbitrary-scale).

Reference surface: mmedit/models/backbones/sr_backbones/liif_net.py:12-300
(``LIIFNet`` / ``LIIFEDSR``): an EDSR-style encoder produces a feature map;
an MLP queried at continuous coordinates predicts RGB from (3x3-unfolded
nearest feature, relative coordinate, cell size), with the 4-neighbor local
ensemble weighted by rectangle areas.

Coordinates follow the reference's ``make_coord``: pixel centers in
[-1, 1]. For TPU friendliness the query gathers run as one vectorized
take over the flattened feature map. Layout NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["LIIFEDSR", "make_coord"]


def make_coord(shape, flatten: bool = True):
    """Pixel-center coordinates in [-1, 1] (reference make_coord)."""
    coords = []
    for n in shape:
        r = 1.0 / n
        coords.append(-1.0 + r + 2.0 * r * jnp.arange(n))
    grid = jnp.stack(jnp.meshgrid(*coords, indexing="ij"), axis=-1)
    return grid.reshape(-1, len(shape)) if flatten else grid


class LIIFEDSR(nn.Module):
    mid_channels: int = 64
    num_blocks: int = 16
    mlp_hidden: tuple = (256, 256, 256, 256)
    feat_unfold: bool = True
    local_ensemble: bool = True
    cell_decode: bool = True

    @nn.compact
    def __call__(self, x, coord, cell):
        """x (b, h, w, 3); coord (b, q, 2) in [-1,1] (row, col);
        cell (b, q, 2) -> rgb (b, q, 3)."""
        b, h, w, _ = x.shape
        # EDSR-baseline encoder (head + residual body, no upsampling)
        feat = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                       name="conv_first")(x)
        body = feat
        for i in range(self.num_blocks):
            y = nn.relu(nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                                name=f"block{i}_conv1")(body))
            y = nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                        name=f"block{i}_conv2")(y)
            body = body + y
        feat = feat + nn.Conv(self.mid_channels, (3, 3), padding="SAME",
                              name="conv_after_body")(body)

        if self.feat_unfold:
            # 3x3 unfold -> 9C channels
            pads = jnp.pad(feat, ((0, 0), (1, 1), (1, 1), (0, 0)))
            feat = jnp.concatenate(
                [pads[:, dy : dy + h, dx : dx + w]
                 for dy in range(3) for dx in range(3)],
                axis=-1,
            )
        c = feat.shape[-1]
        feat_flat = feat.reshape(b, h * w, c)

        ry = 1.0 / h  # half-cell radius in [-1,1] is 1/n
        rx = 1.0 / w
        shifts = (
            [(-1, -1), (-1, 1), (1, -1), (1, 1)] if self.local_ensemble else [(0, 0)]
        )
        eps = 1e-6 if self.local_ensemble else 0.0

        # ONE shared MLP queried at every ensemble shift
        mlp = [
            nn.Dense(hd, name=f"imnet_fc{li}")
            for li, hd in enumerate(self.mlp_hidden)
        ]
        mlp_out = nn.Dense(3, name="imnet_out")

        preds, areas = [], []
        for vy, vx in shifts:
            cy = jnp.clip(coord[..., 0] + vy * ry + eps, -1 + 1e-6, 1 - 1e-6)
            cx = jnp.clip(coord[..., 1] + vx * rx + eps, -1 + 1e-6, 1 - 1e-6)
            iy = jnp.clip(((cy + 1) / 2 * h - 0.5).round().astype(jnp.int32), 0, h - 1)
            ix = jnp.clip(((cx + 1) / 2 * w - 0.5).round().astype(jnp.int32), 0, w - 1)
            idx = iy * w + ix
            q_feat = jnp.take_along_axis(feat_flat, idx[..., None], axis=1)
            # nearest feature's own coordinate
            fy = -1 + 1.0 / h + 2.0 / h * iy
            fx = -1 + 1.0 / w + 2.0 / w * ix
            rel = jnp.stack(
                [(coord[..., 0] - fy) * h, (coord[..., 1] - fx) * w], axis=-1
            )
            inp = [q_feat, rel]
            if self.cell_decode:
                inp.append(jnp.stack([cell[..., 0] * h, cell[..., 1] * w], -1))
            z = jnp.concatenate(inp, axis=-1)
            for layer in mlp:
                z = nn.relu(layer(z))
            z = mlp_out(z)
            preds.append(z)
            areas.append(jnp.abs(rel[..., 0] * rel[..., 1]) + 1e-9)

        if not self.local_ensemble:
            return preds[0]
        tot = sum(areas)
        # diagonal-swap weighting (reference liif.py: areas swapped 0<->3, 1<->2)
        areas = [areas[3], areas[2], areas[1], areas[0]]
        return sum(p * (a / tot)[..., None] for p, a in zip(preds, areas))
