"""SIDECVSR: codec-side-information VSR (plug_and_play family).

Reference: mmedit/models/backbones/plug_and_play/SIDECVSR_J_fast.py:70-431.
A 7-frame Y-channel x4 VSR net using codec side info: SFT residual blocks
embed side features (residual/partition/unfiltered maps) into per-frame
features; an MV-guided local attention aligns neighbor features (kernel
prediction over 3x3 patch positions after an MV warp); a 3-level feature
pyramid is fused per level and reconstructed by SCNet (multi-scale groups
with up/down exchange); incremental ``pre_l1_fea`` caching re-extracts only
the newest frame in sliding-window eval (SIDECVSR_J_fast.py:121-136).

TPU notes: torch Unfold becomes 9 shifted views stacked on channels; the
STN's normalized-coordinate warp (u*32 px, coordinates clamped into the
image — SIDECVSR_J_fast.py:24-33) maps onto flow_warp's border mode.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pnp_vcve_tpu.ops.warp import flow_warp
from pnp_vcve_tpu.ops.resize import resize_bilinear
from pnp_vcve_tpu.ops.upsample import pixel_shuffle

__all__ = ["SIDECVSR"]


def _unfold3(x):
    """(b, h, w, c) -> (b, h, w, 9, c): 3x3 patches, zeros padding."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    views = [
        xp[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)
    ]
    return jnp.stack(views, axis=3)


class _SFTLayer(nn.Module):
    nf: int = 64  # reference hardcodes 64 (SIDECVSR_J_fast.py:360-372)

    @nn.compact
    def __call__(self, feas, side):
        x = jnp.concatenate([feas, side], axis=-1)
        scale = nn.Conv(self.nf, (1, 1), name="scale1")(
            nn.leaky_relu(nn.Conv(self.nf, (1, 1), name="scale0")(x), 0.1)
        )
        shift = nn.Conv(self.nf, (1, 1), name="shift1")(
            nn.leaky_relu(nn.Conv(self.nf, (1, 1), name="shift0")(x), 0.1)
        )
        return feas * (scale + 1.0) + shift


class _ResBlockSFT(nn.Module):
    nf: int = 64

    @nn.compact
    def __call__(self, feas, side):
        y = _SFTLayer(self.nf, name="sft0")(feas, side)
        y = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", name="conv0")(y))
        y = _SFTLayer(self.nf, name="sft1")(y, side)
        y = nn.Conv(self.nf, (3, 3), padding="SAME", name="conv1")(y)
        return feas + y


class _MVLocalAttn(nn.Module):
    """Kernel-predicted fusion of MV-warped neighbor patches
    (SIDECVSR_J_fast.py:36-68)."""

    nf: int = 64

    @nn.compact
    def __call__(self, nbh, cen, mv):
        b, h, w, c = cen.shape
        nbh_p = _unfold3(nbh)  # (b, h, w, 9, c)
        cen_p = _unfold3(cen)
        # STN: displacement = mv * 32 px, coordinates clamped (border)
        flow = mv * 32.0
        nbh_flat = nbh_p.reshape(b, h, w, 9 * c)
        aligned = flow_warp(nbh_flat, flow, padding_mode="border")
        attn_in = jnp.concatenate([aligned, cen_p.reshape(b, h, w, 9 * c)], axis=-1)
        a = nn.leaky_relu(nn.Conv(self.nf, (1, 1), name="kpred0")(attn_in), 0.1)
        a = nn.softmax(nn.Conv(9, (1, 1), name="kpred1")(a), axis=-1)
        out = jnp.mean(
            aligned.reshape(b, h, w, 9, c) * a[..., None], axis=3
        )
        return out


class _FeaFusion(nn.Module):
    """Temporal correlation gating (SIDECVSR_J_fast.py:231-253)."""

    nf: int = 64
    n: int = 7

    @nn.compact
    def __call__(self, feas):
        # feas: (b, h, w, n*nf)
        b, h, w, _ = feas.shape
        x = feas.reshape(b, h, w, self.n, self.nf)
        emb = nn.Conv(self.nf, (3, 3), padding="SAME", name="tAtt")(
            x.transpose(0, 3, 1, 2, 4).reshape(b * self.n, h, w, self.nf)
        ).reshape(b, self.n, h, w, self.nf)
        ref = emb[:, self.n // 2]
        cor = jnp.stack(
            [jnp.sum(emb[:, i] * ref, axis=-1) for i in range(self.n)], axis=1
        )
        prob = nn.sigmoid(cor)[..., None]  # (b, n, h, w, 1)
        gated = x.transpose(0, 3, 1, 2, 4) * prob
        return gated.transpose(0, 2, 3, 1, 4).reshape(b, h, w, self.n * self.nf)


class _Block(nn.Module):
    """Multi-scale exchange block (SIDECVSR_J_fast.py:268-311)."""

    nf: int = 64

    @nn.compact
    def __call__(self, x_list):
        res = []
        for i, x in enumerate(x_list):
            y = nn.leaky_relu(
                nn.Conv(2 * self.nf, (3, 3), padding="SAME", name=f"body{i}_0")(x), 0.1
            )
            res.append(nn.Conv(self.nf, (3, 3), padding="SAME", name=f"body{i}_1")(y))
        down = [res[0]] + [
            resize_bilinear(nn.Conv(self.nf, (1, 1), name=f"down{i}")(r),
                            (r.shape[1] // 2, r.shape[2] // 2))
            for i, r in enumerate(res[:-1])
        ]
        up = [
            resize_bilinear(nn.Conv(self.nf, (1, 1), name=f"up{i}")(r),
                            (r.shape[1] * 2, r.shape[2] * 2))
            for i, r in enumerate(res[1:])
        ] + [res[-1]]
        return [x + r + d + u for x, r, d, u in zip(x_list, res, down, up)]


class _SCGroup(nn.Module):
    nf: int = 64
    n_blocks: int = 3

    @nn.compact
    def __call__(self, x_list):
        res = x_list
        for i in range(self.n_blocks):
            res = _Block(self.nf, name=f"block{i}")(res)
        res = [nn.Conv(self.nf, (3, 3), padding="SAME", name=f"conv{i}")(r)
               for i, r in enumerate(res)]
        return [x + r for x, r in zip(x_list, res)]


class SIDECVSR(nn.Module):
    """7-frame Y-channel x4 VSR with codec side info."""

    nf: int = 64
    nframes: int = 7
    scg_n: int = 4

    @nn.compact
    def __call__(self, x, mvs, pms, rms, ufs, pre_l1_fea: Optional[jnp.ndarray] = None):
        """x (b,n,h,w,1); mvs (b,n,h,w,2); pms/rms/ufs (b,n,h,w,1).

        Returns (out (b,4h,4w,1), l1_fea (b,n,h,w,nf)) — the feature stack
        is returned for incremental sliding-window reuse.
        """
        b, n, h, w, c = x.shape
        nf = self.nf
        center = self.nframes // 2
        lrelu = lambda v: nn.leaky_relu(v, 0.1)  # noqa: E731

        side_convs = [
            nn.Conv(32, (3, 3), padding="SAME", name=f"side_to_fea{i}")
            for i in range(4)
        ]

        def side_fea_ext(s):
            for conv in side_convs:
                s = lrelu(conv(s))
            return s

        conv_first = nn.Conv(nf, (3, 3), padding="SAME", name="conv_first")

        def extract(frames, sides):
            f = lrelu(conv_first(frames))
            s = side_fea_ext(sides)
            for i in range(7):
                f = _ResBlockSFT(nf, name=f"RB_wSide_{i + 1}")(f, s)
            return f

        if pre_l1_fea is None:
            frames = x.reshape(b * n, h, w, c)
            sides = jnp.concatenate(
                [rms.reshape(b * n, h, w, c), pms.reshape(b * n, h, w, c),
                 ufs.reshape(b * n, h, w, c)], axis=-1,
            )
            l1 = extract(frames, sides).reshape(b, n, h, w, nf)
        else:
            new = extract(
                x[:, -1],
                jnp.concatenate([rms[:, -1], pms[:, -1], ufs[:, -1]], axis=-1),
            )
            l1 = jnp.concatenate([pre_l1_fea[:, 1:], new[:, None]], axis=1)

        # 3-level pyramid, MV-guided local attention per level
        fused = []
        mv_attn = _MVLocalAttn(nf=nf, name="mv_patch_attn")
        fea_attn = _FeaFusion(nf=nf, n=self.nframes, name="tmp_fea_attn")
        tsa = nn.Conv(nf, (1, 1), name="tsa_fusion")
        feat = l1
        for lv in range(3):
            hh, ww = feat.shape[2], feat.shape[3]
            aligned = []
            for i in range(n):
                if i != n // 2:
                    mv_i = mvs[:, i]
                    if lv:
                        mv_i = resize_bilinear(mv_i, (hh, ww)) / (2.0 ** lv)
                    aligned.append(mv_attn(feat[:, i], feat[:, n // 2], mv_i))
                else:
                    aligned.append(feat[:, i])
            stack = jnp.concatenate(aligned, axis=-1)
            fused.append(lrelu(tsa(fea_attn(stack))))
            if lv < 2:
                feat = jax.vmap(
                    lambda f: resize_bilinear(f, (hh // 2, ww // 2)), in_axes=1,
                    out_axes=1,
                )(feat)

        out_list = fused
        for g in range(self.scg_n):
            out_list = _SCGroup(nf, name=f"scg{g}")(out_list)
        # SCNet outer residual (SIDECVSR_J_fast.py:345-356)
        out_list = [x0 + r for x0, r in zip(fused, out_list)]

        out_l3 = lrelu(nn.Conv(nf, (1, 1), name="upconv1_L3")(out_list[2]))
        out_l3 = pixel_shuffle(pixel_shuffle(out_l3, 2), 2)
        out_l2 = lrelu(nn.Conv(nf, (1, 1), name="upconv1_L2")(out_list[1]))
        out_l2 = pixel_shuffle(out_l2, 2)
        out_fuse = jnp.concatenate([out_list[0], out_l2, out_l3], axis=-1)

        y = lrelu(pixel_shuffle(
            nn.Conv(nf * 4, (3, 3), padding="SAME", name="upconv1")(out_fuse), 2))
        y = lrelu(pixel_shuffle(nn.Conv(nf * 4, (1, 1), name="upconv2")(y), 2))
        y = nn.Conv(1, (3, 3), padding="SAME", name="conv_last")(y)

        base = resize_bilinear(x[:, center], (4 * h, 4 * w))
        return y + base, l1
