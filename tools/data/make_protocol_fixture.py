#!/usr/bin/env python
"""Synthesize a REDS4-shaped protocol-scale eval fixture.

The reference's regression protocol runs 100-frame 720p clips through
``tools/test.py`` and reports per-clip PSNR/SSIM
(``/root/reference/tools/test.py:175-182``,
``mmedit/models/restorers/basicvsr.py:155-233``). No real REDS data ships
in this environment, so this tool synthesizes a dataset with the exact
REDS4 layout the test CLI scans:

    <root>/crf15/png/<clip>/%08d.png   decoded (degraded) frames
    <root>/crf15/mv/<clip>/%08d.npy    bitstream MV sidecars
    <root>/sharp/png/<clip>/%08d.png   ground truth
    <root>/qp.json                     per-frame QP / slice type

Content is smooth band-limited texture under a per-clip global integer
translation, so (a) PNGs stay small at 720p, (b) the MV sidecars are
*true* block motion (16x16 blocks, |MV| <= 16 px — inside the PF serving
contract, docs/serving_contract.md), and (c) the degradation (separable
blur + quantization + deterministic noise) gives PSNR headroom an
enhancer could actually recover, rather than unlearnable iid noise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

REDS4_CLIPS = ("000", "011", "015", "020")
MV_SCALE = 4.0  # H.264 quarter-pel units


def synth_texture(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Periodic band-limited RGB texture in [0,1] (periodic so np.roll is
    exactly the translated frame — the MV sidecars are exact motion)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w, 3), np.float32)
    for _ in range(8):
        ky = rng.integers(1, 5) * 2.0 * np.pi / h
        kx = rng.integers(1, 5) * 2.0 * np.pi / w
        phase = rng.uniform(0, 2 * np.pi)
        amp = rng.uniform(0.05, 0.25, size=3).astype(np.float32)
        wave = np.sin(ky * yy + kx * xx + phase)[..., None]
        img += amp * wave
    img = 0.5 + img / (np.abs(img).max() + 1e-6) * 0.45
    return img.astype(np.float32)


def degrade(frame: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Compression-like degradation: 3-tap separable blur + 16-level
    quantization + small zero-mean noise. Deterministic given ``rng``."""
    k = np.asarray([0.25, 0.5, 0.25], np.float32)
    x = frame
    x = (
        np.roll(x, 1, axis=0) * k[0] + x * k[1] + np.roll(x, -1, axis=0) * k[2]
    )
    x = (
        np.roll(x, 1, axis=1) * k[0] + x * k[1] + np.roll(x, -1, axis=1) * k[2]
    )
    x = np.round(x * 64.0) / 64.0
    x = x + rng.normal(0.0, 0.004, x.shape).astype(np.float32)
    return np.clip(x, 0.0, 1.0)


def block_mv_records(h: int, w: int, dx: int, dy: int) -> np.ndarray:
    """One forward MV record per 16x16 block (rasterizer layout
    ``(direction, w, h, x_w, y_w, x, y, motion_x, motion_y, scale)``,
    pnp_vcve_tpu/data/mv_raster.py). Content rolls by (dy, dx) per frame,
    so reconstructing the current frame from the previous one samples it
    at ``pos - (dx, dy)``: flow = -(dx, dy)."""
    ys = np.arange(8, h, 16, dtype=np.float32)
    xs = np.arange(8, w, 16, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)
    n = gx.size
    rec = np.zeros((n, 10), np.float32)
    rec[:, 0] = -1.0  # forward
    rec[:, 1] = 16.0
    rec[:, 2] = 16.0
    rec[:, 3] = gx.ravel() - dx  # matched center in the reference frame
    rec[:, 4] = gy.ravel() - dy
    rec[:, 5] = gx.ravel()
    rec[:, 6] = gy.ravel()
    rec[:, 7] = -float(dx) * MV_SCALE
    rec[:, 8] = -float(dy) * MV_SCALE
    rec[:, 9] = MV_SCALE
    return rec


def slice_type(i: int, gop: int = 32) -> str:
    if i % gop == 0:
        return "I"
    return "P" if i % 2 else "B"


def write_fixture(
    root: str | Path,
    clips=REDS4_CLIPS,
    frames: int = 100,
    height: int = 720,
    width: int = 1280,
    crf: int = 15,
    seed: int = 0,
    quiet: bool = False,
) -> Path:
    from PIL import Image

    root = Path(root)
    sidecar = {f"crf{crf}": {}}
    # per-clip integer motion, |v| <= 3 px/frame (well inside the 16 px
    # PF-contract bound over one frame step)
    motions = [(2, 1), (-2, 1), (1, -2), (-1, -1), (3, 0), (0, 2)]
    for ci, clip in enumerate(clips):
        rng = np.random.default_rng(seed + 1000 * ci)
        tex = synth_texture(rng, height, width)
        dx, dy = motions[ci % len(motions)]
        png = root / f"crf{crf}" / "png" / clip
        mv = root / f"crf{crf}" / "mv" / clip
        gt = root / "sharp" / "png" / clip
        for d in (png, mv, gt):
            d.mkdir(parents=True, exist_ok=True)
        entries = {}
        for i in range(frames):
            frame = np.roll(tex, (i * dy, i * dx), axis=(0, 1))
            gt_u8 = np.clip(np.round(frame * 255.0), 0, 255).astype(np.uint8)
            lq = degrade(frame, rng)
            lq_u8 = np.clip(np.round(lq * 255.0), 0, 255).astype(np.uint8)
            Image.fromarray(gt_u8).save(gt / f"{i:08d}.png")
            Image.fromarray(lq_u8).save(png / f"{i:08d}.png")
            st = slice_type(i)
            if st == "I":
                recs = np.zeros((0, 10), np.float32)
            else:
                recs = block_mv_records(height, width, dx, dy)
            np.save(mv / f"{i:08d}.npy", recs)
            entries[str(i)] = {
                "QP": float(20 + crf // 3 + (i % 5)),
                "slice": st,
            }
        sidecar[f"crf{crf}"][clip] = entries
        if not quiet:
            print(f"[fixture] clip {clip}: {frames}x{height}x{width} "
                  f"motion=({dx},{dy})")
    (root / "qp.json").write_text(json.dumps(sidecar))
    return root


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="output root directory")
    p.add_argument("--clips", default=",".join(REDS4_CLIPS))
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--crf", type=int, default=15)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()
    write_fixture(
        args.root, clips=tuple(args.clips.split(",")), frames=args.frames,
        height=args.height, width=args.width, crf=args.crf, seed=args.seed,
    )


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).resolve().parents[2]))
    main()
