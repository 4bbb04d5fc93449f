#!/usr/bin/env python
"""Generate a synthetic codec-prior dataset for smoke tests and CI drives.

Layout mirrors the real data layout the reference documents
(/root/reference/README.md:40-54): per-CRF folders with ``png/<clip>/*.png``
frames and ``mv/<clip>/*.npy`` motion-vector sidecars, a ``sharp/png``
ground-truth tree, and one QP/slice JSON keyed ``crf{N}/<clip>/<frame>``.

The reference ships dataset-prep scripts under tools/data/** (SURVEY §2.6);
this is the TPU repo's equivalent for environments without REDS/DAVIS.

Usage:
  python tools/data/make_synthetic_dataset.py OUT_DIR \
      [--clips 000 011 015 020] [--frames 10] [--hw 64 64] [--seed 0]
"""

import argparse
import json
from pathlib import Path

import numpy as np
from PIL import Image


def write_clip(root: Path, crf: int, clip: str, n_frames: int, h: int, w: int, rng):
    png_dir = root / f"crf{crf}" / "png" / clip
    mv_dir = root / f"crf{crf}" / "mv" / clip
    png_dir.mkdir(parents=True, exist_ok=True)
    mv_dir.mkdir(parents=True, exist_ok=True)
    qp_entries = {}
    for i in range(n_frames):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(png_dir / f"{i:08d}.png")
        if i == 0:
            recs = np.zeros((0, 10), np.float32)
            st = "I"
        else:
            # a few MV records: (direction, w, h, x_w, y_w, x, y, mx, my, scale)
            recs = []
            for by in range(0, h, 16):
                for bx in range(0, w, 16):
                    recs.append(
                        [-1, 16, 16, bx + 8, by + 8, bx + 8, by + 8,
                         float(rng.integers(-12, 13)), float(rng.integers(-12, 13)), 4.0]
                    )
            recs = np.asarray(recs, np.float32)
            st = "P" if i % 4 == 0 else "B"
        np.save(mv_dir / f"{i:08d}.npy", recs)
        qp_entries[str(i)] = {"QP": float(20 + (i % 8)), "slice": st}
    return qp_entries


def write_dataset(root, clips, n_frames: int, h: int, w: int, seed: int = 0):
    """Write the full synthetic layout (crf15/25/35 + sharp + qp.json).

    Deterministic for a given (clips, n_frames, h, w, seed): the parity-gate
    fixture (tools/record_parity_fixture.py, tests/test_parity_gate.py)
    regenerates the identical dataset from the recorded spec instead of
    committing PNG trees.
    """
    root = Path(root)
    rng = np.random.default_rng(seed)
    sidecar = {}
    for crf in (15, 25, 35):
        sidecar[f"crf{crf}"] = {}
        for clip in clips:
            sidecar[f"crf{crf}"][clip] = write_clip(
                root, crf, clip, n_frames, h, w, rng
            )
    for clip in clips:
        gt_dir = root / "sharp" / "png" / clip
        gt_dir.mkdir(parents=True, exist_ok=True)
        for i in range(n_frames):
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            Image.fromarray(img).save(gt_dir / f"{i:08d}.png")
    (root / "qp.json").write_text(json.dumps(sidecar))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output dataset root")
    ap.add_argument("--clips", nargs="+", default=["000", "011", "015", "020"])
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--hw", type=int, nargs=2, default=(64, 64))
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    h, w = args.hw
    write_dataset(args.out, args.clips, args.frames, h, w, args.seed)
    print(f"wrote {len(args.clips)} clips x {args.frames} frames ({h}x{w}) to {args.out}")


if __name__ == "__main__":
    main()
