#!/usr/bin/env python
"""Background Matting video dataset annotation generator (the analog of
/root/reference/tools/data/matting/bgm/preprocess_bgm_dataset.py): walk
``fixed-camera/train`` videos, pair each ``NNNN_img.png`` frame with its
``NNNN_masksDL.png`` segmentation, the clip's captured background
``<clip>.png``, and a cycled supplementary background frame; write
``fixed_camera_train.json``.

    python tools/data/preprocess_bgm_dataset.py ROOT [--seg-root D]
        [--bg-root D] [--all-data]

Reference quirk kept: without ``--all-data`` the LAST 80 frames of each
video are dropped (the original Background Matting repo excludes them
because of its motion cue, preprocess_bgm_dataset.py:17-21).
"""

from __future__ import annotations

import argparse
import json
from itertools import cycle
from pathlib import Path


def generate_json(data_root, seg_root=None, bg_root=None, all_data=False):
    root = Path(data_root)
    video_root = root / "fixed-camera" / "train"
    seg_root = Path(seg_root) if seg_root else video_root
    bg_root = Path(bg_root) if bg_root else root / "background"

    bg_frames = sorted(
        f for d in sorted(bg_root.iterdir()) if d.is_dir()
        for f in sorted(d.iterdir())
    )
    if not bg_frames:
        raise SystemExit(f"no background frames under {bg_root}")
    bg_stream = cycle(bg_frames)

    infos = []
    for video_dir in sorted(d for d in video_root.iterdir() if d.is_dir()):
        n = len(list(video_dir.glob("*_img.png")))
        effective = n if all_data else n - 80
        for i in range(1, effective + 1):
            infos.append(dict(
                merged_path=str(video_dir / f"{i:04d}_img.png"),
                seg_path=str(seg_root / video_dir.name / f"{i:04d}_masksDL.png"),
                bg_path=str(video_dir) + ".png",
                bg_sup_path=str(next(bg_stream)),
            ))
    out = root / "fixed_camera_train.json"
    out.write_text(json.dumps(infos, indent=1))
    return infos


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("data_root")
    p.add_argument("--seg-root", default=None)
    p.add_argument("--bg-root", default=None)
    p.add_argument("--all-data", action="store_true")
    args = p.parse_args()
    infos = generate_json(
        args.data_root, args.seg_root, args.bg_root, args.all_data
    )
    print(f"wrote {len(infos)} records to fixed_camera_train.json")


if __name__ == "__main__":
    main()
