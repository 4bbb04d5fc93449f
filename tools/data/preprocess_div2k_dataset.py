#!/usr/bin/env python
"""Crop DIV2K/DF2K images into training sub-images (the analog of
reference tools/data/super-resolution/div2k/preprocess_div2k_dataset.py /
df2k_ost/preprocess_df2k_ost_dataset.py): SISR training reads thousands
of small crops far faster than full 2K frames.

    python tools/data/preprocess_div2k_dataset.py IN_DIR OUT_DIR \\
        [--crop-size 480] [--step 240] [--thresh-size 0] [--n-thread 8]
"""

import argparse
import os
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("input", help="folder of source images")
    p.add_argument("output", help="folder for sub-images")
    p.add_argument("--crop-size", type=int, default=480)
    p.add_argument("--step", type=int, default=240)
    p.add_argument(
        "--thresh-size", type=int, default=0,
        help="skip residual crops smaller than this",
    )
    p.add_argument("--n-thread", type=int, default=8)
    return p.parse_args()


def crop_one(task):
    path, out_dir, crop, step, thresh = task
    import numpy as np
    from PIL import Image

    img = np.asarray(Image.open(path))
    h, w = img.shape[:2]
    name = Path(path).stem
    h_starts = list(range(0, h - crop + 1, step))
    w_starts = list(range(0, w - crop + 1, step))
    # the reference keeps a final residual crop when the remainder exceeds
    # thresh_size (crop_sub_images.py semantics)
    if h - (h_starts[-1] + crop if h_starts else 0) > thresh:
        h_starts.append(max(0, h - crop))
    if w - (w_starts[-1] + crop if w_starts else 0) > thresh:
        w_starts.append(max(0, w - crop))
    n = 0
    for i, hs in enumerate(sorted(set(h_starts))):
        for j, ws in enumerate(sorted(set(w_starts))):
            sub = img[hs : hs + crop, ws : ws + crop]
            if min(sub.shape[:2]) < max(thresh, 1):
                continue
            n += 1
            Image.fromarray(sub).save(
                Path(out_dir) / f"{name}_s{i:03d}{j:03d}.png"
            )
    return n


def main():
    args = parse_args()
    os.makedirs(args.output, exist_ok=True)
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    paths = sorted(
        str(p) for p in Path(args.input).iterdir()
        if p.suffix.lower() in exts
    )
    if not paths:
        sys.exit(f"no images under {args.input}")
    tasks = [
        (p, args.output, args.crop_size, args.step, args.thresh_size)
        for p in paths
    ]
    total = 0
    with ProcessPoolExecutor(max_workers=args.n_thread) as ex:
        for n in ex.map(crop_one, tasks):
            total += n
    print(f"wrote {total} sub-images from {len(paths)} sources -> {args.output}")


if __name__ == "__main__":
    main()
