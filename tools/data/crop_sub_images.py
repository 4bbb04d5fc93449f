#!/usr/bin/env python
"""Extract overlapped sub-image crops for patch training (the analog of
/root/reference/tools/data/super-resolution/reds/crop_sub_images.py —
also the DIV2K/DF2K sub-image step): a sliding window of ``crop_size``
with ``step`` stride, plus a final edge-aligned window when the remainder
exceeds ``thresh_size``.

    python tools/data/crop_sub_images.py --input-folder IN --save-folder OUT \
        [--crop-size 480] [--step 240] [--thresh-size 0] [--n-thread 4]

Layout quirk kept from the reference (crop_sub_images.py:50-58): each
crop index becomes its own ``<sequence>_s<idx>/`` clip folder holding the
frame images, so clip-scanning datasets pick the crops up as clips.
"""

from __future__ import annotations

import argparse
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np


def crop_windows(h: int, w: int, crop_size: int, step: int, thresh_size: int):
    """Window origins, reference semantics (crop_sub_images.py:43-48)."""
    h_space = np.arange(0, h - crop_size + 1, step)
    if h - (h_space[-1] + crop_size) > thresh_size:
        h_space = np.append(h_space, h - crop_size)
    w_space = np.arange(0, w - crop_size + 1, step)
    if w - (w_space[-1] + crop_size) > thresh_size:
        w_space = np.append(w_space, w - crop_size)
    return [(int(x), int(y)) for x in h_space for y in w_space]


def worker(job):
    from PIL import Image

    path, root, save_folder, crop_size, step, thresh_size = job
    path = Path(path)
    sequence = path.parent.name
    img = np.asarray(Image.open(path))
    for index, (x, y) in enumerate(
        crop_windows(img.shape[0], img.shape[1], crop_size, step, thresh_size),
        start=1,
    ):
        sub = Path(save_folder) / f"{sequence}_s{index:03d}"
        sub.mkdir(parents=True, exist_ok=True)
        Image.fromarray(img[x : x + crop_size, y : y + crop_size]).save(
            sub / path.name
        )
    return path.name


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input-folder", required=True)
    p.add_argument("--save-folder", required=True)
    p.add_argument("--crop-size", type=int, default=480)
    p.add_argument("--step", type=int, default=240)
    p.add_argument("--thresh-size", type=int, default=0)
    p.add_argument("--n-thread", type=int, default=4)
    args = p.parse_args()

    save = Path(args.save_folder)
    if save.exists():
        print(f"Folder {save} already exists. Exit.")
        sys.exit(1)
    save.mkdir(parents=True)

    imgs = sorted(
        f for f in Path(args.input_folder).rglob("*")
        if f.suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp")
    )
    jobs = [
        (str(f), args.input_folder, str(save), args.crop_size, args.step,
         args.thresh_size)
        for f in imgs
    ]
    if args.n_thread > 1:
        with Pool(args.n_thread) as pool:
            for name in pool.imap_unordered(worker, jobs):
                print(f"Processing {name} ...", flush=True)
    else:
        for j in jobs:
            print(f"Processing {worker(j)} ...", flush=True)
    print("All processes done.")


if __name__ == "__main__":
    main()
