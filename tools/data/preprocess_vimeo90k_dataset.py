#!/usr/bin/env python
"""Generate Vimeo-90k annotation key lists (the analog of reference
tools/data/super-resolution/vimeo90k/preprocess_vimeo90k_dataset.py):
scan ``<root>/<clip>/<subclip>/im*.png`` septuplets and write
``<clip>/<subclip> (h,w,3)`` lines for the SR/compress/VFI dataset
classes (sr_vimeo90k_multiple_gt_compress_dataset.py:66-67,
vfi_vimeo90k_dataset.py).

    python tools/data/preprocess_vimeo90k_dataset.py ROOT out_keys.txt \\
        [--train-list sep_trainlist.txt]
"""

import argparse
from pathlib import Path


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root", help="vimeo septuplet root (<clip>/<subclip>/im*.png)")
    p.add_argument("out", help="annotation txt to write")
    p.add_argument(
        "--train-list", default=None,
        help="restrict to keys listed in an official sep_trainlist.txt",
    )
    return p.parse_args()


def main():
    args = parse_args()
    root = Path(args.root)
    allow = None
    if args.train_list:
        allow = {
            line.strip() for line in open(args.train_list) if line.strip()
        }
    lines = []
    for clip in sorted(p for p in root.iterdir() if p.is_dir()):
        for sub in sorted(p for p in clip.iterdir() if p.is_dir()):
            key = f"{clip.name}/{sub.name}"
            if allow is not None and key not in allow:
                continue
            frames = sorted(sub.glob("im*.png"))
            if not frames:
                continue
            from PIL import Image

            w, h = Image.open(frames[0]).size
            lines.append(f"{key} ({h},{w},3)")
    Path(args.out).write_text("\n".join(lines) + ("\n" if lines else ""))
    print(f"wrote {len(lines)} keys -> {args.out}")


if __name__ == "__main__":
    main()
