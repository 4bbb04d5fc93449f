#!/usr/bin/env python
"""REDS layout preprocessing: merge train+val and write the annotation file.

Reference behavior (tools/data/super-resolution/reds/
preprocess_reds_dataset.py:115-153):
- merge_train_val: REDS val clips 000..029 are renamed to 240..269 and
  moved beside the train clips, giving one 270-clip training pool (the
  REDS4 test clips 000/011/015/020 are excluded at dataset level, not
  here).
- generate_anno_file: one line per frame ``<clip>_<frame>.png (h,w,3)``
  (the SRAnnotationDataset / meta_info consumers).

lmdb packing is intentionally NOT ported: the lmdb python package is not
part of this environment and the folder datasets read PNG trees directly
(data/sisr_datasets.py SRLmdbDataset consumes pre-built .lmdb when the
package is present).
"""

from __future__ import annotations

import argparse
import os
import shutil


def merge_train_val(train_path: str, val_path: str, val_offset: int = 240):
    """Move val clips into the train tree renumbered by ``val_offset``."""
    moved = []
    for clip in sorted(os.listdir(val_path)):
        src = os.path.join(val_path, clip)
        if not os.path.isdir(src) or not clip.isdigit():
            continue
        new_name = f"{int(clip) + val_offset:03d}"
        dst = os.path.join(train_path, new_name)
        if os.path.exists(dst):
            raise FileExistsError(f"{dst} already exists")
        shutil.move(src, dst)
        moved.append((clip, new_name))
    return moved


def generate_anno_file(root_path: str, file_name: str = "meta_info_REDS_GT.txt"):
    """``<clip>_<frame>.png (h,w,3)`` per frame, sorted (reference
    generate_anno_file); image size read from the first decoded frame."""
    from PIL import Image

    lines = []
    for clip in sorted(os.listdir(root_path)):
        clip_dir = os.path.join(root_path, clip)
        if not os.path.isdir(clip_dir):
            continue
        for frame in sorted(os.listdir(clip_dir)):
            if not frame.lower().endswith(".png"):
                continue
            with Image.open(os.path.join(clip_dir, frame)) as im:
                w, h = im.size
            lines.append(f"{clip}_{frame} ({h},{w},3)")
    anno = os.path.join(os.path.dirname(root_path.rstrip("/")), file_name)
    with open(anno, "w") as f:
        f.write("\n".join(lines) + "\n")
    return anno, len(lines)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--train-path", required=True)
    ap.add_argument("--val-path", default=None,
                    help="if given, merge val clips into train (renumbered +240)")
    ap.add_argument("--make-anno", action="store_true")
    args = ap.parse_args()

    if args.val_path:
        moved = merge_train_val(args.train_path, args.val_path)
        print(f"merged {len(moved)} val clips (e.g. {moved[:3]})")
    if args.make_anno:
        anno, n = generate_anno_file(args.train_path)
        print(f"wrote {anno} ({n} frames)")


if __name__ == "__main__":
    main()
