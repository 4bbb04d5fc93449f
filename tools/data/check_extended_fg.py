#!/usr/bin/env python
"""Report the alpha-weighted difference between original and extended
foregrounds (the analog of
/root/reference/tools/data/matting/comp1k/check_extended_fg.py): large
values flag fg-extension failures worth eyeballing.

    python tools/data/check_extended_fg.py ROOT

ROOT holds ``fg/``, ``alpha/``, ``fg_extended/`` (from extend_fg.py).
Prints ``max,avg,img`` CSV lines.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def check_one(root: Path, name: str):
    from PIL import Image

    ld = lambda p, m: np.asarray(Image.open(p).convert(m), np.float32)
    alpha = ld(root / "alpha" / name, "L")[..., None] / 255.0
    fg = ld(root / "fg" / name, "RGB")
    candidates = list((root / "fg_extended").glob(Path(name).stem + ".*"))
    ext = ld(candidates[0], "RGB")
    diff = np.abs((fg - ext) * alpha)
    return float(diff.max()), float(diff.mean())


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root")
    args = p.parse_args()
    root = Path(args.root)
    print("max,avg,img")
    for f in sorted((root / "fg").iterdir()):
        mx, avg = check_one(root, f.name)
        print(f'{mx},{avg},"{f.stem}"', flush=True)


if __name__ == "__main__":
    main()
