#!/usr/bin/env python
"""Prepare an Adobe Composition-1k style matting dataset (the analog of
reference tools/data/matting/comp1k/preprocess_comp1k_dataset.py):
composite ``merged = alpha * fg + (1 - alpha) * bg`` for every
(alpha, fg, bg) triple and write the JSON annotation consumed by
AdobeComp1kDataset (comp1k_dataset.py layout).

    python tools/data/preprocess_comp1k_dataset.py ROOT \\
        [--composite] [--out ann.json]

ROOT must contain ``alpha/``, ``fg/``, ``bg/`` with matching filenames
(bg may be a larger pool: the i-th fg pairs with the i-th bg, cycled).
"""

import argparse
import json
from pathlib import Path


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root")
    p.add_argument("--out", default=None, help="annotation path (default ROOT/ann.json)")
    p.add_argument(
        "--composite", action="store_true",
        help="also write merged/ composites (offline mode); without it the "
        "annotation references (alpha, fg, bg) for online compositing",
    )
    return p.parse_args()


def main():
    args = parse_args()
    root = Path(args.root)
    alphas = sorted((root / "alpha").iterdir())
    fgs = sorted((root / "fg").iterdir())
    bgs = sorted((root / "bg").iterdir())
    if not (alphas and fgs and bgs):
        raise SystemExit("need non-empty alpha/, fg/, bg/ under ROOT")

    infos = []
    if args.composite:
        import numpy as np
        from PIL import Image

        (root / "merged").mkdir(exist_ok=True)
    for i, (a, f) in enumerate(zip(alphas, fgs)):
        b = bgs[i % len(bgs)]
        info = {
            "alpha": str(a.relative_to(root)),
            "fg": str(f.relative_to(root)),
            "bg": str(b.relative_to(root)),
        }
        if args.composite:
            import numpy as np
            from PIL import Image

            al = np.asarray(Image.open(a).convert("L"), np.float32)[..., None] / 255
            fg = np.asarray(Image.open(f).convert("RGB"), np.float32)
            bg = Image.open(b).convert("RGB").resize(
                (fg.shape[1], fg.shape[0]), Image.BICUBIC
            )
            merged = al * fg + (1 - al) * np.asarray(bg, np.float32)
            out = root / "merged" / a.name
            Image.fromarray(merged.round().astype("uint8")).save(out)
            info["merged"] = str(out.relative_to(root))
        infos.append(info)

    out = Path(args.out) if args.out else root / "ann.json"
    out.write_text(json.dumps(infos, indent=1))
    print(f"wrote {len(infos)} entries -> {out}")


if __name__ == "__main__":
    main()
