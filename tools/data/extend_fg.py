#!/usr/bin/env python
"""Extend comp1k foregrounds beyond the alpha>0 region (FBA-style prep;
the analog of /root/reference/tools/data/matting/comp1k/extend_fg.py).

Matting losses composite fg over random backgrounds; near the alpha
boundary the original fg pixels are background-contaminated, so FBA-style
training re-estimates a clean foreground from (image, alpha). The
reference shells out to pymatting's ``estimate_foreground_ml``; here the
same multi-level solver is implemented natively
(pnp_vcve_tpu/data/foreground.py) — no pymatting, no pngfix subprocess
(PIL re-encodes cleanly).

    python tools/data/extend_fg.py ROOT [--nproc 4] [--out training_list_fba.json]

ROOT must contain ``fg/`` and ``alpha/`` with matching filenames (the
flat layout written by tools/data/preprocess_comp1k_dataset.py; the
reference's nested Adobe-licensed/Other split collapses to this).
Writes ``fg_extended/<name>.png`` plus a JSON list of
``{alpha_path, fg_path}`` records (the reference's *_list_fba.json).
"""

from __future__ import annotations

import argparse
import json
import sys
from multiprocessing import Pool
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def extend_one(paths):
    from PIL import Image

    from pnp_vcve_tpu.data.foreground import estimate_foreground_ml

    fg_path, alpha_path, out_path = paths
    img = np.asarray(Image.open(fg_path).convert("RGB"), np.float64) / 255.0
    alpha = np.asarray(Image.open(alpha_path).convert("L"), np.float64) / 255.0
    fg = estimate_foreground_ml(img, alpha)
    Image.fromarray((fg * 255 + 0.5).clip(0, 255).astype(np.uint8)).save(
        out_path
    )
    return dict(alpha_path=str(alpha_path), fg_path=str(out_path))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("root")
    p.add_argument("--nproc", type=int, default=4)
    p.add_argument("--out", default=None,
                   help="JSON list path (default ROOT/training_list_fba.json)")
    args = p.parse_args()

    root = Path(args.root)
    fgs = sorted((root / "fg").iterdir())
    if not fgs:
        raise SystemExit(f"no foregrounds under {root / 'fg'}")
    (root / "fg_extended").mkdir(exist_ok=True)
    jobs = []
    for f in fgs:
        alpha = root / "alpha" / f.name
        if not alpha.exists():
            raise FileNotFoundError(f"no alpha for {f.name}")
        jobs.append((f, alpha, root / "fg_extended" / (f.stem + ".png")))

    if args.nproc > 1:
        with Pool(args.nproc) as pool:
            infos = pool.map(extend_one, jobs)
    else:
        infos = [extend_one(j) for j in jobs]

    out = Path(args.out) if args.out else root / "training_list_fba.json"
    out.write_text(json.dumps(infos, indent=1))
    print(f"extended {len(infos)} foregrounds -> {root / 'fg_extended'}")


if __name__ == "__main__":
    main()
