#!/usr/bin/env python
"""Evaluate matting predictions on an Adobe Composition-1k-style layout.

Reference surface: tools/evaluate_comp1k.py:13-120 — per-sample SAD / MSE /
gradient-error / connectivity over (pred_alpha, gt_alpha, trimap) triples
matched by filename, averaged over the dataset (metrics from
pnp_vcve_tpu/metrics/matting.py, pinned to the reference formulas).

Usage:
  python tools/evaluate_comp1k.py PRED_DIR GT_DIR [--trimap-dir D] [-v]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
from PIL import Image

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnp_vcve_tpu.metrics.matting import (  # noqa: E402
    connectivity,
    gradient_error,
    mse,
    sad,
)


def _gray(path):
    with Image.open(path) as im:
        return np.asarray(im.convert("L"), np.uint8)


def evaluate_one(pred_path, gt_path, trimap_path):
    pred = _gray(pred_path)
    gt = _gray(gt_path)
    trimap = _gray(trimap_path) if trimap_path else np.ones_like(gt) * 128
    return (
        sad(gt, trimap, pred),
        mse(gt, trimap, pred),
        gradient_error(gt, trimap, pred),
        connectivity(gt, trimap, pred),
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("pred_root")
    ap.add_argument("gt_root")
    ap.add_argument("--trimap-dir", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    names = sorted(
        f for f in os.listdir(args.pred_root)
        if f.lower().endswith((".png", ".jpg"))
    )
    if not names:
        raise SystemExit(f"no predictions under {args.pred_root}")
    totals = np.zeros(4)
    n = 0
    for name in names:
        gt_path = os.path.join(args.gt_root, name)
        if not os.path.exists(gt_path):
            print(f"skip {name}: no ground truth")
            continue
        tri = (
            os.path.join(args.trimap_dir, name) if args.trimap_dir else None
        )
        res = evaluate_one(os.path.join(args.pred_root, name), gt_path, tri)
        totals += np.asarray(res)
        n += 1
        if args.verbose:
            print(
                f"{name}: SAD={res[0]:.4f} MSE={res[1]:.6f} "
                f"GRAD={res[2]:.4f} CONN={res[3]:.4f}"
            )
    if n == 0:
        raise SystemExit("no matched pairs")
    sad_m, mse_m, grad_m, conn_m = totals / n
    print(
        f"[{n} samples] SAD={sad_m:.4f} MSE={mse_m:.6f} "
        f"GRAD={grad_m:.4f} CONN={conn_m:.4f}"
    )


if __name__ == "__main__":
    main()
