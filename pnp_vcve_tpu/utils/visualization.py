"""Training visualization (reference mmedit/core/hooks/visualization.py:11-84
VisualizationHook: periodic image grids of inputs/outputs/targets)."""

from __future__ import annotations

from pathlib import Path
from typing import Mapping, Sequence

import numpy as np
from PIL import Image

from pnp_vcve_tpu.metrics import tensor2img

__all__ = ["save_visualization"]


def save_visualization(
    outputs: Mapping[str, np.ndarray],
    out_dir: str | Path,
    iteration: int,
    keys: Sequence[str] = ("lq", "output", "gt"),
    max_items: int = 4,
):
    """Write a horizontal (per key) x vertical (per sample) uint8 grid as
    ``<out_dir>/iter_<N>.png``. Arrays are (b, h, w, 3) or (b, t, h, w, 3)
    (the center frame is taken)."""
    rows = []
    n = min(max_items, min(np.asarray(outputs[k]).shape[0] for k in keys))
    for i in range(n):
        cols = []
        for k in keys:
            arr = np.asarray(outputs[k])[i]
            if arr.ndim == 4:  # (t, h, w, c) -> center frame
                arr = arr[arr.shape[0] // 2]
            cols.append(tensor2img(arr))
        h = min(c.shape[0] for c in cols)
        w = min(c.shape[1] for c in cols)
        rows.append(np.concatenate([c[:h, :w] for c in cols], axis=1))
    grid = np.concatenate(rows, axis=0)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / f"iter_{iteration}.png"
    Image.fromarray(grid).save(path)
    return path
