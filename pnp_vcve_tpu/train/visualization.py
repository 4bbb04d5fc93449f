"""Training-time visualization: periodic result-grid dumps.

Reference surface: mmedit/core/hooks/visualization.py:11-84
(``VisualizationHook``): every ``interval`` iters, tile the requested
result tensors into one image grid (``nrow`` per row, ``padding`` px
between tiles, optional [-1,1] -> [0,1] rerange) and save
``iter_{N}.png`` under ``output_dir``. Disabled in the shipped PnP
configs (``visual_config=None``) but part of the runtime surface.

Pure numpy + PIL; rank-0 gating is the caller's job (tools/train.py only
installs the hook on process 0, like the reference's @master_only).
"""

from __future__ import annotations

import os
from typing import Mapping, Sequence

import numpy as np

__all__ = ["make_image_grid", "VisualizationHook"]


def make_image_grid(
    images: Sequence[np.ndarray],
    nrow: int = 1,
    padding: int = 4,
    rerange: bool = True,
) -> np.ndarray:
    """Tile (h, w, c) float images into one uint8 grid (torchvision
    save_image semantics: ``nrow`` images per grid ROW, zero padding)."""
    imgs = [np.asarray(im, np.float32) for im in images]
    if rerange:
        imgs = [(im + 1.0) / 2.0 for im in imgs]
    imgs = [np.clip(im, 0.0, 1.0) for im in imgs]
    h = max(im.shape[0] for im in imgs)
    w = max(im.shape[1] for im in imgs)
    c = imgs[0].shape[2]
    ncols = max(1, nrow)
    nrows = -(-len(imgs) // ncols)
    grid = np.zeros(
        (nrows * (h + padding) - padding, ncols * (w + padding) - padding, c),
        np.float32,
    )
    for i, im in enumerate(imgs):
        r, cidx = divmod(i, ncols)
        y = r * (h + padding)
        x = cidx * (w + padding)
        grid[y : y + im.shape[0], x : x + im.shape[1]] = im
    return (grid * 255.0 + 0.5).astype(np.uint8)


class VisualizationHook:
    """Callable hook: ``hook(step, results)`` with results a mapping of
    name -> (b, h, w, c) arrays; saves ``filename_tmpl.format(step)``."""

    def __init__(
        self,
        output_dir: str,
        res_name_list: Sequence[str],
        interval: int = -1,
        filename_tmpl: str = "iter_{}.png",
        rerange: bool = True,
        nrow: int = 1,
        padding: int = 4,
    ):
        self.output_dir = output_dir
        self.res_name_list = list(res_name_list)
        self.interval = interval
        self.filename_tmpl = filename_tmpl
        self.rerange = rerange
        self.nrow = nrow
        self.padding = padding
        os.makedirs(output_dir, exist_ok=True)

    def __call__(self, step: int, results: Mapping[str, np.ndarray]):
        if self.interval <= 0 or (step + 1) % self.interval != 0:
            return None
        tiles = []
        for name in self.res_name_list:
            if name not in results:
                continue
            arr = np.asarray(results[name])
            if arr.ndim == 5:  # (b, t, h, w, c): middle frame
                arr = arr[:, arr.shape[1] // 2]
            tiles.extend(arr[i] for i in range(min(arr.shape[0], self.nrow)))
        if not tiles:
            return None
        grid = make_image_grid(
            tiles, nrow=self.nrow, padding=self.padding, rerange=self.rerange
        )
        from PIL import Image

        path = os.path.join(self.output_dir, self.filename_tmpl.format(step + 1))
        Image.fromarray(grid.squeeze() if grid.shape[-1] == 1 else grid).save(path)
        return path
