"""Matting (Adobe Composition-1k) and image-inpainting data sources.

Reference surfaces:
- AdobeComp1kDataset (mmedit/datasets/comp1k_dataset.py:10-85): a JSON
  annotation list of {alpha, fg, bg[, merged]} paths; the merged image is
  composited ONLINE as ``alpha * fg + (1 - alpha) * bg`` when absent.
- Matting pipeline (mmedit/datasets/pipelines/matting_aug.py
  GenerateTrimap + CropAroundUnknown + Flip): trimap from the alpha by
  random-radius erode/dilate, crops biased to contain unknown pixels.
- ImgInpaintingDataset (mmedit/datasets/img_inpainting_dataset.py:9-40):
  a line-list annotation of image paths; masks are synthesized per sample
  by LoadMask (pipelines/loading.py:1128-1353) in bbox / irregular / ff
  modes (mask utilities: mmedit/core/mask.py == utils/mask.py here).

Functional redesign (no Compose objects): each dataset exposes
``sample(rng)`` for training and iterates deterministic full samples for
testing, matching the other sources in data/.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .datasets import _load_png

__all__ = ["AdobeComp1kDataset", "ImgInpaintingDataset", "generate_trimap"]


def generate_trimap(alpha: np.ndarray, rng: np.random.Generator,
                    kernel_range=(1, 30)) -> np.ndarray:
    """uint8 trimap {0, 128, 255} by random-radius erosion/dilation
    (reference matting_aug.py GenerateTrimap)."""
    import cv2

    k_erode = int(rng.integers(*kernel_range))
    k_dilate = int(rng.integers(*kernel_range))
    e_kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k_erode, k_erode))
    d_kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (k_dilate, k_dilate))
    a8 = (alpha * 255).astype(np.uint8)
    eroded = cv2.erode(a8, e_kernel)
    dilated = cv2.dilate(a8, d_kernel)
    trimap = np.zeros_like(a8)
    trimap[eroded >= 255] = 255
    trimap[(dilated > 0) & (eroded < 255)] = 128
    return trimap


@dataclass
class AdobeComp1kDataset:
    """Composition-1k style matting source."""

    ann_file: str
    data_prefix: str = ""
    crop_size: int = 320
    test_mode: bool = False

    def __post_init__(self):
        with open(self.ann_file) as f:
            self.data_infos = json.load(f)

    def __len__(self):
        return len(self.data_infos)

    def _load(self, info):
        paths = {k: os.path.join(self.data_prefix, v) for k, v in info.items()}
        alpha = _load_png(paths["alpha"]).astype(np.float32) / 255.0
        if alpha.ndim == 3:
            alpha = alpha[..., 0]
        fg = _load_png(paths["fg"]).astype(np.float32) / 255.0
        bg = _load_png(paths["bg"]).astype(np.float32) / 255.0
        if bg.shape[:2] != fg.shape[:2]:  # reference resizes bg to fg
            import cv2

            bg = cv2.resize(bg, (fg.shape[1], fg.shape[0]),
                            interpolation=cv2.INTER_CUBIC)
        if "merged" in paths:
            merged = _load_png(paths["merged"]).astype(np.float32) / 255.0
        else:
            merged = alpha[..., None] * fg + (1.0 - alpha[..., None]) * bg
        return merged, alpha, fg, bg

    def sample(self, rng: np.random.Generator) -> dict:
        info = self.data_infos[int(rng.integers(0, len(self.data_infos)))]
        merged, alpha, fg, bg = self._load(info)
        trimap = generate_trimap(alpha, rng)

        # crop around unknown (reference CropAroundUnknown): try to land
        # the crop on trimap==128 pixels
        cs = min(self.crop_size, *alpha.shape[:2])
        h, w = alpha.shape[:2]
        top = left = 0
        unknown = np.argwhere(trimap == 128)
        for _ in range(10):
            t = int(rng.integers(0, h - cs + 1))
            l = int(rng.integers(0, w - cs + 1))
            if len(unknown) == 0 or (
                (trimap[t : t + cs, l : l + cs] == 128).any()
            ):
                top, left = t, l
                break
        sl = np.s_[top : top + cs, left : left + cs]
        merged, alpha, fg, bg, trimap = (
            merged[sl], alpha[sl], fg[sl], bg[sl], trimap[sl]
        )
        if not self.test_mode and rng.random() < 0.5:
            merged, alpha, fg, bg, trimap = (
                a[:, ::-1].copy() for a in (merged, alpha, fg, bg, trimap)
            )

        onehot = np.stack(
            [trimap == 0, trimap == 128, trimap == 255], axis=-1
        ).astype(np.float32)
        return {
            "merged": merged.astype(np.float32),
            "alpha": alpha[..., None].astype(np.float32),
            "fg": fg.astype(np.float32),
            "bg": bg.astype(np.float32),
            "trimap": (trimap.astype(np.float32) / 255.0)[..., None],
            "trimap_onehot": onehot,
        }

    def load_item(self, idx: int) -> dict:
        merged, alpha, fg, bg = self._load(self.data_infos[idx])
        trimap = generate_trimap(alpha, np.random.default_rng(idx))
        onehot = np.stack(
            [trimap == 0, trimap == 128, trimap == 255], axis=-1
        ).astype(np.float32)
        return {
            "merged": merged.astype(np.float32),
            "alpha": alpha[..., None].astype(np.float32),
            "fg": fg.astype(np.float32),
            "bg": bg.astype(np.float32),
            "trimap": (trimap.astype(np.float32) / 255.0)[..., None],
            "trimap_onehot": onehot,
        }

    def __iter__(self):
        for i in range(len(self)):
            yield self.load_item(i)


@dataclass
class ImgInpaintingDataset:
    """Line-list image source with synthesized masks."""

    ann_file: str
    data_prefix: str = ""
    crop_size: int = 256
    mask_mode: str = "irregular"  # 'bbox' | 'irregular' | 'ff'
    mask_config: Optional[dict] = None
    test_mode: bool = False

    def __post_init__(self):
        with open(self.ann_file) as f:
            self.paths = [
                os.path.join(self.data_prefix, line.strip())
                for line in f
                if line.strip()
            ]

    def __len__(self):
        return len(self.paths)

    def _make_mask(self, rng: np.random.Generator) -> np.ndarray:
        from pnp_vcve_tpu.utils.mask import (
            bbox2mask,
            brush_stroke_mask,
            random_bbox,
            random_irregular_mask,
        )

        shape = (self.crop_size, self.crop_size)
        cfg = dict(self.mask_config or {})
        cfg.pop("img_shape", None)
        if self.mask_mode == "bbox":
            bbox = random_bbox(
                shape,
                cfg.pop("max_bbox_shape", 128),
                max_bbox_delta=cfg.pop("max_bbox_delta", 40),
                min_margin=cfg.pop("min_margin", 20),
                rng=rng,
            )
            mask = bbox2mask(shape, bbox)
        elif self.mask_mode == "irregular":
            mask = random_irregular_mask(shape, rng=rng, **cfg)
        elif self.mask_mode == "ff":
            mask = brush_stroke_mask(shape, rng=rng, **cfg)
        else:
            raise ValueError(f"unknown mask_mode {self.mask_mode}")
        mask = mask.astype(np.float32)
        return mask if mask.ndim == 3 else mask[..., None]

    def _load_crop(self, path, rng: Optional[np.random.Generator]):
        img = _load_png(path).astype(np.float32) / 127.5 - 1.0  # [-1, 1]
        h, w = img.shape[:2]
        cs = self.crop_size
        if h < cs or w < cs:
            import cv2

            scale = max(cs / h, cs / w)
            img = cv2.resize(img, (max(cs, int(w * scale)), max(cs, int(h * scale))))
            h, w = img.shape[:2]
        if rng is None:
            top, left = (h - cs) // 2, (w - cs) // 2
        else:
            top = int(rng.integers(0, h - cs + 1))
            left = int(rng.integers(0, w - cs + 1))
        return img[top : top + cs, left : left + cs]

    def _pack(self, img, mask):
        return {
            "gt_img": img,
            "mask": mask,
            "masked_img": img * (1.0 - mask),
        }

    def sample(self, rng: np.random.Generator) -> dict:
        path = self.paths[int(rng.integers(0, len(self.paths)))]
        img = self._load_crop(path, rng)
        if rng.random() < 0.5:
            img = img[:, ::-1].copy()
        return self._pack(img, self._make_mask(rng))

    def load_item(self, idx: int) -> dict:
        img = self._load_crop(self.paths[idx], None)
        return self._pack(img, self._make_mask(np.random.default_rng(idx)))

    def __iter__(self):
        for i in range(len(self)):
            yield self.load_item(i)
