"""Mask generation for the inpainting family.

Reference surface: mmedit/core/mask.py:10-330 (``random_bbox``,
``bbox2mask``, ``brush_stroke_mask``, ``random_irregular_mask``,
``get_irregular_mask``). Host-side numpy (masks are input-pipeline data);
the brush/irregular strokes are drawn with PIL instead of cv2.

Masks are (h, w, 1) with 1 = hole.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "random_bbox",
    "bbox2mask",
    "brush_stroke_mask",
    "random_irregular_mask",
    "get_irregular_mask",
]


def random_bbox(
    img_shape: Sequence[int],
    max_bbox_shape,
    max_bbox_delta: int = 40,
    min_margin: int = 20,
    rng: Optional[np.random.Generator] = None,
) -> Tuple[int, int, int, int]:
    """Random (top, left, h, w) box (mask.py:10-75 semantics: a maximal box
    placed with margins, then shrunk by a random delta on each side)."""
    rng = rng or np.random.default_rng()
    img_h, img_w = img_shape[:2]
    if isinstance(max_bbox_shape, int):
        max_bbox_shape = (max_bbox_shape, max_bbox_shape)
    if isinstance(max_bbox_delta, int):
        max_bbox_delta = (max_bbox_delta, max_bbox_delta)
    if isinstance(min_margin, int):
        min_margin = (min_margin, min_margin)
    bh, bw = max_bbox_shape
    dh, dw = max_bbox_delta
    mh, mw = min_margin
    if bh > img_h or bw > img_w:
        raise ValueError("box larger than image")
    if dh // 2 * 2 >= bh or dw // 2 * 2 >= bw:
        raise ValueError("bbox_delta too large for bbox_shape")

    max_top = img_h - mh - bh
    max_left = img_w - mw - bw
    top = int(rng.integers(mh, max_top + 1))
    left = int(rng.integers(mw, max_left + 1))
    delta_top = int(rng.integers(0, dh // 2 + 1))
    delta_left = int(rng.integers(0, dw // 2 + 1))
    return (
        top + delta_top,
        left + delta_left,
        bh - delta_top * 2,
        bw - delta_left * 2,
    )


def bbox2mask(img_shape, bbox, dtype="uint8") -> np.ndarray:
    """(top, left, h, w) -> (h, w, 1) mask (mask.py:78-101)."""
    h, w = img_shape[:2]
    mask = np.zeros((h, w, 1), dtype=dtype)
    t, l, bh, bw = bbox
    mask[t : t + bh, l : l + bw] = 1
    return mask


def brush_stroke_mask(
    img_shape,
    num_vertices=(4, 12),
    mean_angle: float = 2 * math.pi / 5,
    angle_range: float = 2 * math.pi / 15,
    brush_width=(12, 40),
    max_loops: int = 4,
    dtype="uint8",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """DeepFill v2 free-form brush strokes (mask.py:104-207)."""
    from PIL import Image, ImageDraw

    rng = rng or np.random.default_rng()
    h, w = img_shape[:2]
    mask = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(mask)
    loops = int(rng.integers(1, max_loops + 1))
    avg_radius = math.sqrt(h * h + w * w) / 8
    for _ in range(loops):
        nv = (
            int(rng.integers(num_vertices[0], num_vertices[1] + 1))
            if isinstance(num_vertices, tuple)
            else num_vertices
        )
        angle_min = mean_angle - angle_range
        angle_max = mean_angle + angle_range
        angles = []
        for i in range(nv):
            a = rng.uniform(angle_min, angle_max)
            angles.append(2 * math.pi - a if i % 2 == 0 else a)
        vx = [int(rng.integers(0, w))]
        vy = [int(rng.integers(0, h))]
        for i in range(nv):
            r = np.clip(rng.normal(avg_radius, avg_radius // 2), 0, 2 * avg_radius)
            vx.append(int(np.clip(vx[-1] + r * math.cos(angles[i]), 0, w)))
            vy.append(int(np.clip(vy[-1] + r * math.sin(angles[i]), 0, h)))
        width = (
            int(rng.integers(brush_width[0], brush_width[1] + 1))
            if isinstance(brush_width, tuple)
            else brush_width
        )
        draw.line(list(zip(vx, vy)), fill=1, width=width)
        for x, y in zip(vx, vy):
            draw.ellipse(
                (x - width // 2, y - width // 2, x + width // 2, y + width // 2),
                fill=1,
            )
    out = np.asarray(mask, dtype=dtype).reshape(h, w, 1)
    return out


def random_irregular_mask(
    img_shape,
    num_vertices=(4, 8),
    max_angle: float = 4.0,
    length_range=(10, 100),
    brush_width=(10, 40),
    dtype="uint8",
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """Random polyline strokes (mask.py:210-294)."""
    from PIL import Image, ImageDraw

    rng = rng or np.random.default_rng()
    h, w = img_shape[:2]
    mask = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(mask)
    nv = (
        int(rng.integers(num_vertices[0], num_vertices[1] + 1))
        if isinstance(num_vertices, tuple)
        else num_vertices
    )
    x, y = int(rng.integers(0, w)), int(rng.integers(0, h))
    for _ in range(nv):
        angle = rng.uniform(0, max_angle)
        length = (
            int(rng.integers(length_range[0], length_range[1] + 1))
            if isinstance(length_range, tuple)
            else length_range
        )
        width = (
            int(rng.integers(brush_width[0], brush_width[1] + 1))
            if isinstance(brush_width, tuple)
            else brush_width
        )
        nx = int(np.clip(x + length * math.sin(angle), 0, w))
        ny = int(np.clip(y + length * math.cos(angle), 0, h))
        draw.line([(x, y), (nx, ny)], fill=1, width=width)
        x, y = nx, ny
    return np.asarray(mask, dtype=dtype).reshape(h, w, 1)


def get_irregular_mask(
    img_shape,
    area_ratio_range=(0.15, 0.5),
    max_tries: int = 50,
    rng: Optional[np.random.Generator] = None,
    **kwargs,
) -> np.ndarray:
    """Resample irregular masks until the hole area falls in the target
    ratio range (mask.py:297-330)."""
    rng = rng or np.random.default_rng()
    for _ in range(max_tries):
        mask = random_irregular_mask(img_shape, rng=rng, **kwargs)
        ratio = float(mask.mean())
        if area_ratio_range[0] <= ratio <= area_ratio_range[1]:
            return mask
    return mask
