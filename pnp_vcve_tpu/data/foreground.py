"""Multi-level foreground estimation for matting data prep.

Native replacement for the ``pymatting.estimate_foreground_ml`` dependency
of the reference's fg-extension tool
(/root/reference/tools/data/matting/comp1k/extend_fg.py:11,70): the
coarse-to-fine alternating solver of Germer et al., "Fast Multi-Level
Foreground Estimation" (2020). Given image I and alpha a, jointly solve
per pixel for (F, B) minimizing

    (a F + (1 - a) B - I)^2
      + sum_j w_ij [ (F_i - F_j)^2 + (B_i - B_j)^2 ],
    w_ij = regularization + gradient_weight * |a_i - a_j|

over the 4-neighborhood, by exact 2x2 solves per pixel, iterated
coarse-to-fine (each level doubles resolution and upsamples the previous
solution as the initializer). Pure numpy; everything vectorized over the
image plane.
"""

from __future__ import annotations

import numpy as np

__all__ = ["estimate_foreground_ml"]


def _resize_nearest(x: np.ndarray, h: int, w: int) -> np.ndarray:
    hs = (np.arange(h) * (x.shape[0] / h)).astype(np.int64)
    ws = (np.arange(w) * (x.shape[1] / w)).astype(np.int64)
    return x[hs][:, ws]


def _shift(x: np.ndarray, dy: int, dx: int) -> np.ndarray:
    """Neighbor view with edge replication (out-of-image neighbor = self)."""
    p = np.pad(x, [(1, 1), (1, 1)] + [(0, 0)] * (x.ndim - 2), mode="edge")
    return p[1 + dy : 1 + dy + x.shape[0], 1 + dx : 1 + dx + x.shape[1]]


def estimate_foreground_ml(
    image: np.ndarray,
    alpha: np.ndarray,
    regularization: float = 1e-5,
    n_small_iterations: int = 10,
    n_big_iterations: int = 2,
    small_size: int = 32,
    gradient_weight: float = 1.0,
    return_background: bool = False,
):
    """Estimate the foreground of ``image`` given ``alpha``.

    Args:
      image: (h, w, 3) float in [0, 1].
      alpha: (h, w) float in [0, 1].
    Returns:
      (h, w, 3) foreground, or ``(foreground, background)`` when
      ``return_background``.
    """
    if image.ndim != 3 or alpha.ndim != 2:
        raise ValueError(
            f"need (h,w,3) image and (h,w) alpha, got {image.shape} / "
            f"{alpha.shape}"
        )
    h0, w0 = alpha.shape
    n_levels = max(1, int(np.ceil(np.log2(max(h0, w0)))))

    F = np.zeros((1, 1, 3), np.float64)
    B = np.zeros((1, 1, 3), np.float64)
    dirs = ((0, 1), (0, -1), (1, 0), (-1, 0))

    for lev in range(1, n_levels + 1):
        scale = 2.0 ** (lev - n_levels)
        h = max(2, int(np.ceil(h0 * scale)))
        w = max(2, int(np.ceil(w0 * scale)))
        img = _resize_nearest(image.astype(np.float64), h, w)
        a = _resize_nearest(alpha.astype(np.float64), h, w)[..., None]
        F = _resize_nearest(F, h, w)
        B = _resize_nearest(B, h, w)

        n_iter = (
            n_big_iterations if max(h, w) > small_size else n_small_iterations
        )
        b_ = 1.0 - a
        # per-neighbor smoothness weights depend only on alpha: hoist
        ws = [
            regularization
            + gradient_weight * np.abs(a - _shift(a, dy, dx))
            for dy, dx in dirs
        ]
        wsum = sum(ws)
        # 2x2 normal matrix per pixel: [[a^2+s, ab], [ab, b^2+s]]
        m00 = a * a + wsum
        m01 = a * b_
        m11 = b_ * b_ + wsum
        det = m00 * m11 - m01 * m01
        for _ in range(n_iter):
            rf = a * img
            rb = b_ * img
            for (dy, dx), wgt in zip(dirs, ws):
                rf = rf + wgt * _shift(F, dy, dx)
                rb = rb + wgt * _shift(B, dy, dx)
            F = np.clip((m11 * rf - m01 * rb) / det, 0.0, 1.0)
            B = np.clip((m00 * rb - m01 * rf) / det, 0.0, 1.0)

    F = F[:h0, :w0].astype(image.dtype)
    if return_background:
        return F, B[:h0, :w0].astype(image.dtype)
    return F
