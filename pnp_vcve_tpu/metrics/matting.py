"""Matting metrics: SAD, MSE, gradient error, connectivity error.

Reference surface: mmedit/core/evaluation/metrics.py:14-139 (``sad``,
``mse``, ``gradient_error``, ``connectivity``) with the Gaussian-derivative
filters of metric_utils.py:1-81: uint8 alphas/trimaps, the prediction
masked by the trimap (0 where trimap==0, 255 where trimap==255), errors
accumulated over the unknown (trimap==128) region. scipy replaces cv2
(filter2D BORDER_REPLICATE == convolve(mode='nearest') for symmetric
support; connected components via scipy.ndimage.label with 4-connectivity).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import convolve, label

__all__ = ["sad", "mse", "gradient_error", "connectivity"]


def _check(alpha, trimap, pred_alpha):
    if alpha.ndim != 2 or trimap.ndim != 2 or pred_alpha.ndim != 2:
        raise ValueError("alpha/trimap/pred_alpha must be 2D arrays")
    if not ((pred_alpha[trimap == 0] == 0).all()
            and (pred_alpha[trimap == 255] == 255).all()):
        raise ValueError("pred_alpha should be masked by trimap before evaluation")


def sad(alpha, trimap, pred_alpha) -> float:
    """Sum of absolute differences / 1000 (metrics.py:14-26)."""
    _check(alpha, trimap, pred_alpha)
    a = alpha.astype(np.float64) / 255
    p = pred_alpha.astype(np.float64) / 255
    return float(np.abs(p - a).sum() / 1000)


def mse(alpha, trimap, pred_alpha) -> float:
    """Mean squared error over the unknown region (metrics.py:29-44)."""
    _check(alpha, trimap, pred_alpha)
    a = alpha.astype(np.float64) / 255
    p = pred_alpha.astype(np.float64) / 255
    n = int((trimap == 128).sum())
    if n == 0:
        return 0.0
    return float((((p - a) ** 2) * (trimap == 128)).sum() / n)


def _gauss_filter(sigma: float, epsilon: float = 1e-2):
    """2D gaussian x derivative-of-gaussian filter, L2-normalized
    (metric_utils.py:32-59)."""
    half = np.ceil(sigma * np.sqrt(-2 * np.log(np.sqrt(2 * np.pi) * sigma * epsilon)))
    x = np.arange(-half, half + 1)
    g = np.exp(-(x**2) / (2 * sigma**2)) / (sigma * np.sqrt(2 * np.pi))
    dg = -x * g / sigma**2
    fx = np.outer(g, dg)  # filter_x[i, j] = gaussian(i) * dgaussian(j)
    fx = fx / np.sqrt((fx**2).sum())
    return fx, fx.T


def _minmax_norm(x):
    lo, hi = x.min(), x.max()
    if hi == lo:
        return np.zeros_like(x)
    return (x - lo) / (hi - lo)


def gradient_error(alpha, trimap, pred_alpha, sigma: float = 1.4) -> float:
    """Gaussian-gradient error over the unknown region / 1000
    (metrics.py:47-77)."""
    _check(alpha, trimap, pred_alpha)
    a = _minmax_norm(alpha.astype(np.float64))
    p = _minmax_norm(pred_alpha.astype(np.float64))
    fx, fy = _gauss_filter(sigma)

    def grad(img):
        gx = convolve(img, fx, mode="nearest")
        gy = convolve(img, fy, mode="nearest")
        return np.sqrt(gx**2 + gy**2).astype(np.float32)

    ga, gp = grad(a), grad(p)
    return float((((ga - gp) ** 2) * (trimap == 128)).sum() / 1000)


def connectivity(alpha, trimap, pred_alpha, step: float = 0.1) -> float:
    """Connectivity error / 1000 (metrics.py:80-139)."""
    _check(alpha, trimap, pred_alpha)
    a = alpha.astype(np.float32) / 255
    p = pred_alpha.astype(np.float32) / 255

    thresh_steps = np.arange(0, 1 + step, step)
    round_down = -np.ones_like(a)
    four_conn = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]])
    for i in range(1, len(thresh_steps)):
        joint = (a >= thresh_steps[i]) & (p >= thresh_steps[i])
        labels, n = label(joint, structure=four_conn)
        omega = np.zeros_like(a)
        if n:
            sizes = np.bincount(labels.ravel())[1:]
            omega[labels == (1 + int(np.argmax(sizes)))] = 1
        mask = (round_down == -1) & (omega == 0)
        round_down[mask] = thresh_steps[i - 1]
    round_down[round_down == -1] = 1

    da = a - round_down
    dp = p - round_down
    phi_a = 1 - da * (da >= 0.15)
    phi_p = 1 - dp * (dp >= 0.15)
    return float((np.abs(phi_a - phi_p) * (trimap == 128)).sum() / 1000)
