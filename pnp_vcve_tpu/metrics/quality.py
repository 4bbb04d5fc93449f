"""Quality metrics with bit-parity to the reference evaluation protocol.

The reference computes PSNR/SSIM on uint8 images produced by clamping a
float tensor to [0, 1], scaling by 255 and *rounding* (not truncating)
(reference: mmedit/core/misc.py:9-74 ``tensor2img``), then

- PSNR over all channels jointly, ``20*log10(255/sqrt(mse))``
  (reference: mmedit/core/evaluation/metrics.py:170-215),
- SSIM per channel with an 11x11 Gaussian (sigma=1.5) window, the filtered
  maps cropped by 5 pixels on every side before use, constants
  C1=(0.01*255)^2, C2=(0.03*255)^2, and the channel means averaged
  (reference: mmedit/core/evaluation/metrics.py:266-355).

Everything here is plain numpy — metrics run on the host over final frames;
putting them on the TPU would serialize eval on device round-trips for no
gain. A 5-pixel crop after an 11x11 filter means only border-independent
("valid") pixels survive, so the filter is implemented as a valid-mode
separable correlation and the reference's cv2 border mode is irrelevant.
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["psnr", "ssim", "mae", "tensor2img", "img_as_uint8"]


def img_as_uint8(img: np.ndarray) -> np.ndarray:
    """Clamp float [0,1] image to uint8 with round-half-away semantics.

    Matches the uint8 quantization the reference applies before metrics
    (mmedit/core/misc.py:69-71: ``(img_np * 255.0).round()`` then astype).
    numpy's ``round`` is banker's rounding, same as torch's — parity holds
    because the reference also goes through numpy here.
    """
    img = np.asarray(img, dtype=np.float32)
    img = np.clip(img, 0.0, 1.0)
    return (img * 255.0).round().astype(np.uint8)


def tensor2img(tensor, out_type=np.uint8, min_max=(0, 1)) -> np.ndarray:
    """Convert an NHWC / HWC float array to an image array.

    Equivalent of the reference ``tensor2img`` (mmedit/core/misc.py:9-74)
    for our NHWC layout: clamps to ``min_max``, rescales to [0,1]; for
    ``np.uint8`` multiplies by 255 and rounds. Unlike the reference we keep
    RGB channel order (the reference flips to BGR for cv2.imwrite; PSNR and
    SSIM are channel-order invariant, and our PNG writer takes RGB).
    """
    arr = np.asarray(tensor, dtype=np.float32)
    while arr.ndim > 3 and arr.shape[0] == 1:
        arr = arr[0]
    arr = np.clip(arr, min_max[0], min_max[1])
    arr = (arr - min_max[0]) / (min_max[1] - min_max[0])
    if out_type == np.uint8:
        arr = (arr * 255.0).round()
    return arr.astype(out_type)


def _to_hwc(img: np.ndarray, input_order: str) -> np.ndarray:
    if input_order not in ("HWC", "CHW"):
        raise ValueError(f"Wrong input_order {input_order!r}; use 'HWC' or 'CHW'")
    img = np.asarray(img)
    if img.ndim == 2:
        return img[..., None]
    if input_order == "CHW":
        return img.transpose(1, 2, 0)
    return img


def psnr(img1, img2, crop_border: int = 0, input_order: str = "HWC") -> float:
    """PSNR between two images in [0, 255].

    Protocol parity: mmedit/core/evaluation/metrics.py:170-215 (fp32 MSE over
    all channels, ``20*log10(255/sqrt(mse))``, inf on identical images).
    """
    img1 = _to_hwc(img1, input_order).astype(np.float32)
    img2 = _to_hwc(img2, input_order).astype(np.float32)
    if img1.shape != img2.shape:
        raise ValueError(f"Image shapes differ: {img1.shape} vs {img2.shape}")
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * math.log10(255.0 / math.sqrt(mse)))


def mae(img1, img2, crop_border: int = 0, input_order: str = "HWC") -> float:
    """Mean absolute error on [0,1]-normalized images
    (protocol: mmedit/core/evaluation/metrics.py:218-263)."""
    img1 = _to_hwc(img1, input_order).astype(np.float32) / 255.0
    img2 = _to_hwc(img2, input_order).astype(np.float32) / 255.0
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    return float(np.mean(np.abs(img1 - img2)))


def _gaussian_kernel_1d(ksize: int = 11, sigma: float = 1.5) -> np.ndarray:
    """cv2.getGaussianKernel-equivalent: exp(-(i-c)^2 / (2 sigma^2)), L1-normalized."""
    half = (ksize - 1) / 2.0
    x = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(x**2) / (2.0 * sigma**2))
    return k / k.sum()


_SSIM_K1D = _gaussian_kernel_1d(11, 1.5)


def _filter_valid(img: np.ndarray) -> np.ndarray:
    """Separable 11x11 Gaussian correlation, valid region only.

    Equals ``cv2.filter2D(img, -1, window)[5:-5, 5:-5]`` for any cv2 border
    mode, since the 5-pixel crop removes every border-dependent output.
    """
    # rows then cols; use float64 like the reference
    k = _SSIM_K1D
    n = len(k)
    h, w = img.shape
    # correlate along axis 0 (valid)
    out = np.zeros((h - n + 1, w), dtype=np.float64)
    for i, kv in enumerate(k):
        out += kv * img[i : i + h - n + 1, :]
    out2 = np.zeros((h - n + 1, w - n + 1), dtype=np.float64)
    for j, kv in enumerate(k):
        out2 += kv * out[:, j : j + w - n + 1]
    return out2


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    """Single-channel SSIM (reference: mmedit/core/evaluation/metrics.py:266-298)."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)

    mu1 = _filter_valid(img1)
    mu2 = _filter_valid(img2)
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _filter_valid(img1**2) - mu1_sq
    sigma2_sq = _filter_valid(img2**2) - mu2_sq
    sigma12 = _filter_valid(img1 * img2) - mu1_mu2

    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


def ssim(img1, img2, crop_border: int = 0, input_order: str = "HWC") -> float:
    """SSIM between two images in [0, 255]; per-channel then averaged.

    Protocol parity: mmedit/core/evaluation/metrics.py:301-355.
    """
    img1 = _to_hwc(img1, input_order)
    img2 = _to_hwc(img2, input_order)
    if img1.shape != img2.shape:
        raise ValueError(f"Image shapes differ: {img1.shape} vs {img2.shape}")
    if crop_border != 0:
        img1 = img1[crop_border:-crop_border, crop_border:-crop_border]
        img2 = img2[crop_border:-crop_border, crop_border:-crop_border]
    vals = [_ssim_single(img1[..., i], img2[..., i]) for i in range(img1.shape[2])]
    return float(np.mean(vals))


def l1_evaluation(img1, img2, crop_border: int = 0, input_order: str = "HWC") -> float:
    """L1 between prediction and gt on [0,1]-normalized images — the
    reference's ``L1Evaluation`` metric (mmedit/core/evaluation/
    metrics.py:358-378, unweighted 'mean' reduction path)."""
    return mae(img1, img2, crop_border=crop_border, input_order=input_order)
