"""Upstream degradation zoo (RealBasicVSR-style training augmentations).

Reference surface: mmedit/datasets/pipelines/random_degradations.py
(``RandomBlur``, ``RandomResize``, ``RandomNoise``,
``RandomJPEGCompression``, ``DegradationsWithShuffle``) and
matlab_like_resize.py (``MATLABLikeResize``). None are used by the PnP
configs (SURVEY §2.1 'unused' row); carried for capability parity with the
mmediting fork. ``RandomVideoCompression`` (ffmpeg/av-based) is NOT ported:
this environment ships no av/ffmpeg bindings, and the PnP pipeline consumes
pre-compressed folders instead.

All functions operate on float32 [0, 1] HWC numpy images (or lists of
them), mirroring the reference's convention.
"""

from __future__ import annotations

import io
from typing import List, Sequence

import numpy as np

from pnp_vcve_tpu.metrics.niqe import _resize_weights

__all__ = [
    "gaussian_kernel2d",
    "anisotropic_gaussian_kernel2d",
    "random_blur",
    "matlab_like_resize",
    "random_noise",
    "jpeg_compression",
    "DegradationsWithShuffle",
]


def gaussian_kernel2d(ksize: int, sigma: float) -> np.ndarray:
    ax = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def anisotropic_gaussian_kernel2d(
    ksize: int, sigma_x: float, sigma_y: float, theta: float
) -> np.ndarray:
    """Rotated anisotropic Gaussian (blur_kernels.py semantics)."""
    ax = np.arange(ksize, dtype=np.float64) - (ksize - 1) / 2
    xx, yy = np.meshgrid(ax, ax)
    c, s = np.cos(theta), np.sin(theta)
    xr = c * xx + s * yy
    yr = -s * xx + c * yy
    k = np.exp(-0.5 * ((xr / sigma_x) ** 2 + (yr / sigma_y) ** 2))
    return (k / k.sum()).astype(np.float32)


def _filter2d(img: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    from scipy.ndimage import convolve

    out = np.empty_like(img)
    for ch in range(img.shape[-1]):
        out[..., ch] = convolve(img[..., ch], kernel, mode="nearest")
    return out


def random_blur(
    img: np.ndarray,
    rng: np.random.Generator,
    kernel_size: Sequence[int] = (7, 9, 11),
    sigma: Sequence[float] = (0.2, 3.0),
    aniso_prob: float = 0.0,
) -> np.ndarray:
    """Gaussian (optionally anisotropic) blur with random parameters
    (random_degradations.py:20-137, the isotropic/aniso gaussian modes)."""
    ks = int(rng.choice(list(kernel_size)))
    if rng.random() < aniso_prob:
        sx = float(rng.uniform(*sigma))
        sy = float(rng.uniform(*sigma))
        theta = float(rng.uniform(0, np.pi))
        k = anisotropic_gaussian_kernel2d(ks, sx, sy, theta)
    else:
        k = gaussian_kernel2d(ks, float(rng.uniform(*sigma)))
    return _filter2d(img, k)


def matlab_like_resize(img: np.ndarray, scale: float) -> np.ndarray:
    """MATLAB ``imresize(img, scale, 'bicubic')`` with antialiasing
    (matlab_like_resize.py:169-275)."""
    out = img.astype(np.float64)
    for axis in (0, 1):
        w, inds = _resize_weights(out.shape[axis], scale)
        moved = np.moveaxis(out, axis, 0)
        res = np.einsum("ok,ok...->o...", w, moved[inds])
        out = np.moveaxis(res, 0, axis)
    return out.astype(img.dtype)


def random_noise(
    img: np.ndarray,
    rng: np.random.Generator,
    noise_type: str = "gaussian",
    sigma: Sequence[float] = (1.0, 30.0),
    gray_prob: float = 0.0,
) -> np.ndarray:
    """Gaussian or Poisson noise on a [0,1] image
    (random_degradations.py:245-347)."""
    if noise_type == "gaussian":
        s = float(rng.uniform(*sigma)) / 255.0
        if rng.random() < gray_prob:
            n = rng.standard_normal(img.shape[:2] + (1,)) * s
        else:
            n = rng.standard_normal(img.shape) * s
        return np.clip(img + n, 0, 1).astype(img.dtype)
    if noise_type == "poisson":
        scale = float(rng.uniform(*sigma))
        vals = 10 ** scale if scale < 4 else scale  # reference uses 10**scale-ish ranges
        noisy = rng.poisson(np.clip(img, 0, 1) * vals) / vals
        return np.clip(noisy, 0, 1).astype(img.dtype)
    raise ValueError(f"unknown noise_type {noise_type!r}")


def jpeg_compression(img: np.ndarray, quality: int) -> np.ndarray:
    """Round-trip through a real JPEG encoder at the given quality
    (random_degradations.py:350-405; PIL instead of cv2.imencode)."""
    from PIL import Image

    u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="JPEG", quality=int(quality))
    buf.seek(0)
    out = np.asarray(Image.open(buf).convert("RGB"), np.float32) / 255.0
    return out.astype(img.dtype)


try:  # optional: real codec round-trips need PyAV (same gate as reference)
    import av  # type: ignore

    _HAS_AV = True
except ImportError:  # pragma: no cover - env-dependent
    _HAS_AV = False


def video_compression(
    imgs: Sequence[np.ndarray], codec: str, bitrate: int
) -> List[np.ndarray]:
    """Round-trip a clip through a real video encoder at the given bitrate
    (random_degradations.py:426-458). Frames are float in [0, 1], HWC RGB.

    Requires PyAV; callers should gate on :data:`has_av` (the reference
    asserts the same way, random_degradations.py:420)."""
    if not _HAS_AV:
        raise RuntimeError(
            "video_compression needs PyAV ('av'), which is not installed"
        )
    buf = io.BytesIO()
    with av.open(buf, "w", "mp4") as container:
        stream = container.add_stream(codec, rate=1)
        stream.height = imgs[0].shape[0]
        stream.width = imgs[0].shape[1]
        stream.pix_fmt = "yuv420p"
        stream.bit_rate = int(bitrate)
        for img in imgs:
            u8 = np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)
            frame = av.VideoFrame.from_ndarray(u8, format="rgb24")
            frame.pict_type = "NONE"
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():  # flush
            container.mux(packet)
    out: List[np.ndarray] = []
    with av.open(buf, "r", "mp4") as container:
        if container.streams.video:
            for frame in container.decode(video=0):
                out.append(
                    frame.to_rgb().to_ndarray().astype(np.float32) / 255.0
                )
    return out


class RandomVideoCompression:
    """Random codec + bitrate clip degradation
    (random_degradations.py:408-472). ``params`` carries ``codec`` /
    ``codec_prob`` / ``bitrate`` (lo, hi) / optional ``prob``; operates on a
    list of float HWC frames. Gated on PyAV exactly like the reference —
    in environments without ``av`` construction raises, and callers (the
    degradation registry) surface that at config-build time rather than
    mid-epoch."""

    def __init__(self, params: dict):
        if not _HAS_AV:
            raise RuntimeError("RandomVideoCompression needs PyAV ('av')")
        self.params = dict(params)

    def __call__(
        self, imgs: Sequence[np.ndarray], rng: np.random.Generator
    ) -> List[np.ndarray]:
        if rng.uniform() > self.params.get("prob", 1):
            return list(imgs)
        codecs = self.params["codec"]
        probs = self.params.get(
            "codec_prob", [1.0 / len(codecs)] * len(codecs)
        )
        codec = codecs[rng.choice(len(codecs), p=np.asarray(probs))]
        lo, hi = self.params["bitrate"]
        return video_compression(imgs, codec, int(rng.integers(lo, hi + 1)))


has_av = _HAS_AV


class DegradationsWithShuffle:
    """Apply a list of degradation callables in (optionally shuffled) order
    (random_degradations.py:485-545)."""

    def __init__(self, degradations: List, shuffle: bool = True):
        self.degradations = list(degradations)
        self.shuffle = shuffle

    def __call__(self, img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        order = list(range(len(self.degradations)))
        if self.shuffle:
            rng.shuffle(order)
        for i in order:
            img = self.degradations[i](img, rng)
        return img
