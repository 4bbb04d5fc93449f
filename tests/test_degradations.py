"""Degradation zoo tests (random_degradations.py / matlab_like_resize.py)."""

import numpy as np
import pytest

from pnp_vcve_tpu.data.degradations import (
    DegradationsWithShuffle,
    anisotropic_gaussian_kernel2d,
    gaussian_kernel2d,
    jpeg_compression,
    matlab_like_resize,
    random_blur,
    random_noise,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def img(rng):
    return rng.random((24, 32, 3)).astype(np.float32)


def test_gaussian_kernels_normalized():
    k = gaussian_kernel2d(7, 1.5)
    assert k.shape == (7, 7) and abs(k.sum() - 1) < 1e-6
    ka = anisotropic_gaussian_kernel2d(9, 2.0, 0.5, 0.7)
    assert ka.shape == (9, 9) and abs(ka.sum() - 1) < 1e-6
    # anisotropy: rotated kernel is not symmetric under transpose
    assert np.abs(ka - ka.T).max() > 1e-6


def test_random_blur_smooths(img, rng):
    out = random_blur(img, rng, kernel_size=(9,), sigma=(2.0, 2.0))
    assert out.shape == img.shape
    assert out.var() < img.var()


def test_matlab_resize_scales(img):
    down = matlab_like_resize(img, 0.5)
    assert down.shape == (12, 16, 3)
    up = matlab_like_resize(img, 2.0)
    assert up.shape == (48, 64, 3)
    assert abs(down.mean() - img.mean()) < 0.01
    # matches the NIQE half-size resize on 2D inputs
    from pnp_vcve_tpu.metrics.niqe import matlab_resize_half

    g = img[..., 0]
    np.testing.assert_allclose(
        matlab_like_resize(g[..., None], 0.5)[..., 0],
        matlab_resize_half(g.astype(np.float64)),
        atol=1e-5,
    )


def test_random_noise(img, rng):
    g = random_noise(img, rng, "gaussian", sigma=(10.0, 10.0))
    assert g.shape == img.shape and 0 <= g.min() and g.max() <= 1
    assert np.abs(g - img).mean() > 1e-3
    p = random_noise(img, rng, "poisson", sigma=(2.0, 2.0))
    assert p.shape == img.shape and np.isfinite(p).all()


def test_jpeg_roundtrip(img):
    lo = jpeg_compression(img, 10)
    hi = jpeg_compression(img, 95)
    assert lo.shape == img.shape
    # lower quality -> larger reconstruction error
    assert np.abs(lo - img).mean() > np.abs(hi - img).mean()


def test_degradations_with_shuffle(img, rng):
    pipe = DegradationsWithShuffle(
        [
            lambda im, r: random_blur(im, r, kernel_size=(7,)),
            lambda im, r: random_noise(im, r, "gaussian", sigma=(5.0, 5.0)),
        ],
        shuffle=True,
    )
    out = pipe(img, rng)
    assert out.shape == img.shape and np.isfinite(out).all()
