"""Metric parity tests.

Oracles: cv2 (getGaussianKernel/filter2D — the exact primitives the reference
metrics are built on) and closed-form PSNR. We never import reference code.
"""

import numpy as np
import pytest

from pnp_vcve_tpu.metrics import psnr, ssim, mae, tensor2img, img_as_uint8

cv2 = pytest.importorskip("cv2")


def _ssim_cv2_oracle(img1, img2):
    """Channelwise SSIM using cv2 primitives, mirroring the published protocol."""
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    kernel = cv2.getGaussianKernel(11, 1.5)
    window = np.outer(kernel, kernel.transpose())
    mu1 = cv2.filter2D(img1, -1, window)[5:-5, 5:-5]
    mu2 = cv2.filter2D(img2, -1, window)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = cv2.filter2D(img1**2, -1, window)[5:-5, 5:-5] - mu1_sq
    sigma2_sq = cv2.filter2D(img2**2, -1, window)[5:-5, 5:-5] - mu2_sq
    sigma12 = cv2.filter2D(img1 * img2, -1, window)[5:-5, 5:-5] - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return ssim_map.mean()


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_psnr_identical_is_inf(rng):
    img = rng.integers(0, 256, (32, 40, 3)).astype(np.uint8)
    assert psnr(img, img) == float("inf")


def test_psnr_closed_form(rng):
    img1 = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    img2 = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    mse = np.mean((img1.astype(np.float64) - img2.astype(np.float64)) ** 2)
    expected = 20 * np.log10(255 / np.sqrt(mse))
    assert psnr(img1, img2) == pytest.approx(expected, rel=1e-6)


def test_psnr_crop_border(rng):
    img1 = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    img2 = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    inner = psnr(img1[4:-4, 4:-4], img2[4:-4, 4:-4])
    assert psnr(img1, img2, crop_border=4) == pytest.approx(inner, rel=1e-9)


def test_psnr_chw_order(rng):
    img1 = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    img2 = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    a = psnr(img1, img2)
    b = psnr(img1.transpose(2, 0, 1), img2.transpose(2, 0, 1), input_order="CHW")
    assert a == pytest.approx(b, rel=1e-9)


def test_gaussian_kernel_matches_cv2():
    from pnp_vcve_tpu.metrics.quality import _gaussian_kernel_1d

    ours = _gaussian_kernel_1d(11, 1.5)
    theirs = cv2.getGaussianKernel(11, 1.5).ravel()
    np.testing.assert_allclose(ours, theirs, atol=1e-12)


def test_ssim_matches_cv2_oracle(rng):
    img1 = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    # correlated image: quality metric in a realistic regime
    noise = rng.normal(0, 12, img1.shape)
    img2 = np.clip(img1.astype(np.float64) + noise, 0, 255).astype(np.uint8)
    expected = np.mean(
        [_ssim_cv2_oracle(img1[..., i], img2[..., i]) for i in range(3)]
    )
    assert ssim(img1, img2) == pytest.approx(expected, abs=1e-10)


def test_ssim_identical_is_one(rng):
    img = rng.integers(0, 256, (32, 32, 1)).astype(np.uint8)
    assert ssim(img, img) == pytest.approx(1.0, abs=1e-9)


def test_mae(rng):
    img1 = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    img2 = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    expected = np.mean(np.abs(img1 / 255.0 - img2 / 255.0))
    assert mae(img1, img2) == pytest.approx(expected, rel=1e-6)


def test_img_as_uint8_rounds():
    x = np.array([[-0.1, 0.0, 0.5, 1.0, 1.2]], dtype=np.float32)
    out = img_as_uint8(x)
    # 0.5*255 = 127.5 rounds to 128 under numpy round-half-even? 127.5 -> 128
    np.testing.assert_array_equal(out, [[0, 0, 128, 255, 255]])
    assert out.dtype == np.uint8


def test_tensor2img_matches_uint8_quantization(rng):
    x = rng.random((1, 8, 8, 3)).astype(np.float32)
    out = tensor2img(x)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out, img_as_uint8(x[0]))
