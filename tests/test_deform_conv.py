"""Modulated deformable conv tests against a direct numpy spec
implementation (DCNv2 definition: per-tap bilinear sample at
base+tap+offset, modulated by mask, then weighted sum)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.ops.deform_conv import modulated_deform_conv2d


def numpy_mdcn(x, offsets, mask, kernel, bias=None):
    """Direct per-pixel loop implementation of the DCNv2 spec."""
    b, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    groups = offsets.shape[3]
    cg = cin // groups
    ph, pw = kh // 2, kw // 2

    def sample(img, py, px):  # (h, w, c) bilinear, zeros pad
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        wy, wx = py - y0, px - x0
        val = np.zeros(img.shape[-1])
        for dy, vy in ((0, 1 - wy), (1, wy)):
            for dx, vx in ((0, 1 - wx), (1, wx)):
                yy, xx = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xx < w:
                    val += vy * vx * img[yy, xx]
        return val

    out = np.zeros((b, h, w, cout))
    for bi in range(b):
        for y in range(h):
            for xq in range(w):
                for k in range(kh * kw):
                    ky, kx = divmod(k, kw)
                    for g in range(groups):
                        dy, dx = offsets[bi, y, xq, g, k]
                        v = sample(
                            x[bi, :, :, g * cg : (g + 1) * cg],
                            y + ky - ph + dy,
                            xq + kx - pw + dx,
                        )
                        v = v * mask[bi, y, xq, g, k]
                        out[bi, y, xq] += v @ kernel[ky, kx, g * cg : (g + 1) * cg]
    if bias is not None:
        out = out + bias
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(5)


@pytest.mark.parametrize("groups", [1, 2])
def test_mdcn_matches_numpy_spec(rng, groups):
    b, h, w, cin, cout = 1, 6, 7, 4, 5
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    offsets = (rng.standard_normal((b, h, w, groups, 9, 2)) * 1.5).astype(np.float32)
    mask = rng.random((b, h, w, groups, 9)).astype(np.float32)
    kernel = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal(cout).astype(np.float32) * 0.1

    expected = numpy_mdcn(x, offsets, mask, kernel, bias)
    got = np.asarray(
        modulated_deform_conv2d(
            jnp.asarray(x), jnp.asarray(offsets), jnp.asarray(mask),
            jnp.asarray(kernel), jnp.asarray(bias),
        )
    )
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


def test_mdcn_zero_offsets_is_conv(rng):
    """Zero offsets + unit mask == a plain 'same' conv."""
    from pnp_vcve_tpu.ops import conv2d_nhwc

    b, h, w, c = 1, 8, 8, 4
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    kernel = rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.2
    offsets = jnp.zeros((b, h, w, 1, 9, 2))
    mask = jnp.ones((b, h, w, 1, 9))
    got = np.asarray(
        modulated_deform_conv2d(jnp.asarray(x), offsets, mask, jnp.asarray(kernel))
    )
    expected = np.asarray(conv2d_nhwc(jnp.asarray(x), jnp.asarray(kernel)))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-5)
