"""Bilinear resize with exact torch ``F.interpolate`` semantics.

Both variants build separable interpolation MATRICES and apply
``out = A_h @ x @ A_w^T`` per channel — matmul-form resize maps onto the
MXU instead of gathers, and (unlike ``jax.image.resize``, which
anti-alias-filters on downsample) reproduces torch's pure sample-at-
position semantics bit-closely in BOTH directions. Parity is asserted
against torch in tests/test_torch_oracle_baselines.py (SPyNet resizes,
reference basicvsr_net.py:636-642,665-693).

:func:`resize_bilinear` — half-pixel centers (``align_corners=False``):
``src = (i + 0.5) * n_in / n_out - 0.5`` clamped to the valid range.
:func:`resize_bilinear_align_corners` — ``src = i * (n_in-1)/(n_out-1)``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["resize_bilinear", "resize_bilinear_align_corners"]


def _matrix_from_pos(pos: np.ndarray, n_in: int, dtype) -> jnp.ndarray:
    """Rows of bilinear weights for float64 source positions ``pos``."""
    n_out = pos.shape[0]
    pos = np.clip(pos, 0.0, n_in - 1)
    lo = np.clip(np.floor(pos).astype(np.int64), 0, max(n_in - 2, 0))
    frac = pos - lo
    a = np.zeros((n_out, n_in), np.float64)
    rows = np.arange(n_out)
    a[rows, lo] += 1.0 - frac
    a[rows, np.minimum(lo + 1, n_in - 1)] += frac
    return jnp.asarray(a.astype(dtype))


def _half_pixel_matrix(n_out: int, n_in: int, dtype=jnp.float32) -> jnp.ndarray:
    pos = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    return _matrix_from_pos(pos, n_in, dtype)


def _align_corners_matrix(n_out: int, n_in: int, dtype=jnp.float32) -> jnp.ndarray:
    if n_out == 1 or n_in == 1:
        return jnp.full((n_out, n_in), 1.0 / n_in, dtype)
    pos = np.arange(n_out, dtype=np.float64) * ((n_in - 1) / (n_out - 1))
    return _matrix_from_pos(pos, n_in, dtype)


def _apply(x: jnp.ndarray, ah: jnp.ndarray, aw: jnp.ndarray) -> jnp.ndarray:
    # precision='highest': resize feeds parity-sensitive paths (SPyNet
    # flows); the TPU default would run these tiny matmuls in bf16
    out = jnp.einsum("oh,bhwc->bowc", ah, x.astype(jnp.float32),
                     precision="highest")
    out = jnp.einsum("pw,bhwc->bhpc", aw, out, precision="highest")
    return out.astype(x.dtype)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(b, h, w, c) -> (b, *size, c), torch ``align_corners=False``."""
    _, h, w, _ = x.shape
    if (h, w) == tuple(size):
        return x
    return _apply(x, _half_pixel_matrix(size[0], h), _half_pixel_matrix(size[1], w))


def resize_bilinear_align_corners(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(b, h, w, c) -> (b, *size, c), torch ``align_corners=True``."""
    _, h, w, _ = x.shape
    if (h, w) == tuple(size):
        return x
    return _apply(
        x, _align_corners_matrix(size[0], h), _align_corners_matrix(size[1], w)
    )
