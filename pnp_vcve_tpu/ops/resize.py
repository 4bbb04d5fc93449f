"""Resize helpers beyond jax.image (which is align_corners=False only).

:func:`resize_bilinear` — arbitrary target size, half-pixel centers
(torch ``interpolate(align_corners=False)``), thin wrapper on jax.image.
:func:`resize_bilinear_align_corners` — torch ``align_corners=True``
semantics via separable interpolation MATRICES: ``out = A_h @ x @ A_w^T``
per channel. Matmul-form resize maps onto the MXU instead of gathers (used
by SPyNet's flow upsampling, reference basicvsr_net.py:636-642).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["resize_bilinear", "resize_bilinear_align_corners"]


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(b, h, w, c) -> (b, *size, c), half-pixel centers."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, size[0], size[1], c), method="bilinear").astype(
        x.dtype
    )


def _interp_matrix(n_out: int, n_in: int, dtype=jnp.float32) -> jnp.ndarray:
    """A (n_out, n_in) with A[i] bilinear at position i*(n_in-1)/(n_out-1)."""
    if n_out == 1 or n_in == 1:
        return jnp.ones((n_out, n_in), dtype) / n_in
    pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 2)
    frac = pos - lo
    rows = jnp.arange(n_out)
    a = jnp.zeros((n_out, n_in), dtype)
    a = a.at[rows, lo].set((1.0 - frac).astype(dtype))
    a = a.at[rows, lo + 1].add(frac.astype(dtype))
    return a


def resize_bilinear_align_corners(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(b, h, w, c) -> (b, *size, c), align_corners=True semantics."""
    b, h, w, c = x.shape
    ho, wo = size
    ah = _interp_matrix(ho, h)
    aw = _interp_matrix(wo, w)
    out = jnp.einsum("oh,bhwc->bowc", ah, x.astype(jnp.float32))
    out = jnp.einsum("pw,bhwc->bhpc", aw, out)
    return out.astype(x.dtype)
