"""Upsampling ops for the VSR head.

- :func:`pixel_shuffle` — NHWC depth-to-space matching torch
  ``nn.PixelShuffle`` channel ordering (used by ``PixelShufflePack``,
  reference: mmedit/models/common/upsample.py:8-51).
- :func:`bilinear_resize` — half-pixel-center bilinear resize matching torch
  ``nn.Upsample(mode='bilinear', align_corners=False)`` (the ``img_upsample``
  base path of the vsr branch, reference iconvsr_ipb_par.py:41,140).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["pixel_shuffle", "bilinear_resize"]


def pixel_shuffle(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch channel ordering.

    Input channel layout is ``c_out * scale * scale`` where the torch
    ordering is ``c * r^2 + i * r + j`` -> output position ``(h*r+i, w*r+j)``.
    """
    n, h, w, c = x.shape
    r = scale
    cout = c // (r * r)
    x = x.reshape(n, h, w, cout, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r, w, r, cout
    return x.reshape(n, h * r, w * r, cout)


def bilinear_resize(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Bilinear x``scale`` upsample, half-pixel centers (align_corners=False).

    ``jax.image.resize`` uses half-pixel sampling, identical to torch
    ``interpolate(..., align_corners=False)``.
    """
    n, h, w, c = x.shape
    return jax.image.resize(
        x, (n, h * scale, w * scale, c), method="bilinear"
    ).astype(x.dtype)
