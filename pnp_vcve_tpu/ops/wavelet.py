"""Haar wavelet transforms (MW-GAN family).

Exact NHWC ports of the reference's DWT/IWT convention
(mmedit/models/backbones/sr_backbones/wavelet_util.py:20-52): the /2
scaling, the (LL, HL, LH, HH) channel-block order, and the sub-band sign
pattern are all load-bearing for checkpoint parity.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["dwt", "iwt"]


def dwt(x: jnp.ndarray) -> jnp.ndarray:
    """(b, h, w, c) -> (b, h/2, w/2, 4c) with channel blocks (LL, HL, LH, HH)."""
    x01 = x[:, 0::2, :, :] / 2
    x02 = x[:, 1::2, :, :] / 2
    x1 = x01[:, :, 0::2, :]
    x2 = x02[:, :, 0::2, :]
    x3 = x01[:, :, 1::2, :]
    x4 = x02[:, :, 1::2, :]
    ll = x1 + x2 + x3 + x4
    hl = -x1 - x2 + x3 + x4
    lh = -x1 + x2 - x3 + x4
    hh = x1 - x2 - x3 + x4
    return jnp.concatenate([ll, hl, lh, hh], axis=-1)


def iwt(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`dwt`: (b, h, w, 4c) -> (b, 2h, 2w, c)."""
    b, h, w, c4 = x.shape
    c = c4 // 4
    x1 = x[..., 0:c] / 2
    x2 = x[..., c : 2 * c] / 2
    x3 = x[..., 2 * c : 3 * c] / 2
    x4 = x[..., 3 * c : 4 * c] / 2

    e0 = x1 - x2 - x3 + x4  # (0::2, 0::2)
    o0 = x1 - x2 + x3 - x4  # (1::2, 0::2)
    e1 = x1 + x2 - x3 - x4  # (0::2, 1::2)
    o1 = x1 + x2 + x3 + x4  # (1::2, 1::2)

    rows_e = jnp.stack([e0, e1], axis=3).reshape(b, h, 2 * w, c)
    rows_o = jnp.stack([o0, o1], axis=3).reshape(b, h, 2 * w, c)
    return jnp.stack([rows_e, rows_o], axis=2).reshape(b, 2 * h, 2 * w, c)
