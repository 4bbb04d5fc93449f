"""Motion-vector warping: the TPU equivalent of ``grid_sample``-based flow warp.

The reference warps features by bitstream flows via
``F.grid_sample(align_corners=True, padding_mode='zeros')`` on unnormalized
pixel flows (reference: mmedit/models/common/flow_warp.py:6-50, used through
``VOSAlignment`` in mmedit/models/backbones/sr_backbones/iconvsr_mv.py:12-19).

With ``align_corners=True`` the normalize/denormalize round-trip is exact:
the sample position in pixels is simply ``base_grid + flow``. So the op is a
bilinear (or nearest) gather with zero padding, which we express as four
clipped gathers + validity masks. XLA lowers the flattened ``take`` to a
vectorized dynamic-gather; a fused Pallas kernel can replace this path later
without changing the call signature.

Layout: NHWC. ``flow`` is ``(n, h, w, 2)`` with channels (dx, dy) in pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["flow_warp"]


def _gather_2d(img_flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """img_flat: (h*w, c), idx: (h*w,) -> (h*w, c)."""
    return jnp.take(img_flat, idx, axis=0)


def _warp_single(x: jnp.ndarray, flow: jnp.ndarray, interpolation: str) -> jnp.ndarray:
    h, w, c = x.shape
    dtype = x.dtype
    xf = x.reshape(h * w, c)

    row = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    px = col + flow[..., 0].astype(jnp.float32)
    py = row + flow[..., 1].astype(jnp.float32)

    if interpolation == "nearest":
        # round-half-even, matching torch grid_sample nearest (std::nearbyint)
        ix = jnp.round(px).astype(jnp.int32)
        iy = jnp.round(py).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        out = _gather_2d(xf, idx.reshape(-1)).reshape(h, w, c)
        return jnp.where(valid[..., None], out, jnp.zeros((), dtype))

    if interpolation != "bilinear":
        raise ValueError(f"Unsupported interpolation: {interpolation!r}")

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0).astype(dtype)
    wy = (py - y0).astype(dtype)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    def corner(iy, ix):
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
        v = _gather_2d(xf, idx.reshape(-1)).reshape(h, w, c)
        return jnp.where(valid[..., None], v, jnp.zeros((), dtype))

    v00 = corner(y0, x0)
    v01 = corner(y0, x1)
    v10 = corner(y1, x0)
    v11 = corner(y1, x1)

    one = jnp.asarray(1, dtype)
    top = v00 * (one - wx)[..., None] + v01 * wx[..., None]
    bot = v10 * (one - wx)[..., None] + v11 * wx[..., None]
    return top * (one - wy)[..., None] + bot * wy[..., None]


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    interpolation: str = "bilinear",
) -> jnp.ndarray:
    """Warp ``x`` (n,h,w,c) by pixel-space ``flow`` (n,h,w,2), zeros padding.

    Semantics match ``grid_sample(align_corners=True, padding_mode='zeros')``
    on unnormalized flows (reference flow_warp.py:6-50).
    """
    if x.shape[1:3] != flow.shape[1:3]:
        raise ValueError(
            f"Spatial sizes of input {x.shape[1:3]} and flow {flow.shape[1:3]} differ"
        )
    return jax.vmap(_warp_single, in_axes=(0, 0, None))(x, flow, interpolation)
