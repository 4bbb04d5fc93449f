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

import functools

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


def _warp_single_blockgather(
    x: jnp.ndarray, flow: jnp.ndarray, border: bool = False
) -> jnp.ndarray:
    """Bilinear warp fetching all 4 corners in ONE gather of a (2,2,C) block.

    TPU gathers are issue-rate-bound per gathered row, so fetching the full
    2x2 bilinear neighborhood per output pixel (one 2*2*C slice) instead of
    4 separate single-row gathers cuts the dominant cost ~4x. Out-of-range
    starts are clamped into [0, h-2] x [0, w-2]; each corner is then read
    from the block at its clamped offset and masked by its own validity
    (zeros padding semantics).
    """
    h, w, c = x.shape
    dtype = x.dtype

    row = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    px = col + flow[..., 0].astype(jnp.float32)
    py = row + flow[..., 1].astype(jnp.float32)

    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wx = (px - x0).astype(dtype)
    wy = (py - y0).astype(dtype)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    y0c = jnp.clip(y0, 0, h - 2)
    x0c = jnp.clip(x0, 0, w - 2)
    starts = jnp.stack([y0c.reshape(-1), x0c.reshape(-1)], axis=-1)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    blocks = jax.lax.gather(
        x, starts, dnums, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(h, w, 2, 2, c)

    one = jnp.asarray(1, dtype)
    out = jnp.zeros((h, w, c), dtype)
    always_valid = jnp.ones((h, w), bool)
    b00 = blocks[:, :, 0, 0]
    b01 = blocks[:, :, 0, 1]
    b10 = blocks[:, :, 1, 0]
    b11 = blocks[:, :, 1, 1]
    for dy in range(2):
        wrow = (one - wy) if dy == 0 else wy
        yy = y0 + dy
        # block-local offset: equals dy except at clamped image borders
        oy = (jnp.clip(yy - y0c, 0, 1) == 1)[..., None]
        for dx in range(2):
            wcol = (one - wx) if dx == 0 else wx
            xx = x0 + dx
            ox = (jnp.clip(xx - x0c, 0, 1) == 1)[..., None]
            if border:
                # border padding: out-of-range taps read the edge pixel
                # (corner clamping == coordinate clamping for bilinear)
                valid = always_valid
            else:
                valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
            row0 = jnp.where(ox, b01, b00)
            row1 = jnp.where(ox, b11, b10)
            v = jnp.where(oy, row1, row0)
            out = out + jnp.where(valid[..., None], v * (wrow * wcol)[..., None], 0)
    return out


def _padgather_weights(flow, h, w, border, dtype):
    """Shared elementwise front end: tap indices + masked bilinear weights.

    Differentiable w.r.t. ``flow`` (floor/clip-to-int contribute zero
    derivative a.e., matching grid_sample's grid gradient semantics)."""
    row = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    px = col + flow[..., 0].astype(jnp.float32)
    py = row + flow[..., 1].astype(jnp.float32)
    if border:
        # border padding == coordinate clamping for bilinear
        px = jnp.clip(px, 0, w - 1)
        py = jnp.clip(py, 0, h - 1)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - jax.lax.stop_gradient(x0)
    wy = py - jax.lax.stop_gradient(y0)

    x0i = jnp.clip(x0.astype(jnp.int32), -1, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), -1, h - 1)

    # weight masks: a tap 1 px outside reads the zero border (correct for
    # zeros padding); farther taps read a clamped (wrong) pixel -> weight 0
    ok_x0 = (x0 >= -1) & (x0 <= w - 1)
    ok_x1 = (x0 + 1 >= 0) & (x0 + 1 <= w)
    ok_y0 = (y0 >= -1) & (y0 <= h - 1)
    ok_y1 = (y0 + 1 >= 0) & (y0 + 1 <= h)

    wx1 = jnp.where(ok_x1, wx, 0.0).astype(dtype)
    wx0 = jnp.where(ok_x0, 1.0 - wx, 0.0).astype(dtype)
    wy1 = jnp.where(ok_y1, wy, 0.0).astype(dtype)
    wy0 = jnp.where(ok_y0, 1.0 - wy, 0.0).astype(dtype)
    return x0i, y0i, wx0, wx1, wy0, wy1


def _padgather_blocks(x, y0i, x0i):
    """The one (2, 2, C)-slice gather from the zero-padded image.

    NOTE: the gather must fully include the minor (channel) dim in the
    slice — partially gathering a reshaped (h+2, (w+2)*c) view drops XLA
    to a scalar gather path (measured 1.9 s/call vs 13 ms at 720p)."""
    c = x.shape[-1]
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    starts = jnp.stack(
        [(y0i + 1).reshape(-1), (x0i + 1).reshape(-1)], axis=-1
    )
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        xp, starts, dnums, slice_sizes=(2, 2, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    )  # (h*w, 2, 2, c)


def _padgather_combine(blocks, flow, border, h, w, dtype):
    """Bilinear blend of gathered blocks; differentiable w.r.t. flow."""
    _, _, wx0, wx1, wy0, wy1 = _padgather_weights(flow, h, w, border, dtype)
    wy0 = wy0.reshape(-1, 1)
    wy1 = wy1.reshape(-1, 1)
    row0 = blocks[:, 0, 0] * wy0 + blocks[:, 1, 0] * wy1
    row1 = blocks[:, 0, 1] * wy0 + blocks[:, 1, 1] * wy1
    out = row0 * wx0.reshape(-1, 1) + row1 * wx1.reshape(-1, 1)
    return out.reshape(h, w, blocks.shape[-1])


def _warp_single_padgather_impl(
    x: jnp.ndarray, flow: jnp.ndarray, border: bool = False
) -> jnp.ndarray:
    """Bilinear warp: one (2, 2C)-row gather from a zero-padded image, all
    edge handling folded into (h, w) SCALAR weight maps.

    The blockgather variant's per-corner clamp-correction selects and
    validity masks run on (h, w, 4, C)-sized tensors in gather-dictated
    layouts — measured ~100 ms/frame at 720p, 4x the gather itself. Here:

    - the image is zero-padded by 1 px, block starts are clamped to
      [-1, edge-1] + 1, so a clamped block always reads either the true
      value or the padded zero for every tap that has nonzero weight;
    - taps landing >= 2 px outside get ZERO WEIGHT via (h, w) masks folded
      into the bilinear weights — no per-channel selects.
    """
    h, w, _ = x.shape
    x0i, y0i, *_ = _padgather_weights(flow, h, w, border, x.dtype)
    blocks = _padgather_blocks(x, y0i, x0i)
    return _padgather_combine(blocks, flow, border, h, w, x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _warp_single_padgather(
    x: jnp.ndarray, flow: jnp.ndarray, border: bool = False
) -> jnp.ndarray:
    return _warp_single_padgather_impl(x, flow, border)


def _padgather_fwd(x, flow, border):
    return _warp_single_padgather_impl(x, flow, border), (x, flow)


def _padgather_bwd(border, res, g):
    """Exact adjoint WITHOUT scatter (the autodiff backward of the gather
    is an XLA scatter-add, measured ~9.4 s of a 10.7 s flagship train step
    at the reference recipe shape — TPU scatters update serially).

    d/dx is the bilinear SPLAT of the cotangent: every out pixel q adds
    w_tap(q) * g[q] to its 4 tap cells. Computed as segment sums with
    gathers only, exploiting that all 4 taps share one BASE cell
    (y0+1, x0+1) and differ by the constant offsets {0, 1, wp2, wp2+1}:
    sort the hw base cells ONCE (not 4hw tap cells), segment-sum each
    tap's weighted-cotangent stream under that one permutation, and
    compose the result as 4 constant-shifted adds of the per-tap dense
    maps. One sort of hw keys + one merge-rank searchsorted replace the
    round-4 form's 4hw-key versions (measured 0.53 -> 0.40 s of the
    1.73 s recipe-shape train step; tools/splat_probe.py). The prefix
    sums of the 4 streams are fused column-blocks of ONE (hw+1, 4c)
    cumsum so the boundary takes stay 2 gathers. Exact up to f32
    summation order; destinations in the pad ring are sliced away
    (their forward reads were the structural zeros).

    d/dflow re-runs the blend with the re-gathered blocks held constant —
    identical to autodiff's flow gradient (gather indices and floor carry
    zero derivative), at the cost of one extra gather instead of saved
    (hw, 2, 2, c) residuals.
    """
    x, flow = res
    h, w, c = x.shape
    x0i, y0i, wx0, wx1, wy0, wy1 = _padgather_weights(
        flow, h, w, border, x.dtype
    )

    blocks = _padgather_blocks(x, y0i, x0i)
    _, pull = jax.vjp(
        lambda fl: _padgather_combine(blocks, fl, border, h, w, x.dtype),
        flow,
    )
    (dflow,) = pull(g)

    gf = g.reshape(-1, c).astype(jnp.float32)
    wp2 = w + 2
    base = (y0i + 1).reshape(-1) * wp2 + (x0i + 1).reshape(-1)  # (hw,)
    sbase, perm = jax.lax.sort_key_val(
        base, jnp.arange(base.shape[0], dtype=jnp.int32)
    )
    # the 4 taps' weighted cotangents as column blocks of one value row:
    # one perm-gather, one cumsum, two boundary takes for all 4 streams
    val = jnp.concatenate(
        [
            gf * (wy_t * wx_t).reshape(-1, 1).astype(jnp.float32)
            for wy_t in (wy0, wy1)
            for wx_t in (wx0, wx1)
        ],
        axis=1,
    )  # (hw, 4c), tap order (ty, tx) = (0,0),(0,1),(1,0),(1,1)
    sval = jnp.take(val, perm, axis=0)
    cs0 = jnp.concatenate(
        [jnp.zeros((1, 4 * c), jnp.float32), jnp.cumsum(sval, axis=0)],
        axis=0,
    )
    cells = jnp.arange((h + 2) * wp2, dtype=sbase.dtype)
    # method='sort' (merge-rank) beats the default binary scan on TPU:
    # the scan's dependent 1-row gather rounds are issue-rate-bound
    # (measured 229 -> 177 ms per 75-frame splat batch)
    hi = jnp.searchsorted(sbase, cells, side="right", method="sort")
    lo = jnp.concatenate([jnp.zeros((1,), hi.dtype), hi[:-1]])
    seg = (jnp.take(cs0, hi, axis=0) - jnp.take(cs0, lo, axis=0)).reshape(
        h + 2, wp2, 4, c
    )
    # dense[cell] = sum_tap seg_tap[cell - off_tap]: constant shifts
    z_row = jnp.zeros((1, wp2, c), jnp.float32)
    z_col = jnp.zeros((h + 2, 1, c), jnp.float32)
    sh_x = lambda a: jnp.concatenate(  # noqa: E731
        [z_col, a[:, :-1]], axis=1
    )
    sh_y = lambda a: jnp.concatenate(  # noqa: E731
        [z_row, a[:-1]], axis=0
    )
    dense = (
        seg[:, :, 0]
        + sh_x(seg[:, :, 1])
        + sh_y(seg[:, :, 2])
        + sh_y(sh_x(seg[:, :, 3]))
    )
    dx = dense[1:-1, 1:-1].astype(x.dtype)
    return dx, dflow.astype(flow.dtype)


_warp_single_padgather.defvjp(_padgather_fwd, _padgather_bwd)


_BLOCK = 8       # H.264 macroblock partitions are multiples of 8x8
_BLOCK_PAD = 16  # >= 10: any clamped block gather is fully outside the
                 # +-1 tap range, so its weights are exactly zero


def _warp_single_block8(x: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Bilinear warp for flows CONSTANT over the 8x8 macroblock grid — the
    structure the MV rasterizer emits (data/mv_raster.py: per-partition
    constants over 16x16/16x8/8x8 blocks, all 8-aligned).

    One (9,9,C)-slice gather per block instead of a (2,2,C) gather per
    pixel: 64x fewer gather rows, each a large contiguous slab. Since
    floor(y + fy) == y + floor(fy) for integer y, a block's 81 taps live in
    one (9,9) source window at a per-block integer offset; the per-block
    fractional weights are combined with per-PIXEL validity masks exactly
    as in the padgather variant, so zeros-padding semantics are exact for
    any displacement (a 16-px zero pad guarantees clamped blocks carry
    zero weight everywhere).
    """
    h, w, c = x.shape
    dtype = x.dtype
    nby, nbx = h // _BLOCK, w // _BLOCK

    fb = flow[:: _BLOCK, :: _BLOCK]  # (nby, nbx, 2) per-block flow
    fx = fb[..., 0].astype(jnp.float32)
    fy = fb[..., 1].astype(jnp.float32)
    dx = jnp.floor(fx)
    dy = jnp.floor(fy)
    wx = fx - dx  # per-block fractions
    wy = fy - dy

    P = _BLOCK_PAD
    xp = jnp.pad(x, ((P, P), (P, P), (0, 0)))
    by = jax.lax.broadcasted_iota(jnp.int32, (nby, nbx), 0) * _BLOCK
    bx = jax.lax.broadcasted_iota(jnp.int32, (nby, nbx), 1) * _BLOCK
    sy = jnp.clip(by + dy.astype(jnp.int32) + P, 0, h + 2 * P - (_BLOCK + 1))
    sx = jnp.clip(bx + dx.astype(jnp.int32) + P, 0, w + 2 * P - (_BLOCK + 1))
    starts = jnp.stack([sy.reshape(-1), sx.reshape(-1)], axis=-1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )
    g = jax.lax.gather(
        xp, starts, dnums, slice_sizes=(_BLOCK + 1, _BLOCK + 1, c),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(nby, nbx, _BLOCK + 1, _BLOCK + 1, c)

    # per-pixel validity folded into the bilinear weights (padgather
    # rules). The weights are SEPARABLE per block — row weights depend on
    # (block, row), col weights on (block, col) — so they are built as
    # per-block 8-vectors and broadcast, instead of 4 full-frame (h, w)
    # maps + blocked() transposes (measured: the maps + transposes were
    # most of the warp's XLA glue).
    wy0v, wy1v, wx0v, wx1v = _block8_weight_vectors(fx, fy, h, w)
    wy0 = wy0v[:, :, :, None, None].astype(dtype)   # (nby, nbx, 8, 1, 1)
    wy1 = wy1v[:, :, :, None, None].astype(dtype)
    wx0 = wx0v[:, :, None, :, None].astype(dtype)   # (nby, nbx, 1, 8, 1)
    wx1 = wx1v[:, :, None, :, None].astype(dtype)

    B = _BLOCK
    r0 = g[:, :, 0:B, 0:B] * wy0 + g[:, :, 1 : B + 1, 0:B] * wy1
    r1 = g[:, :, 0:B, 1 : B + 1] * wy0 + g[:, :, 1 : B + 1, 1 : B + 1] * wy1
    out = r0 * wx0 + r1 * wx1  # (nby, nbx, 8, 8, c)
    return out.transpose(0, 2, 1, 3, 4).reshape(h, w, c)


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    interpolation: str = "bilinear",
    impl: str = "padgather",
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Warp ``x`` (n,h,w,c) by pixel-space ``flow`` (n,h,w,2), zeros padding.

    Semantics match ``grid_sample(align_corners=True, padding_mode='zeros')``
    on unnormalized flows (reference flow_warp.py:6-50).

    impl: 'padgather' (default, one (2,2C)-row gather from a padded view,
    scalar weight masks), 'blockgather' (one (2,2,C)-slice gather per pixel,
    per-corner selects), or 'corner' (four single-row gathers; the
    semantics baseline).
    """
    if x.shape[1:3] != flow.shape[1:3]:
        raise ValueError(
            f"Spatial sizes of input {x.shape[1:3]} and flow {flow.shape[1:3]} differ"
        )
    h, w = x.shape[1:3]
    if (
        interpolation == "bilinear"
        and impl == "block8"
        and padding_mode == "zeros"
        and h % _BLOCK == 0
        and w % _BLOCK == 0
    ):
        # ONLY exact for flows constant over the 8x8 macroblock grid (the
        # rasterizer's output at uncropped resolutions); callers opt in.
        return jax.vmap(_warp_single_block8)(x, flow)
    if interpolation == "bilinear" and impl in ("padgather", "block8"):
        border = padding_mode == "border"
        return jax.vmap(_warp_single_padgather, in_axes=(0, 0, None))(
            x, flow, border
        )
    if (
        interpolation == "bilinear"
        and impl == "blockgather"
        and h >= 2
        and w >= 2  # the (2,2,C) block gather needs a 2x2 neighborhood
    ):
        border = padding_mode == "border"
        return jax.vmap(_warp_single_blockgather, in_axes=(0, 0, None))(
            x, flow, border
        )
    if padding_mode == "border":
        # tiny-image fallback for border mode: clamp flows so every sample
        # lands inside; equivalent to border for bilinear
        row = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)[None, ..., None]
        col = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)[None, ..., None]
        fx = jnp.clip(flow[..., 0:1] + col, 0, w - 1) - col
        fy = jnp.clip(flow[..., 1:2] + row, 0, h - 1) - row
        flow = jnp.concatenate([fx, fy], axis=-1).astype(flow.dtype)
        padding_mode = "zeros"
    if padding_mode != "zeros":
        raise NotImplementedError(f"{padding_mode=} requires impl='blockgather'")
    return jax.vmap(_warp_single, in_axes=(0, 0, None))(x, flow, interpolation)


def _block8_weight_vectors(fx, fy, h, w):
    """Validity-folded separable bilinear weights per block:
    (nby, nbx, 8) row weights wy0/wy1 and col weights wx0/wx1, matching
    _warp_single_block8's per-pixel maps exactly (floor(y+fy) == y +
    floor(fy) for integer y)."""
    dy = jnp.floor(fy)
    dx = jnp.floor(fx)
    wyf = (fy - dy)[..., None]
    wxf = (fx - dx)[..., None]
    r8 = jnp.arange(8, dtype=jnp.float32)
    gy = (
        jax.lax.broadcasted_iota(jnp.float32, fy.shape, 0)[..., None] * _BLOCK
        + r8
    )
    gx = (
        jax.lax.broadcasted_iota(jnp.float32, fx.shape, 1)[..., None] * _BLOCK
        + r8
    )
    y0 = gy + dy[..., None]
    x0 = gx + dx[..., None]
    wy1 = jnp.where((y0 + 1 >= 0) & (y0 + 1 <= h), wyf, 0.0)
    wy0 = jnp.where((y0 >= -1) & (y0 <= h - 1), 1.0 - wyf, 0.0)
    wx1 = jnp.where((x0 + 1 >= 0) & (x0 + 1 <= w), wxf, 0.0)
    wx0 = jnp.where((x0 >= -1) & (x0 <= w - 1), 1.0 - wxf, 0.0)
    return wy0, wy1, wx0, wx1


