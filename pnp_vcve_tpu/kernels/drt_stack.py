"""Chained DRT blocks in a shared padded-packed format (PF) — zero XLA glue
between blocks.

Motivation (measured, tools/perf_probe.py): running the fused per-block
kernel (:mod:`drt_packed`) back to back leaves ~6 ms/frame of XLA work
BETWEEN kernels — each call pads the (b,h,w,64) feature map (two full-frame
copies), reshapes to packed, and relayouts the custom-call output. Here all
N blocks of a BAE stack consume and produce the SAME padded-packed tensor:

    PF: (b, HP, WP, 2c) bfloat16
        orig row r      <-> padded row  r + 8
        orig pixel pair (2j, 2j+1) <-> padded packed col j + 8
        everything outside the interior is zeros (maintained by each block)

so the loop over blocks is pure pallas_call chaining: pack once before
block 0, unpack once after block N-1. Kernel math is identical to
drt_packed._kernel (reference semantics sr_backbone_utils.py:304-313,
channel_first / one_layer / with_se):

    dyres = sum_r par_r * (x @ PK_r)
    h     = relu(gamma * (dynconv3x3(x) + b2) + dyres)
    out   = x + conv1_3x3(h) + b1

The 8-packed-col left pad makes every store offset sublane-aligned; the
first/last row tiles zero-fill their 2 missing band rows (the ±2-row DMA
context structurally exceeds the array at the edges).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import pack_conv3x3_kernel_ab, pack_conv3x3_kernel_per_tap

__all__ = ["drt_stack_packed", "drt_stack_packed_from_pf", "input_conv_pf", "pack_pf", "unpack_pf", "par_to_pf", "pf_geometry"]

PAD_R = 8  # top row pad (orig row r <-> padded row r + PAD_R)
PAD_C = 8  # left packed-col pad (8-aligned so all stores are aligned)


def _round_up(v: int, m: int = 8) -> int:
    return -(-v // m) * m


def pf_geometry(h: int, w: int, th: int):
    """(HP, WP, wh, cols1, cols2) for the padded-packed format."""
    if w % 2:
        raise ValueError(f"need even w, got {w}")
    wh = w // 2
    cols2 = _round_up(wh)          # stage-2 compute width (>= wh, aligned)
    cols1 = cols2 + 8              # stage-1 width (stage-2 needs cols2+2)
    WP = cols1 + PAD_C             # band window reads up to cols1+7 + 1
    HP = _round_up(h + 2 * PAD_R, th)
    return HP, WP, wh, cols1, cols2


def pack_pf(x: jnp.ndarray, th: int) -> jnp.ndarray:
    """(b, h, w, c) -> PF (b, HP, WP, 2c)."""
    b, h, w, c = x.shape
    HP, WP, wh, _, _ = pf_geometry(h, w, th)
    xp = jnp.pad(
        x, ((0, 0), (PAD_R, HP - h - PAD_R), (2 * PAD_C, 2 * (WP - wh - PAD_C)), (0, 0))
    )
    return xp.reshape(b, HP, WP, 2 * c)


def unpack_pf(y: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """PF (b, HP, WP, 2c) -> (b, h, w, c)."""
    b, HP, WP, c2 = y.shape
    wh = w // 2
    y = y[:, PAD_R : PAD_R + h, PAD_C : PAD_C + wh]
    return y.reshape(b, h, w, c2 // 2)


def par_to_pf(par: jnp.ndarray, th: int, lanes: int = 128) -> jnp.ndarray:
    """(b, h, w, 3) partition map -> PF (b, HP, WP, lanes) with channels
    [even r0, even r1, even r2, odd r0, odd r1, odd r2, 0...]."""
    b, h, w, _ = par.shape
    HP, WP, wh, _, _ = pf_geometry(h, w, th)
    p = par.reshape(b, h, wh, 6)
    p = jnp.pad(
        p,
        (
            (0, 0),
            (PAD_R, HP - h - PAD_R),
            (PAD_C, WP - wh - PAD_C),
            (0, lanes - 6),
        ),
    )
    return p


def _tap_conv(band, w_taps, rows, cols, c2, row0=0, col0=0):
    acc = jnp.zeros((rows * cols, c2), jnp.float32)
    for dy in range(3):
        for k in range(3):
            win = band[
                row0 + dy : row0 + dy + rows, col0 + k : col0 + k + cols
            ].reshape(rows * cols, c2)
            acc = acc + jnp.dot(win, w_taps[dy, k], preferred_element_type=jnp.float32)
    return acc


def _band_dma(src_hbm, bi, band, sem, t, n_tiles, th, do_start: bool):
    """DMA the (th+4)-row context band for out-tile t. Both array edges
    structurally under/over-run by 2 rows; those rows are zeros (outside the
    PF interior), so edge tiles transfer th+2 rows and zero-fill the rest."""
    s = t * th - 2

    @pl.when(t == 0)
    def _():
        d = pltpu.make_async_copy(
            src_hbm.at[bi, pl.ds(0, th + 2)], band.at[pl.ds(2, th + 2)], sem
        )
        if do_start:
            band[0:2] = jnp.zeros_like(band[0:2])
            d.start()
        else:
            d.wait()

    @pl.when((t > 0) & (t < n_tiles - 1))
    def _():
        d = pltpu.make_async_copy(
            src_hbm.at[bi, pl.ds(s, th + 4)], band, sem
        )
        if do_start:
            d.start()
        else:
            d.wait()

    @pl.when((t == n_tiles - 1) & (t > 0))
    def _():
        d = pltpu.make_async_copy(
            src_hbm.at[bi, pl.ds(s, th + 2)], band.at[pl.ds(0, th + 2)], sem
        )
        if do_start:
            band[th + 2 : th + 4] = jnp.zeros_like(band[th + 2 : th + 4])
            d.start()
        else:
            d.wait()


def _ab_conv(band, bband, wa, wb, rows, cols, c2, row0, col0):
    """2-matmul-per-dy packed conv: A = the center pair band, B = the
    cross-pair band (see packing.pack_conv3x3_kernel_ab). ``col0`` is the
    CENTER column of output col 0."""
    acc = jnp.zeros((rows * cols, c2), jnp.float32)
    for dy in range(3):
        a = band[row0 + dy : row0 + dy + rows, col0 : col0 + cols].reshape(
            rows * cols, c2
        )
        bwin = bband[row0 + dy : row0 + dy + rows, col0 : col0 + cols].reshape(
            rows * cols, c2
        )
        acc = acc + jnp.dot(a, wa[dy], preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(bwin, wb[dy], preferred_element_type=jnp.float32)
    return acc


def _cross_pair(src, rows, width, c):
    """(rows, width, 2c) -> cross-pair band: out[r, j] = (src[r, j-1].hi,
    src[r, j+1].lo), valid for j in [1, width-1).

    The half-lane swap runs as ONE MXU pass against the block-swap
    permutation matrix (Mosaic implements neither lane-offset concats nor
    dynamic lane rotates for this layout); the rest is a same-lane select
    between the two column-shifted views. Adds ~1 matmul pass per stage vs
    the 6 it saves over the 3-tap form."""
    c2 = 2 * c
    vals = src[0:rows, 0:width]
    ri_ = jax.lax.broadcasted_iota(jnp.int32, (c2, c2), 0)
    ci_ = jax.lax.broadcasted_iota(jnp.int32, (c2, c2), 1)
    perm = (jnp.abs(ri_ - ci_) == c).astype(vals.dtype)
    rolled = jnp.dot(
        vals.reshape(rows * width, c2), perm,
        preferred_element_type=jnp.float32,
    ).astype(vals.dtype).reshape(rows, width, c2)  # (hi[j], lo[j])
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, width - 2, c2), 2)
    return jnp.where(lane < c, rolled[:, 0 : width - 2], rolled[:, 2:width])


def _kernel_body(
    xpf_hbm, parpf_hbm, w2_ref, b2_ref, pk_ref, w1_ref, b1_ref, g_ref, o_ref,
    bands, parbands, hmid, sems, psems, *, th, c2, h, w, cols1, cols2,
):
    """Shared DRT-block compute: DMA pipeline + both conv stages. Stores
    the masked block output into ``o_ref`` and RETURNS the bf16 interior
    tile (th, cols2, c2) so epilogue variants (key-carry select) can reuse
    it without re-reading ``o_ref``."""
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    slot = jax.lax.rem(ri, 2)
    nxt = jax.lax.rem(ri + 1, 2)

    @pl.when(ri == 0)
    def _():
        _band_dma(xpf_hbm, bi, bands.at[0], sems.at[0], 0, n_tiles, th, True)
        _band_dma(parpf_hbm, bi, parbands.at[0], psems.at[0], 0, n_tiles, th, True)

    @pl.when(ri + 1 < n_tiles)
    def _():
        _band_dma(xpf_hbm, bi, bands.at[nxt], sems.at[nxt], ri + 1, n_tiles, th, True)
        _band_dma(parpf_hbm, bi, parbands.at[nxt], psems.at[nxt], ri + 1, n_tiles, th, True)

    _band_dma(xpf_hbm, bi, bands.at[slot], sems.at[slot], ri, n_tiles, th, False)
    _band_dma(parpf_hbm, bi, parbands.at[slot], psems.at[slot], ri, n_tiles, th, False)
    band = bands.at[slot]
    parband = parbands.at[slot]

    rows1 = th + 2
    c = c2 // 2

    # ---- stage 1: dynamic conv + bias, * gamma (h1 rows at orig
    # ri*th - 9 + r1, packed col pair jo1 = c1 - 1)
    # NOTE: an A/B 2-matmul-per-dy reformulation (fewer MXU passes via a
    # cross-pair band) measured SLOWER end to end (11.8 vs 13.7 f/s): the
    # permutation matmul + shifted-lane selects + scratch round-trips cost
    # more than the saved passes. Keep the per-tap form.
    acc = _tap_conv(band, w2_ref[0], rows1, cols1, c2, row0=0, col0=6)
    acc = (acc + b2_ref[0, 0].astype(jnp.float32)) * g_ref[0, 0].astype(jnp.float32)
    acc = acc.reshape(rows1, cols1, c2)

    # ---- partition side path: 3 block-diag 1x1 matmuls, lane-gated
    xc = band[1 : 1 + rows1, 7 : 7 + cols1].reshape(rows1 * cols1, c2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows1, cols1, c2), 2)
    for r in range(3):
        y_r = jnp.dot(
            xc, pk_ref[0, r], preferred_element_type=jnp.float32
        ).reshape(rows1, cols1, c2)
        ge = parband[1 : 1 + rows1, 7 : 7 + cols1, r : r + 1].astype(jnp.float32)
        go = parband[1 : 1 + rows1, 7 : 7 + cols1, 3 + r : 4 + r].astype(jnp.float32)
        gate = jnp.where(lane < c, ge, go)
        acc = acc + y_r * gate

    h1 = jnp.maximum(acc, 0.0)

    # ---- zero out-of-image stage-1 positions (conv1 'same' zero padding)
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows1, cols1, c2), 0) + ri * th - 9
    gcol = (
        2 * jax.lax.broadcasted_iota(jnp.int32, (rows1, cols1, c2), 1)
        - 2
        + (lane >= c).astype(jnp.int32)
    )
    valid = (grow >= 0) & (grow < h) & (gcol >= 0) & (gcol < w)
    hmid[:] = jnp.where(valid, h1, 0.0).astype(hmid.dtype)

    # ---- stage 2: plain conv1 over hmid + residual, PF-masked output
    out = _tap_conv(hmid, w1_ref[0], th, cols2, c2)
    out = out + b1_ref[0, 0].astype(jnp.float32)
    resid = band[2 : 2 + th, 8 : 8 + cols2].reshape(th * cols2, c2).astype(jnp.float32)
    out = (resid + out).reshape(th, cols2, c2)

    orow = jax.lax.broadcasted_iota(jnp.int32, (th, cols2, c2), 0) + ri * th - PAD_R
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (th, cols2, c2), 2)
    ocol = 2 * jax.lax.broadcasted_iota(jnp.int32, (th, cols2, c2), 1) + (
        lane2 >= c
    ).astype(jnp.int32)
    ovalid = (orow >= 0) & (orow < h) & (ocol < w)
    interior = jnp.where(ovalid, out, 0.0).astype(o_ref.dtype)
    o_ref[0, :, 0:PAD_C] = jnp.zeros((th, PAD_C, c2), o_ref.dtype)
    o_ref[0, :, PAD_C : PAD_C + cols2] = interior
    o_ref[0, :, PAD_C + cols2 :] = jnp.zeros(
        (th, o_ref.shape[2] - PAD_C - cols2, c2), o_ref.dtype
    )
    return interior


def _kernel(*refs, th, c2, h, w, cols1, cols2):
    _kernel_body(*refs, th=th, c2=c2, h=h, w=w, cols1=cols1, cols2=cols2)


def _kernel_select(
    xpf_hbm, parpf_hbm, w2_ref, b2_ref, pk_ref, w1_ref, b1_ref, g_ref,
    lk_ref, kf_ref, o_ref, o2_ref, bands, parbands, hmid, sems, psems,
    *, th, c2, h, w, cols1, cols2,
):
    """Block kernel + folded key-carry select epilogue:
    ``o2 = where(is_key, out, last_key)`` — the scan's keyframe-carry
    update (models/pnp_vcve.py) computed while the out tile is still in
    VMEM. Replaces a full-frame XLA broadcast-select on the PF carry
    (measured 1.8 ms/frame at 720p) with one pipelined tile read of
    ``last_key`` and one tile write. ``kf_ref`` is the per-sample is_key
    flag broadcast to (1, c2) lanes; PF pad rows/cols are zero in both
    operands, so the epilogue writes zeros there unconditionally."""
    interior = _kernel_body(
        xpf_hbm, parpf_hbm, w2_ref, b2_ref, pk_ref, w1_ref, b1_ref, g_ref,
        o_ref, bands, parbands, hmid, sems, psems,
        th=th, c2=c2, h=h, w=w, cols1=cols1, cols2=cols2,
    )
    is_key = kf_ref[0, 0] > 0.5  # (c2,) identical lanes
    sel = jnp.where(is_key, interior, lk_ref[0, :, PAD_C : PAD_C + cols2])
    o2_ref[0, :, 0:PAD_C] = jnp.zeros((th, PAD_C, c2), o2_ref.dtype)
    o2_ref[0, :, PAD_C : PAD_C + cols2] = sel.astype(o2_ref.dtype)
    o2_ref[0, :, PAD_C + cols2 :] = jnp.zeros(
        (th, o2_ref.shape[2] - PAD_C - cols2, c2), o2_ref.dtype
    )


def _drt_block_pf(
    xpf, parpf, w2, b2, pk, w1, b1, g, *, th, h, w, cols1, cols2,
    key_select=None,
):
    """One fused DRT block on PF input. ``key_select=(last_key, is_key)``
    (PF array, (b,) 0/1 floats) additionally returns
    ``where(is_key, out, last_key)`` — the scan's keyframe-carry update —
    computed in the kernel epilogue (see _kernel_select)."""
    b, HP, WP, c2 = xpf.shape
    weight_specs = [
        pl.BlockSpec((1, 3, 3, c2, c2), lambda bi, ri: (bi, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, c2, c2), lambda bi, ri: (bi, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, 3, c2, c2), lambda bi, ri: (bi, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM),
    ]
    tile_spec = pl.BlockSpec((1, th, WP, c2), lambda bi, ri: (bi, ri, 0, 0),
                             memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((2, th + 4, WP, c2), xpf.dtype),
        pltpu.VMEM((2, th + 4, WP, parpf.shape[-1]), parpf.dtype),
        pltpu.VMEM((th + 2, cols1, c2), xpf.dtype),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    kw = dict(th=th, c2=c2, h=h, w=w, cols1=cols1, cols2=cols2)
    if key_select is None:
        return pl.pallas_call(
            functools.partial(_kernel, **kw),
            grid=(b, HP // th),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)] + weight_specs,
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((b, HP, WP, c2), xpf.dtype),
            scratch_shapes=scratch,
            compiler_params=params,
        )(xpf, parpf, w2, b2, pk, w1, b1, g)
    lk, kf = key_select
    kfb = jnp.broadcast_to(
        kf.astype(jnp.float32).reshape(b, 1, 1), (b, 1, c2)
    )
    return pl.pallas_call(
        functools.partial(_kernel_select, **kw),
        grid=(b, HP // th),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)] + weight_specs + [
            tile_spec,
            pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[tile_spec, tile_spec],
        out_shape=[jax.ShapeDtypeStruct((b, HP, WP, c2), xpf.dtype)] * 2,
        scratch_shapes=scratch,
        compiler_params=params,
    )(xpf, parpf, w2, b2, pk, w1, b1, g, lk.astype(xpf.dtype), kfb)


def _pack_pk(par_kernel):
    """(c, 3, c) -> (3, 2c, 2c) block-diagonal packed 1x1 kernels."""
    c = par_kernel.shape[0]
    out = jnp.zeros((3, 2 * c, 2 * c), par_kernel.dtype)
    for r in range(3):
        out = out.at[r, 0:c, 0:c].set(par_kernel[:, r])
        out = out.at[r, c:, c:].set(par_kernel[:, r])
    return out


def _block_params_packed(blk, b, c2, dtype):
    """Pack one block's parameters for the kernel (A/B 2-matmul form).
    Matmul weights are cast to the feature dtype (as the XLA composition
    does), biases/gamma stay fp32 (added/multiplied on the fp32
    accumulator)."""
    w2 = jax.vmap(pack_conv3x3_kernel_per_tap)(blk["dyn_kernels"]).astype(dtype)
    b2 = jnp.concatenate([blk["dyn_biases"]] * 2, -1).reshape(b, 1, c2)
    g = jnp.concatenate([blk["gamma"]] * 2, -1).reshape(b, 1, c2)
    pk = jnp.broadcast_to(
        _pack_pk(blk["par_kernel"].astype(dtype))[None], (b, 3, c2, c2)
    )
    w1 = jnp.broadcast_to(
        pack_conv3x3_kernel_per_tap(blk["conv1_kernel"].astype(dtype))[None],
        (b, 3, 3, c2, c2),
    )
    b1 = jnp.broadcast_to(
        jnp.concatenate([blk["conv1_bias"]] * 2).reshape(1, 1, c2), (b, 1, c2)
    )
    return w2, b2, pk, w1, b1, g


@functools.partial(jax.jit, static_argnames=("th", "h", "w", "unpack"))
def drt_stack_packed_from_pf(
    xpf, par, blocks, h: int, w: int, th: int = 16, unpack: bool = True,
    key_select=None,
):
    """As :func:`drt_stack_packed` but consuming an ALREADY-PF input (e.g.
    from :func:`input_conv_pf`); returns the unpacked (b, h, w, c) result,
    or the raw PF with ``unpack=False`` (for chaining into head_pf).

    ``key_select=(last_key, is_key)`` folds the scan's keyframe-carry
    update into the LAST block's epilogue and returns
    ``(out, where(is_key, out, last_key))`` (PF-layout both)."""
    b = xpf.shape[0]
    HP, WP, _, cols1, cols2 = pf_geometry(h, w, th)
    if xpf.shape[1] != HP or xpf.shape[2] != WP:
        raise ValueError(f"PF shape {xpf.shape} != geometry {(HP, WP)}")
    c2 = xpf.shape[3]
    parpf = par_to_pf(par, th).astype(xpf.dtype)
    new_lk = None
    for i, blk in enumerate(blocks):
        if "w2" in blk:
            # premixed/prepacked (expert mixing hoisted out of the scan)
            w2 = blk["w2"].astype(xpf.dtype)
            b2, g = blk["b2"], blk["g"]
            pk, w1, b1 = _static_params_packed(blk, b, c2, xpf.dtype)
        else:
            w2, b2, pk, w1, b1, g = _block_params_packed(blk, b, c2, xpf.dtype)
        last = i == len(blocks) - 1
        res = _drt_block_pf(
            xpf, parpf, w2, b2, pk, w1, b1, g,
            th=th, h=h, w=w, cols1=cols1, cols2=cols2,
            key_select=key_select if last else None,
        )
        if last and key_select is not None:
            xpf, new_lk = res
        else:
            xpf = res
    out = unpack_pf(xpf, h, w) if unpack else xpf
    return out if key_select is None else (out, new_lk)


@functools.partial(jax.jit, static_argnames=("th",))
def drt_stack_packed(x, par, blocks, th: int = 16):
    """Run N chained DRT blocks with one pack / one unpack.

    Args:
      x: (b, h, w, c) block-stack input (even w).
      par: (b, h, w, 3) partition map.
      blocks: sequence of dicts with keys dyn_kernels (b,3,3,c,c),
        dyn_biases (b,c), par_kernel (c,3,c), conv1_kernel (3,3,c,c),
        conv1_bias (c,), gamma (b,c) — one per block.
      th: row-tile height (HP % th == 0 is arranged internally).
    """
    b, h, w, c = x.shape
    HP, _, _, cols1, cols2 = pf_geometry(h, w, th)
    if HP // th < 2:
        raise ValueError(f"need >= 2 row tiles, got h={h}, th={th}")
    c2 = 2 * c
    xpf = pack_pf(x, th)
    parpf = par_to_pf(par, th).astype(x.dtype)
    for blk in blocks:
        w2, b2, pk, w1, b1, g = _block_params_packed(blk, b, c2, x.dtype)
        xpf = _drt_block_pf(
            xpf, parpf, w2, b2, pk, w1, b1, g,
            th=th, h=h, w=w, cols1=cols1, cols2=cols2,
        )
    return unpack_pf(xpf, h, w)


def _input_conv_kernel(
    *refs, th, cols2, wh, n_parts, h, pf_flags=None, tps=1,
):
    """Packed fused input conv: PF out tile = lrelu(sum_p conv3x3(part_p)).

    Tiling contract (asserted by the wrapper): th == PAD_R == 8 and
    h % 8 == 0, so PF out tile t covers orig rows [(t-1)*8, t*8) — tiles
    0 and n-1 are pure pad (written as zeros), tile 1 / n-2 zero-fill one
    context row, everything else DMAs th+2 full rows.

    ``tps`` = th-tiles per GRID STEP (2 when the tile count is even): the
    per-grid-step fixed cost (~15 us of scalar/semaphore work) rivals the
    per-tile tap dots (~15-30 us, tools/input_conv_bench.py), so halving
    the step count dilutes it 2x. All tile indexing stays in th units;
    only the out block and the prefetch schedule see ``tps``.

    ``pf_flags[p]`` marks part p as ALREADY in PF layout (b, HP, WP, 2c):
    its context band is one full-width row DMA at PF rows
    [(t-1)*th + 7, ...) with no edge cases — the PF pad ring (zeroed by
    every PF producer) supplies the halo rows/cols.
    """
    part_hbm = refs[:n_parts]
    w_refs = refs[n_parts : 2 * n_parts]
    b_ref = refs[2 * n_parts]
    o_ref = refs[2 * n_parts + 1]
    bands = refs[2 * n_parts + 2 : 3 * n_parts + 2]
    sems = refs[3 * n_parts + 2]

    bi = pl.program_id(0)
    ri = pl.program_id(1)
    n = pl.num_programs(1) * tps  # total th-tiles
    c2 = o_ref.shape[3]

    @pl.when(ri == 0)
    def _():
        # side context columns no DMA ever writes (left 8 for aligned
        # offsets; right >= wh): zero ONCE for all slots of the non-PF
        # parts (PF-part DMAs rewrite the full band width)
        for p in range(n_parts):
            if not (pf_flags and pf_flags[p]):
                bands[p][:, :, 0:8] = jnp.zeros_like(bands[p][:, :, 0:8])
                bands[p][:, :, 8 + wh :] = jnp.zeros_like(
                    bands[p][:, :, 8 + wh :]
                )

    def band_ops(t, slot, do_start: bool):
        """DMA the (th+2)-row context band of every part for compute-tile t
        (t in [1, n-2]; tiles 0 and n-1 are pure pad). Double-buffered: the
        next tile's bands stream in while this tile computes."""
        s = t * th - 9
        for p in range(n_parts):
            band = bands[p].at[slot]

            if pf_flags and pf_flags[p]:
                # PF source: rows [(t-1)*th + 7, + th + 2) always in
                # bounds (min 7 at t=1, max h+9 <= HP); full-width copy,
                # band col of packed col j = j + 8 either way.
                d = pltpu.make_async_copy(
                    part_hbm[p].at[bi, pl.ds(t * th - th + 7, th + 2)],
                    band.at[pl.ds(0, th + 2)],
                    sems.at[slot, p],
                )
                if do_start:
                    d.start()
                else:
                    d.wait()
                continue

            @pl.when(t == 1)
            def _():
                d = pltpu.make_async_copy(
                    part_hbm[p].at[bi, pl.ds(0, th + 1)],
                    band.at[pl.ds(1, th + 1), pl.ds(8, wh)],
                    sems.at[slot, p],
                )
                if do_start:
                    band[0:1] = jnp.zeros_like(band[0:1])
                    d.start()
                else:
                    d.wait()

            @pl.when(t == n - 2)
            def _():
                d = pltpu.make_async_copy(
                    part_hbm[p].at[bi, pl.ds(s, th + 1)],
                    band.at[pl.ds(0, th + 1), pl.ds(8, wh)],
                    sems.at[slot, p],
                )
                if do_start:
                    band[th + 1 : th + 2] = jnp.zeros_like(band[th + 1 : th + 2])
                    d.start()
                else:
                    d.wait()

            @pl.when((t > 1) & (t < n - 2))
            def _():
                d = pltpu.make_async_copy(
                    part_hbm[p].at[bi, pl.ds(s, th + 2)],
                    band.at[pl.ds(0, th + 2), pl.ds(8, wh)],
                    sems.at[slot, p],
                )
                if do_start:
                    d.start()
                else:
                    d.wait()

    def compute_tile(t, off):
        """Compute th-tile t into o_ref rows [off, off+th)."""

        @pl.when((t == 0) | (t == n - 1))
        def _():
            o_ref[0, off : off + th] = jnp.zeros(
                (th,) + o_ref.shape[2:], o_ref.dtype
            )

        @pl.when((t > 0) & (t < n - 1))
        def _():
            band_ops(t, jax.lax.rem(t, 4), False)

            acc = jnp.zeros((th * cols2, c2), jnp.float32)
            for p in range(n_parts):
                band = bands[p].at[jax.lax.rem(t, 4)]
                for dy in range(3):
                    for k in range(3):
                        # band col of orig packed col j is j + 8; window
                        # cols for out pair j2 are j2-1..j2+1 -> offset 7
                        win = band[
                            dy : dy + th, k + 7 : k + 7 + cols2
                        ].reshape(th * cols2, band.shape[2])
                        acc = acc + jnp.dot(
                            win, w_refs[p][0, dy, k],
                            preferred_element_type=jnp.float32,
                        )
            acc = acc + b_ref[0, 0].astype(jnp.float32)
            acc = jnp.where(acc >= 0, acc, 0.1 * acc)  # leaky_relu(0.1)
            acc = acc.reshape(th, cols2, c2).astype(o_ref.dtype)
            o_ref[0, off : off + th, 0:PAD_C] = jnp.zeros(
                (th, PAD_C, c2), o_ref.dtype
            )
            o_ref[0, off : off + th, PAD_C : PAD_C + cols2] = acc
            o_ref[0, off : off + th, PAD_C + cols2 :] = jnp.zeros(
                (th, o_ref.shape[2] - PAD_C - cols2, c2), o_ref.dtype
            )

    if tps == 1:
        # 4-slot bands, prefetch depth 3 (same rationale as _head_kernel):
        # the per-step compute is too short to hide one DMA round trip
        @pl.when(ri == 1)
        def _():
            for k in range(3):
                @pl.when(1 + k < n - 1)
                def _(k=k):
                    band_ops(jnp.int32(1 + k), (1 + k) % 4, True)

        @pl.when((ri >= 1) & (ri + 3 < n - 1))
        def _():
            band_ops(ri + 3, jax.lax.rem(ri + 3, 4), True)

        compute_tile(ri, 0)
    else:
        # tps == 2: step ri covers tiles (2ri, 2ri+1); prefetch one step
        # (= two tiles) ahead into the other slot pair
        @pl.when(ri == 0)
        def _():
            for k in range(1, 4):
                @pl.when(k < n - 1)
                def _(k=k):
                    band_ops(jnp.int32(k), k % 4, True)

        @pl.when(ri >= 1)
        def _():
            for d in range(2):
                t = 2 * ri + 2 + d

                @pl.when(t < n - 1)
                def _(t=t):
                    band_ops(t, jax.lax.rem(t, 4), True)

        compute_tile(2 * ri, 0)
        compute_tile(2 * ri + 1, th)


def input_conv_pf(parts, kernel, bias, cout: int = 64, part_specs=None,
                  part_pf=None):
    """Fused BAE input conv emitting PF directly.

    ``conv(concat(parts))`` as a sum of per-part packed convolutions with
    the leaky_relu fused — replaces an XLA conv chain that lands in a
    1-sublane layout next to the warp ops (measured ~31 ms/frame at 720p vs
    the packed-MXU cost of ~3 ms).

    Args:
      parts: sequence of (b, h, w, c_p) NHWC arrays; channels sum to
        ``kernel.shape[2]``. Requires h % 8 == 0 and w/2 % 8 == 0.
      kernel: (3, 3, cin_total, cout) HWIO; bias: (cout,).
      part_specs: optional list of (kernel_cin_offset, gain) per part —
        ``gain`` is a per-sample (b,) scalar multiplied into that part's
        KERNEL (a scalar select/gain commutes with convolution, so e.g.
        ``where(flag, a, b)`` as a conv input becomes two gained parts —
        no full-frame select). None = sequential offsets, gain 1.
      part_pf: optional list of bools — True marks a part ALREADY in PF
        layout (b, HP, WP, 128), e.g. a warp_pf output or the previous
        step's PF stack carry; its logical channel count is 64 and its pad
        ring must be zero (all PF producers here guarantee that).
    Returns: PF (b, HP, WP, 2*cout) bfloat-typed like parts[0].
    """
    if part_pf is None:
        part_pf = [False] * len(parts)
    i0 = part_pf.index(False) if False in part_pf else None
    if i0 is None:
        raise ValueError("need at least one non-PF part to fix h, w")
    b, h, w, _ = parts[i0].shape
    th = PAD_R  # the tiling contract hard-wires th == PAD_R == 8
    if h % th or (w // 2) % 8 or w % 2:
        raise ValueError(f"need h%8==0 and (w/2)%8==0, got {h}x{w}")
    HP, WP, wh, cols1, cols2 = pf_geometry(h, w, th)
    if cols2 != wh:
        raise ValueError(f"need aligned wh, got wh={wh}, cols2={cols2}")
    dtype = parts[0].dtype
    c2 = 2 * cout

    def logical_c(p, is_pf):
        return p.shape[-1] // 2 if is_pf else p.shape[-1]

    if part_specs is None:
        offs = []
        off = 0
        for part, is_pf in zip(parts, part_pf):
            offs.append((off, None))
            off += logical_c(part, is_pf)
        if off != kernel.shape[2]:
            raise ValueError("part channels do not sum to kernel cin")
        part_specs = offs

    packed_parts = []
    w_parts = []
    for part, spec, is_pf in zip(parts, part_specs, part_pf):
        # a spec may be a LIST of (offset, gain) pairs: one part feeding
        # several kernel slices rides a SUMMED gained kernel (conv is
        # linear in the kernel) — see _part_specs_for_gate
        spec = spec if isinstance(spec, list) else [spec]
        cp = logical_c(part, is_pf)
        if is_pf:
            if part.shape != (b, HP, WP, 128):
                raise ValueError(
                    f"PF part shape {part.shape} != {(b, HP, WP, 128)}"
                )
            pk = part
        else:
            pk = part.reshape(b, h, wh, 2 * cp)
        kp = None
        for off, gain in spec:
            k_i = pack_conv3x3_kernel_per_tap(
                kernel[:, :, off : off + cp, :].astype(dtype)
            )  # (3, 3, 2cp, 2cout)
            if 2 * cp < 128:
                # Mosaic DMA slices must be lane-aligned (128): pad narrow
                # parts (e.g. the 3-channel lr) with zero lanes + zero
                # kernel rows — identical math
                k_i = jnp.pad(k_i, ((0, 0), (0, 0), (0, 128 - 2 * cp), (0, 0)))
            k_i = jnp.broadcast_to(k_i[None], (b,) + k_i.shape)
            if gain is not None:
                k_i = k_i * gain.astype(dtype)[:, None, None, None, None]
            kp = k_i if kp is None else kp + k_i
        if 2 * cp < 128:
            pk = jnp.pad(pk, ((0, 0), (0, 0), (0, 0), (0, 128 - 2 * cp)))
        packed_parts.append(pk)
        w_parts.append(kp)
    b_packed = jnp.concatenate([bias, bias]).reshape(1, 1, c2).astype(jnp.float32)
    b_packed = jnp.broadcast_to(b_packed, (b, 1, c2))

    tps = 2 if (HP // th) % 2 == 0 else 1
    kern = functools.partial(
        _input_conv_kernel, th=th, cols2=cols2, wh=wh,
        n_parts=len(parts), h=h, pf_flags=tuple(part_pf), tps=tps,
    )
    # per-sample kernels (gain-gated parts need them; ungated are broadcast)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * len(parts) + [
        pl.BlockSpec((1, 3, 3, wp.shape[3], c2), lambda bi, ri: (bi, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for wp in w_parts
    ] + [pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM)]

    return pl.pallas_call(
        kern,
        grid=(b, HP // (th * tps)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, th * tps, WP, c2), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, HP, WP, c2), dtype),
        scratch_shapes=[
            pltpu.VMEM(
                (4, th + 2, cols2 + 16, max(2 * logical_c(p, f), 128)), dtype
            )
            for p, f in zip(parts, part_pf)
        ] + [pltpu.SemaphoreType.DMA((4, len(parts)))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(*packed_parts, *w_parts, b_packed)


# ---- training support: fused forward, reference backward ------------------
#
# The Pallas kernels are numerically identical to the XLA op composition
# (kernel tests pin them together), so a jax.custom_vjp can run the FUSED
# kernels on the forward pass and differentiate the XLA composition on the
# backward pass: training gets the 3x faster forward while gradients stay
# exactly those of the reference math.


def _xla_block_compose(x, par, blocks):
    """Pure-XLA DRT chain (DRTBlock channel_first/one_layer semantics)."""
    from pnp_vcve_tpu.ops.dynamic_conv import conv2d_nhwc, dynamic_conv2d

    for blk in blocks:
        blk = _as_unpacked_block(blk)
        dyres = None
        for r in range(3):
            gated = x * par[..., r : r + 1].astype(x.dtype)
            term = jnp.einsum(
                "bhwi,io->bhwo", gated, blk["par_kernel"][:, r].astype(x.dtype),
                preferred_element_type=jnp.float32,
            )
            dyres = term if dyres is None else dyres + term
        dyn = dynamic_conv2d(
            x, blk["dyn_kernels"], blk["dyn_biases"], gamma=blk["gamma"]
        ).astype(jnp.float32)
        hmid = jax.nn.relu(dyn + dyres).astype(x.dtype)
        out = conv2d_nhwc(hmid, blk["conv1_kernel"], blk["conv1_bias"])
        x = x + out
    return x


def make_trainable_stack(th: int):
    """``f(x, par, blocks)``: Pallas-fused forward, XLA-composition VJP."""

    @jax.custom_vjp
    def f(x, par, blocks):
        return drt_stack_packed(x, par, blocks, th=th)

    def fwd(x, par, blocks):
        return f(x, par, blocks), (x, par, blocks)

    def bwd(res, g):
        x, par, blocks = res
        _, vjp = jax.vjp(_xla_block_compose, x, par, blocks)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def _part_specs_for_gate(parts, align_gate, part_pf=None):
    """BAE part layout (lr, key_warp, neighbor[, cur]) with the align_key
    select expressed as KERNEL gains: where(g, kw, nb) as a conv input
    equals conv(kw, g*K_nb) + conv(nb, (1-g)*K_nb) — a per-sample scalar on
    the (3,3,c,c) kernel instead of a full-frame select. ``part_pf`` marks
    PF-layout parts whose LOGICAL channel count is shape[-1] // 2."""
    if part_pf is None:
        part_pf = [False] * len(parts)
    lc = [
        p.shape[-1] // 2 if f else p.shape[-1] for p, f in zip(parts, part_pf)
    ]
    lr, kw, nb = parts[0], parts[1], parts[2]
    c_lr, c_kw = lc[0], lc[1]
    g = align_gate.astype(jnp.float32)
    # kw's two roles — its own kernel slice AND the gated neighbor slice —
    # ride ONE part with a SUMMED gained kernel (conv is linear in the
    # kernel: conv(kw, K_kw) + conv(kw, g*K_nb) == conv(kw, K_kw + g*K_nb)),
    # so the kernel runs 9 fewer tap dots and one fewer band-DMA chain per
    # conv than the 4-part form.
    specs = [
        (0, None),
        [(c_lr, None), (c_lr + c_kw, g)],
        (c_lr + c_kw, 1.0 - g),
    ]
    arrs = [lr, kw, nb]
    off = c_lr + c_kw + lc[2]
    for r, cr in zip(parts[3:], lc[3:]):
        arrs.append(r)
        specs.append((off, None))
        off += cr
    return arrs, specs


def _gate_pf_flags(part_pf):
    """part_pf for the (lr, kw, nb, *rest) arrs of _part_specs_for_gate
    (1:1 with the parts since the gated kw rides a summed kernel)."""
    return list(part_pf)


def _xla_input_stack_compose(parts, kernel, bias, par, blocks, align_gate=None,
                             part_pf=None, h=None, w=None, pf_out=False):
    if part_pf is not None and any(part_pf):
        parts = tuple(
            unpack_pf(p, h, w) if f else p for p, f in zip(parts, part_pf)
        )
    if pf_out:
        out = _xla_input_stack_compose(
            parts, kernel, bias, par, blocks, align_gate
        )
        return pack_pf(out, th=PAD_R)
    if align_gate is not None:
        lr, kw, nb = parts[0], parts[1], parts[2]
        nb = jnp.where(align_gate[:, None, None, None], kw, nb)
        parts = (lr, kw, nb) + tuple(parts[3:])
    acc = None
    off = 0
    for part in parts:
        cin = part.shape[-1]
        term = jax.lax.conv_general_dilated(
            part, kernel[:, :, off : off + cin, :].astype(part.dtype),
            (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
        off += cin
    feat = jax.nn.leaky_relu(acc + bias, negative_slope=0.1).astype(parts[0].dtype)
    return _xla_block_compose(feat, par, blocks)


def make_trainable_input_stack(th: int, h: int, w: int, cout: int,
                               gated: bool = False, part_pf=None,
                               pf_out: bool = False):
    """``f(parts, kernel, bias, par, blocks[, align_gate])``: fused input
    conv + PF stack forward, XLA-composition VJP. ``gated=True`` adds the
    align_key select as per-sample kernel gains (see _part_specs_for_gate).
    ``part_pf`` marks PF-layout parts; ``pf_out=True`` returns the raw PF
    stack output (the PF-resident carry) instead of unpacking."""
    part_pf = list(part_pf) if part_pf is not None else None
    pf_in = part_pf is not None and any(part_pf)

    def _compose_xla(parts, kernel, bias, par, blocks, align_gate=None):
        return _xla_input_stack_compose(
            parts, kernel, bias, par, blocks, align_gate,
            part_pf=part_pf if pf_in else None, h=h, w=w, pf_out=pf_out,
        )

    if not gated:

        @jax.custom_vjp
        def f(parts, kernel, bias, par, blocks):
            xpf = input_conv_pf(
                list(parts), kernel, bias, cout=cout, part_pf=part_pf
            )
            return drt_stack_packed_from_pf(
                xpf, par, blocks, h=h, w=w, th=th, unpack=not pf_out
            )

        def fwd(parts, kernel, bias, par, blocks):
            return f(parts, kernel, bias, par, blocks), (parts, kernel, bias, par, blocks)

        def bwd(res, g):
            parts, kernel, bias, par, blocks = res
            _, vjp = jax.vjp(
                lambda *a: _compose_xla(*a), parts, kernel, bias, par, blocks
            )
            return vjp(g)

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def fg(parts, kernel, bias, par, blocks, align_gate):
        arrs, specs = _part_specs_for_gate(parts, align_gate, part_pf)
        xpf = input_conv_pf(
            arrs, kernel, bias, cout=cout, part_specs=specs,
            part_pf=_gate_pf_flags(part_pf) if pf_in else None,
        )
        return drt_stack_packed_from_pf(
            xpf, par, blocks, h=h, w=w, th=th, unpack=not pf_out
        )

    def fwd_g(parts, kernel, bias, par, blocks, align_gate):
        return fg(parts, kernel, bias, par, blocks, align_gate), (
            parts, kernel, bias, par, blocks, align_gate,
        )

    def bwd_g(res, g):
        parts, kernel, bias, par, blocks, align_gate = res
        _, vjp = jax.vjp(
            lambda p, k, b2, pr, bl: _compose_xla(
                p, k, b2, pr, bl, align_gate
            ),
            parts, kernel, bias, par, blocks,
        )
        return vjp(g) + (jnp.zeros_like(align_gate),)

    fg.defvjp(fwd_g, bwd_g)
    return fg


HEAD_NSLOT = 4  # head band slots: prefetch depth 3 (see _head_kernel)


def _head_dma(src_hbm, bi, band, sem, t, th, do_start: bool):
    # band: PF rows [t*th + PAD_R - 2, + th + 4) — always inside [0, HP)
    # because the PF interior pad rows cover the 2-row halo on both sides.
    d = pltpu.make_async_copy(
        src_hbm.at[bi, pl.ds(t * th + PAD_R - 2, th + 4)], band, sem
    )
    if do_start:
        d.start()
    else:
        d.wait()


def _head_kernel(xpf_hbm, whr_ref, bhr_ref, wlast_ref, blast_ref, o_ref,
                 bands, hmid, sems, *, th, cols1, cols2, wh, c2, h):
    """Reconstruction head on PF input: y = conv_last(lrelu(conv_hr(x)));
    the +lr residual stays in XLA (keeps lr away from custom-call layout
    constraints). Out tile ri covers orig rows [ri*th, (ri+1)*th).

    conv_hr computes at width ``cols1`` (656 at 720p), NOT the minimal
    cols2+2=650: an 8-misaligned width makes every per-tap
    ``reshape(rows*cols, c2)`` a genuine sublane relayout instead of a
    relabeling — measured 10.58 ms/frame at width 650 vs the DRT stack
    block (more math, same structure, aligned widths) at ~1.75 ms
    (tools/input_conv_bench.py). The 6 extra columns are garbage masked
    by the same validity select that zeroes the conv 'same' halo."""
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    slot = jax.lax.rem(ri, HEAD_NSLOT)

    # prefetch depth HEAD_NSLOT-1: at ~1.5 ms of MXU math across 90 grid
    # steps the per-step compute (~17 us) cannot hide the HBM DMA
    # issue->signal latency, so depth-1 double buffering stalls every
    # step; issuing HEAD_NSLOT-1 tiles ahead overlaps several in-flight
    # bands instead
    @pl.when(ri == 0)
    def _():
        for k in range(HEAD_NSLOT - 1):
            if k == 0:
                _head_dma(xpf_hbm, bi, bands.at[0], sems.at[0], 0, th, True)
            else:
                @pl.when(k < n_tiles)
                def _(k=k):
                    _head_dma(
                        xpf_hbm, bi, bands.at[k], sems.at[k], k, th, True
                    )

    @pl.when(ri + HEAD_NSLOT - 1 < n_tiles)
    def _():
        nxt = jax.lax.rem(ri + HEAD_NSLOT - 1, HEAD_NSLOT)
        _head_dma(
            xpf_hbm, bi, bands.at[nxt], sems.at[nxt],
            ri + HEAD_NSLOT - 1, th, True,
        )

    _head_dma(xpf_hbm, bi, bands.at[slot], sems.at[slot], ri, th, False)
    band = bands.at[slot]

    rows1 = th + 2
    c = c2 // 2
    w = 2 * wh
    # conv_hr + lrelu: hmid local r1 -> orig row ri*th - 1 + r1; hmid col
    # c1 -> orig packed col c1 - 1. Window base: padded col of (c1-1)-1 is
    # c1 + 6.
    acc = _tap_conv(band, whr_ref[0], rows1, cols1, c2, row0=0, col0=6)
    acc = acc + bhr_ref[0, 0].astype(jnp.float32)
    acc = jnp.where(acc >= 0, acc, 0.1 * acc)
    acc = acc.reshape(rows1, cols1, c2)
    # conv 'same' zero-pad semantics: bias+lrelu made the out-of-image
    # positions nonzero — zero them before conv_last consumes the halo
    grow = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 0) + ri * th - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, acc.shape, 2)
    gcol = (
        2 * jax.lax.broadcasted_iota(jnp.int32, acc.shape, 1)
        - 2
        + (lane >= c).astype(jnp.int32)
    )
    valid = (grow >= 0) & (grow < h) & (gcol >= 0) & (gcol < w)
    hmid[:] = jnp.where(valid, acc, 0.0).astype(hmid.dtype)

    # conv_last: out (th, cols2, 2*3) via per-tap matmuls on hmid
    c_out = o_ref.shape[3]
    out = jnp.zeros((th * cols2, c_out), jnp.float32)
    for dy in range(3):
        for k in range(3):
            win = hmid[dy : dy + th, k : k + cols2].reshape(th * cols2, c2)
            out = out + jnp.dot(
                win, wlast_ref[0, dy, k], preferred_element_type=jnp.float32
            )
    out = out + blast_ref[0, 0].astype(jnp.float32)
    o_ref[0] = out.reshape(th, cols2, c_out).astype(o_ref.dtype)


def head_pf(xpf, conv_hr_kernel, conv_hr_bias, conv_last_kernel,
            conv_last_bias, h: int, w: int):
    """Packed reconstruction head (reference iconvsr_ipb_par.py:135-141,
    vsr=False): ``conv_last(lrelu(conv_hr(x)))`` from the PF stack output,
    WITHOUT the +lr residual (added by the caller). Returns (b, h, w, 3).
    """
    b, HP, WP, c2 = xpf.shape
    # th=16 when aligned: the head's per-grid-step overhead (~27 us against
    # ~18 us of tap dots at th=8, tools/input_conv_bench.py) halves with
    # half the steps; the kernel + _head_dma are th-generic (the PF pad
    # ring keeps every band in-bounds for any th | h).
    th = 16 if h % 16 == 0 else PAD_R
    _, _, wh, cols1, cols2 = pf_geometry(h, w, PAD_R)
    if cols2 != wh or h % th:
        raise ValueError(f"need aligned geometry, got {h}x{w}")
    dtype = xpf.dtype
    c_out3 = conv_last_kernel.shape[-1]
    c_out = 2 * c_out3

    whr = pack_conv3x3_kernel_per_tap(conv_hr_kernel.astype(dtype))[None]
    bhr = jnp.broadcast_to(
        jnp.concatenate([conv_hr_bias] * 2).reshape(1, 1, c2), (b, 1, c2)
    )
    wlast = pack_conv3x3_kernel_per_tap(conv_last_kernel.astype(dtype))[None]
    blast = jnp.broadcast_to(
        jnp.concatenate([conv_last_bias] * 2).reshape(1, 1, c_out), (b, 1, c_out)
    )

    kern = functools.partial(
        _head_kernel, th=th, cols1=cols1, cols2=cols2, wh=wh, c2=c2, h=h
    )
    out = pl.pallas_call(
        kern,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, 3, c2, c2), lambda bi, ri: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, c2, c_out), lambda bi, ri: (0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_out), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, cols2, c_out), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, cols2, c_out), dtype),
        scratch_shapes=[
            pltpu.VMEM((HEAD_NSLOT, th + 4, WP, c2), dtype),
            pltpu.VMEM((th + 2, cols1, c2), dtype),
            pltpu.SemaphoreType.DMA((HEAD_NSLOT,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xpf, whr, bhr, wlast, blast)
    return out.reshape(b, h, w, c_out3)


def _xla_head(x, head):
    """XLA reference for the packed head: conv_last(lrelu_0.1(conv_hr(x)))."""
    hr_k, hr_b, last_k, last_b = head

    def conv(v, k, b2):
        return (
            jax.lax.conv_general_dilated(
                v, k.astype(v.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            + b2
        )

    y = conv(x, hr_k, hr_b)
    y = jnp.where(y >= 0, y, 0.1 * y).astype(x.dtype)
    return conv(y, last_k, last_b).astype(x.dtype)


def make_fused_pipeline_select(th: int, h: int, w: int, cout: int,
                               gated: bool = False, part_pf=None,
                               with_head: bool = False):
    """PF-resident pipeline with the keyframe-carry select folded into the
    last stack block (see _kernel_select):

      ``f(parts, kernel, bias, par, blocks, head, lk, kf[, align_gate])``
      -> ``(out_pf[, y], new_lk)`` where ``new_lk = where(kf, out, lk)``.

    ``out_pf``/``new_lk`` are raw PF (this is the PF-resident carry path,
    pf_out is implied). ``head=None`` when ``with_head=False``. Forward is
    Pallas; the VJP re-derives through the XLA composition (``kf`` is a
    0/1 keyframe flag — zero cotangent)."""
    part_pf = list(part_pf) if part_pf is not None else None
    pf_in = part_pf is not None and any(part_pf)

    def _fused(parts, kernel, bias, par, blocks, head, lk, kf, align_gate):
        if align_gate is not None:
            arrs, specs = _part_specs_for_gate(parts, align_gate, part_pf)
            flags = _gate_pf_flags(part_pf) if pf_in else None
        else:
            arrs, specs = list(parts), None
            flags = part_pf if pf_in else None
        xpf = input_conv_pf(
            arrs, kernel, bias, cout=cout, part_specs=specs, part_pf=flags
        )
        ypf, new_lk = drt_stack_packed_from_pf(
            xpf, par, blocks, h=h, w=w, th=th, unpack=False,
            key_select=(lk, kf),
        )
        if head is None:
            return ypf, new_lk
        y = head_pf(ypf, head[0], head[1], head[2], head[3], h, w)
        return ypf, y, new_lk

    def _compose(parts, kernel, bias, par, blocks, head, lk, kf, align_gate):
        out = _xla_input_stack_compose(
            parts, kernel, bias, par, blocks, align_gate,
            part_pf=part_pf if pf_in else None, h=h, w=w,
        )
        opf = pack_pf(out, th=PAD_R)
        new_lk = jnp.where(
            kf.astype(jnp.float32).reshape(-1, 1, 1, 1) > 0.5, opf, lk
        )
        if head is None:
            return opf, new_lk
        return opf, _xla_head(out, head), new_lk

    if not gated:

        @jax.custom_vjp
        def f(parts, kernel, bias, par, blocks, head, lk, kf):
            return _fused(parts, kernel, bias, par, blocks, head, lk, kf, None)

        def fwd(parts, kernel, bias, par, blocks, head, lk, kf):
            return f(parts, kernel, bias, par, blocks, head, lk, kf), (
                parts, kernel, bias, par, blocks, head, lk, kf,
            )

        def bwd(res, g):
            parts, kernel, bias, par, blocks, head, lk, kf = res
            if with_head:
                _, vjp = jax.vjp(
                    lambda p, k, b2, pr, bl, hd, l: _compose(
                        p, k, b2, pr, bl, hd, l, kf, None
                    ),
                    parts, kernel, bias, par, blocks, head, lk,
                )
                return vjp(g) + (jnp.zeros_like(kf),)
            _, vjp = jax.vjp(
                lambda p, k, b2, pr, bl, l: _compose(
                    p, k, b2, pr, bl, None, l, kf, None
                ),
                parts, kernel, bias, par, blocks, lk,
            )
            dp, dk, db, dpr, dbl, dl = vjp(g)
            return dp, dk, db, dpr, dbl, None, dl, jnp.zeros_like(kf)

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def fg(parts, kernel, bias, par, blocks, head, lk, kf, align_gate):
        return _fused(parts, kernel, bias, par, blocks, head, lk, kf,
                      align_gate)

    def fwd_g(parts, kernel, bias, par, blocks, head, lk, kf, align_gate):
        return fg(parts, kernel, bias, par, blocks, head, lk, kf,
                  align_gate), (
            parts, kernel, bias, par, blocks, head, lk, kf, align_gate,
        )

    def bwd_g(res, g):
        parts, kernel, bias, par, blocks, head, lk, kf, align_gate = res
        if with_head:
            _, vjp = jax.vjp(
                lambda p, k, b2, pr, bl, hd, l: _compose(
                    p, k, b2, pr, bl, hd, l, kf, align_gate
                ),
                parts, kernel, bias, par, blocks, head, lk,
            )
            return vjp(g) + (
                jnp.zeros_like(kf), jnp.zeros_like(align_gate),
            )
        _, vjp = jax.vjp(
            lambda p, k, b2, pr, bl, l: _compose(
                p, k, b2, pr, bl, None, l, kf, align_gate
            ),
            parts, kernel, bias, par, blocks, lk,
        )
        dp, dk, db, dpr, dbl, dl = vjp(g)
        return (dp, dk, db, dpr, dbl, None, dl, jnp.zeros_like(kf),
                jnp.zeros_like(align_gate))

    fg.defvjp(fwd_g, bwd_g)
    return fg


def make_trainable_input_stack_head(
    th: int, h: int, w: int, cout: int, gated: bool = False,
    part_pf=None, pf_out: bool = False,
):
    """``f(parts, kernel, bias, par, blocks, head[, align_gate])`` ->
    ``(out, y)``: the fused input conv + PF stack + packed reconstruction
    head. ``out`` is the unpacked stack feature (the sweep carry);
    ``y = conv_last(lrelu(conv_hr(out)))`` WITHOUT the +lr residual.
    Keeping the head inside Pallas keeps the scan-xs lrs stack away from the
    XLA head convs' gather-style layouts (a 42.7x HBM padding expansion on
    the (t,b,h,w,3) buffer, found in the b=2 OOM allocation dump).
    Forward is Pallas; the VJP re-derives through the numerically identical
    XLA composition. ``head`` = (hr_kernel, hr_bias, last_kernel, last_bias).
    ``part_pf`` marks PF-layout parts; ``pf_out=True`` returns ``out`` as
    the raw PF stack output (the PF-resident carry) instead of unpacking.
    """
    part_pf = list(part_pf) if part_pf is not None else None
    pf_in = part_pf is not None and any(part_pf)

    def _fused(parts, kernel, bias, par, blocks, head, align_gate):
        if align_gate is not None:
            arrs, specs = _part_specs_for_gate(parts, align_gate, part_pf)
            flags = _gate_pf_flags(part_pf) if pf_in else None
        else:
            arrs, specs = list(parts), None
            flags = part_pf if pf_in else None
        xpf = input_conv_pf(
            arrs, kernel, bias, cout=cout, part_specs=specs, part_pf=flags
        )
        ypf = drt_stack_packed_from_pf(
            xpf, par, blocks, h=h, w=w, th=th, unpack=False
        )
        out = ypf if pf_out else unpack_pf(ypf, h, w)
        y = head_pf(ypf, head[0], head[1], head[2], head[3], h, w)
        return out, y

    def _compose(parts, kernel, bias, par, blocks, head, align_gate):
        out = _xla_input_stack_compose(
            parts, kernel, bias, par, blocks, align_gate,
            part_pf=part_pf if pf_in else None, h=h, w=w,
        )
        y = _xla_head(out, head)
        return (pack_pf(out, th=PAD_R) if pf_out else out), y

    if not gated:

        @jax.custom_vjp
        def f(parts, kernel, bias, par, blocks, head):
            return _fused(parts, kernel, bias, par, blocks, head, None)

        def fwd(parts, kernel, bias, par, blocks, head):
            return f(parts, kernel, bias, par, blocks, head), (
                parts, kernel, bias, par, blocks, head,
            )

        def bwd(res, g):
            parts, kernel, bias, par, blocks, head = res
            _, vjp = jax.vjp(
                lambda p, k, b2, pr, bl, hd: _compose(p, k, b2, pr, bl, hd, None),
                parts, kernel, bias, par, blocks, head,
            )
            return vjp(g)

        f.defvjp(fwd, bwd)
        return f

    @jax.custom_vjp
    def fg(parts, kernel, bias, par, blocks, head, align_gate):
        return _fused(parts, kernel, bias, par, blocks, head, align_gate)

    def fwd_g(parts, kernel, bias, par, blocks, head, align_gate):
        return fg(parts, kernel, bias, par, blocks, head, align_gate), (
            parts, kernel, bias, par, blocks, head, align_gate,
        )

    def bwd_g(res, g):
        parts, kernel, bias, par, blocks, head, align_gate = res
        _, vjp = jax.vjp(
            lambda p, k, b2, pr, bl, hd: _compose(
                p, k, b2, pr, bl, hd, align_gate
            ),
            parts, kernel, bias, par, blocks, head,
        )
        return vjp(g) + (jnp.zeros_like(align_gate),)

    fg.defvjp(fwd_g, bwd_g)
    return fg


# ---- expert premix: hoist the per-step expert mixing out of the scan ------


def premix_block_params(weights_t, gammas_t, bank, bias_bank, dtype):
    """Mix + pack ONE block's expert-routed dynamic conv for ALL frames at
    once: (t,b,E) routing x (E,3,3,c,c) bank -> A/B-packed per-frame params
    {wa2, wb2 (t,b,3,2c,2c) ``dtype``; b2, g (t,b,1,2c) fp32}.

    Motivation (xplane trace): mixing inside the scan re-reads every
    block's full fp32 expert bank (9.4 MB x 16 banks) each frame and
    re-packs per step; hoisting turns that into ONE bank read per window,
    with the scan streaming only the tiny mixed kernels as xs.
    """
    mixed = jnp.einsum(
        "tbe,eyxio->tbyxio", weights_t, bank,
        preferred_element_type=jnp.float32,
    )
    biases = jnp.einsum(
        "tbe,ec->tbc", weights_t, bias_bank, preferred_element_type=jnp.float32
    )
    w2 = jax.vmap(jax.vmap(pack_conv3x3_kernel_per_tap))(mixed).astype(dtype)
    b2 = jnp.concatenate([biases] * 2, -1)[:, :, None, :]
    g = jnp.concatenate([gammas_t.astype(jnp.float32)] * 2, -1)[:, :, None, :]
    return dict(w2=w2, b2=b2, g=g)


def premix_zeros(t, b, c, dtype):
    """Shape-only placeholder for init passes (params not created yet)."""
    c2 = 2 * c
    return dict(
        w2=jnp.zeros((t, b, 3, 3, c2, c2), dtype),
        b2=jnp.zeros((t, b, 1, c2), jnp.float32),
        g=jnp.ones((t, b, 1, c2), jnp.float32),
    )


def _static_params_packed(blk, b, c2, dtype):
    """pk/w1/b1 for a PREPACKED block dict (raw par/conv1 entries)."""
    pk = jnp.broadcast_to(
        _pack_pk(blk["par_kernel"].astype(dtype))[None], (b, 3, c2, c2)
    )
    w1 = jnp.broadcast_to(
        pack_conv3x3_kernel_per_tap(blk["conv1_kernel"].astype(dtype))[None],
        (b, 3, 3, c2, c2),
    )
    b1 = jnp.broadcast_to(
        jnp.concatenate([blk["conv1_bias"]] * 2).reshape(1, 1, c2), (b, 1, c2)
    )
    return pk, w1, b1


def _unpack_pertap_kernel(w2):
    """Inverse of pack_conv3x3_kernel_per_tap: (b, 3, 3, 2c, 2co) ->
    (b, 3, 3, c, co) HWIO kernels, read from the dense k=1 slot (for the
    XLA VJP composition)."""
    c = w2.shape[3] // 2
    co = w2.shape[4] // 2
    k1s = w2[:, :, 1]
    k0 = k1s[:, :, 0:c, co:]
    k1 = k1s[:, :, 0:c, 0:co]
    k2 = k1s[:, :, c:, 0:co]
    return jnp.stack([k0, k1, k2], axis=2)


def _as_unpacked_block(blk):
    """Prepacked block dict -> the unpacked form _xla_block_compose eats."""
    if "w2" not in blk:
        return blk
    c = blk["w2"].shape[3] // 2
    return dict(
        dyn_kernels=_unpack_pertap_kernel(blk["w2"]),
        dyn_biases=blk["b2"][:, 0, :c],
        gamma=blk["g"][:, 0, :c],
        par_kernel=blk["par_kernel"],
        conv1_kernel=blk["conv1_kernel"],
        conv1_bias=blk["conv1_bias"],
    )
