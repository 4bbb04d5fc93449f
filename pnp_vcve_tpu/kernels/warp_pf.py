"""Banded PF-native block8 warp: the MV warp as MXU selection-matrix
matmuls — no gather anywhere.

Replaces the XLA block8 gather (ops/warp.py:_warp_single_block8, measured
22.3 ms/frame of warp+fallout at 720p: XLA lowers the 14400-slice window
gather to a serial slice loop at ~2 us/slice) for flows constant over the
8x8 macroblock grid (the MV rasterizer's output) with |MV| <= 16 px (the
H.264 search range; reference flow_warp semantics
mmedit/models/common/flow_warp.py:6-50).

Design (one 8-row output band at a time, 48-row source band):

* The carry stays in the stack's pixel-pair-packed PF layout
  (b, h+16, w/2+16, 128): lanes = [even-px c | odd-px c].  The band DMA
  reads 48 contiguous PF rows — sequential, full-bandwidth (and Mosaic's
  async-copy requires the 128-lane minor: 64-lane DMAs crash the
  compile-helper, tools/warp_bisect.py).

* H pass = TWO MXU dots per (row, 128-pair tile).  For a per-block
  integer shift d = 2*delta + odd and fraction wx, the packed bilinear
  select splits by construction into
      out = S_same @ Z + S_x @ Zmix
  where (derived per-plane; E2E==O2O and E2O[k,m]==O2E[k,m-1]):
      S_same[k, .] = even d: wx0 @ (k+delta)   | odd d: wx1 @ (k+delta+1)
      S_x[k, .]    = even d: wx1 @ (k+delta)   | odd d: wx0 @ (k+delta)
      Zmix[m]      = lanes<64: (Z @ P)[m]  (= odd plane of pair m)
                     lanes>=64: (Z @ P)[m+1] (= even plane of pair m+1)
  with P the 128x128 half-lane-swap permutation (one extra dot per band
  row; Mosaic has no lane-offset concat, kernels/drt_stack.py:_cross_pair).
  S matrices are built OUTSIDE the kernel from the block flows (one-hot
  selects, ~35 MB streamed per 720p frame) so the kernel sees only static
  shapes and static window slices — the dynamic shift lives in S's values.

* V pass = dense masked select over the 48 band rows: out[i] =
  sum_d vm[:, d] * hband[d + i]; vm has 2 nonzero lanes per column
  (floor(dy)+20 and +1).  Because out-of-image band rows/cols are
  structurally ZERO (band zero-fill + the PF pad ring), grid_sample's
  zeros padding needs no validity masks at all: invalid taps multiply 0.

Exactness contract: bit-identical semantics to ops.flow_warp
(impl='block8') for block-constant flows with |MV| <= 16 (builder clamps
beyond — callers keep the XLA block8 path for larger motion).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "build_warp_tables", "build_warp_tables_compact", "warp_pf",
    "warp_pf_compact", "flow_warp_pf", "warp_pf_geometry",
]

BAND = 48      # source rows per 8-row out band: 8 + 2*20 (|dy|<=16 + taps)
PAD_Y = 20     # band starts 20 orig rows above the out band
DV = 40        # dense V terms: d = floor(dy) + 20 in [4, 36] (+1 tap)
BOFF = 24      # band col of interior pair j = j + BOFF (8 PF pad + 16 off)
MAX_MV = 16.0


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def warp_pf_geometry(h: int, w: int, tile: int):
    """(wh, nt, kw, kwp, wb, hp, wp) for the banded PF warp."""
    if h % 8 or w % 16:
        raise ValueError(f"need h%8==0 and w%16==0, got {h}x{w}")
    wh = w // 2
    if wh % tile:
        raise ValueError(f"tile {tile} must divide wh {wh}")
    nt = wh // tile
    kw = tile + 40           # window cols: m in [16, tile+32] (+1 odd tap)
    kwp = _round_up(kw, 128)  # stored lane-padded for clean streaming
    wb = wh + 48             # band width: PF row at [16, wh+48-16), zeros out
    hp = h + 16              # PF rows (asserted against the input)
    wp = wh + 16             # PF cols
    return wh, nt, kw, kwp, wb, hp, wp


def build_warp_tables(flow: jnp.ndarray, h: int, w: int, tile: int = 128):
    """Selection tables from full-res block-constant flows.

    Args:
      flow: (b, h, w, 2) pixel-space (dx, dy), constant per 8x8 block
        (sampled at block top-left, as ops/warp.py block8 does).
    Returns:
      (s_same, s_x, vm): (b, nby, nt, tile, kwp) x2 and (b, nby, wh, 128)
      float32 one-hot-weighted selection tables.
    """
    b = flow.shape[0]
    wh, nt, kw, kwp, _, _, _ = warp_pf_geometry(h, w, tile)
    nby = h // 8

    fb = flow[:, ::8, ::8].astype(jnp.float32)  # (b, nby, nbx, 2)
    fx = jnp.clip(fb[..., 0], -MAX_MV, MAX_MV)
    fy = jnp.clip(fb[..., 1], -MAX_MV, MAX_MV)
    dx = jnp.floor(fx)
    wx = fx - dx
    dy = jnp.floor(fy)
    wy = fy - dy

    dxi = dx.astype(jnp.int32)
    delta = jnp.floor_divide(dxi, 2)
    odd = dxi - 2 * delta  # 0/1 (floor_divide rounds toward -inf)

    # per out pair (4 pairs per 8-px block)
    rep = lambda a: jnp.repeat(a, 4, axis=-1)  # (b, nby, wh)
    delta_p, odd_p = rep(delta), rep(odd)
    wx0_p, wx1_p = rep(1.0 - wx), rep(wx)

    k_local = (jnp.arange(wh, dtype=jnp.int32) % tile).reshape(1, 1, wh)
    m_x = k_local + delta_p + BOFF          # S_x column (and even S_same)
    m_same = m_x + odd_p                    # odd d shifts the S_same tap
    val_same = jnp.where(odd_p == 1, wx1_p, wx0_p)
    val_x = jnp.where(odd_p == 1, wx0_p, wx1_p)

    oh = lambda iota, col, val: jnp.where(
        iota == col[..., None], val[..., None], 0.0
    )
    iota_m = jnp.arange(kwp, dtype=jnp.int32)
    s_same = oh(iota_m, m_same, val_same).reshape(b, nby, nt, tile, kwp)
    s_x = oh(iota_m, m_x, val_x).reshape(b, nby, nt, tile, kwp)

    dloc = rep(dy.astype(jnp.int32)) + PAD_Y  # in [4, 36]
    wy0_p, wy1_p = rep(1.0 - wy), rep(wy)
    iota_d = jnp.arange(128, dtype=jnp.int32)
    vm = oh(iota_d, dloc, wy0_p) + oh(iota_d, dloc + 1, wy1_p)  # (b, nby, wh, 128)
    return s_same, s_x, vm


def build_warp_tables_compact(flow: jnp.ndarray, h: int, w: int, tile: int = 128):
    """Compact per-pair selection table for the in-kernel one-hot build.

    The dense S/vm tables of :func:`build_warp_tables` carry <= 2 nonzeros
    per row; building them in XLA and streaming them into the kernel costs
    ~60 MB of HBM writes+reads per 720p frame (xplane:
    broadcast_select/pad fusions). This emits only the nonzero structure —
    8 f32 lanes per output pair — and :func:`warp_pf_compact` expands the
    one-hot rows on the VPU inside the kernel, where they are consumed.

    Returns:
      tbl: (b, nby, wh, 8) f32 = [m_same, val_same, m_x, val_x,
            dloc, wy0, wy1, 0] per out pair (column indices are exact
            small ints stored as f32; see the S/vm derivation in
            :func:`build_warp_tables`).
    """
    b = flow.shape[0]
    wh, _, _, _, _, _, _ = warp_pf_geometry(h, w, tile)
    nby = h // 8

    fb = flow[:, ::8, ::8].astype(jnp.float32)  # (b, nby, nbx, 2)
    fx = jnp.clip(fb[..., 0], -MAX_MV, MAX_MV)
    fy = jnp.clip(fb[..., 1], -MAX_MV, MAX_MV)
    dx = jnp.floor(fx)
    wx = fx - dx
    dy = jnp.floor(fy)
    wy = fy - dy

    dxi = dx.astype(jnp.int32)
    delta = jnp.floor_divide(dxi, 2)
    odd = dxi - 2 * delta

    rep = lambda a: jnp.repeat(a, 4, axis=-1)  # (b, nby, wh)
    delta_p, odd_p = rep(delta), rep(odd)
    wx0_p, wx1_p = rep(1.0 - wx), rep(wx)

    k_local = (jnp.arange(wh, dtype=jnp.int32) % tile).reshape(1, 1, wh)
    m_x = k_local + delta_p + BOFF
    m_same = m_x + odd_p
    val_same = jnp.where(odd_p == 1, wx1_p, wx0_p)
    val_x = jnp.where(odd_p == 1, wx0_p, wx1_p)

    dloc = rep(dy.astype(jnp.int32)) + PAD_Y
    wy0_p, wy1_p = rep(1.0 - wy), rep(wy)
    return jnp.stack(
        [
            m_same.astype(jnp.float32), val_same,
            m_x.astype(jnp.float32), val_x,
            dloc.astype(jnp.float32), wy0_p, wy1_p,
            jnp.zeros_like(val_x),
        ],
        axis=-1,
    )


NSLOT = 10  # circular chunk slots: a band spans 7 chunks, +3 prefetch depth


def _kernel(
    *refs,
    nby, wh, tile, nt, kw, wb, hp, wp, stages=("swap", "h", "v"),
    compact=False,
):
    # compact=True: ONE (1,1,wh,8) compact-table ref replaces the dense
    # (sm, vm) pair; one-hot selection rows are built on the VPU right
    # where they are consumed (build_warp_tables_compact docstring).
    if compact:
        tbl_ref, zpf_hbm, o_ref, chunks, zmix, hband, rhs, sems = refs
        sm_ref = vm_ref = None
    else:
        sm_ref, vm_ref, zpf_hbm, o_ref, chunks, zmix, hband, rhs, sems = refs
        tbl_ref = None
    """Rolling-chunk band pipeline: the source band of out band t is PF
    rows [8t-12, 8t+36) = PF-aligned 8-row chunks t-2..t+4; consecutive
    bands share 6 of those 7, so each grid step DMAs ONE new chunk into an
    8-slot circular buffer (6x less HBM read than per-band 48-row DMAs —
    tools/warp_pf_stages.py measured the full-band DMA floor at 2.76 ms).
    Out-of-range chunks (top/bottom halo) are zero-filled whole."""
    bi = pl.program_id(0)
    rp = pl.program_id(1)  # out band t = rp - 1
    dtype = o_ref.dtype
    nchunks = hp // 8  # valid PF chunks (PF pad rows are real zero rows)

    def issue_chunk(k, do_start: bool):
        # k may be traced; validity is a traced predicate
        slot = jax.lax.rem(k + NSLOT, NSLOT)
        valid = (k >= 0) & (k < nchunks)
        d = pltpu.make_async_copy(
            zpf_hbm.at[bi, pl.ds(8 * jnp.maximum(k, 0), 8)],
            chunks.at[slot, :, pl.ds(16, wp)],
            sems.at[slot],
        )
        if do_start:
            @pl.when(valid)
            def _():
                d.start()

            @pl.when(~valid)
            def _():
                chunks[slot, :, 16 : 16 + wp] = jnp.zeros(
                    (8, wp, 128), dtype
                )
        else:
            @pl.when(valid)
            def _():
                d.wait()

    @pl.when(rp == 0)
    def _():
        # side-column zeros once per batch item; chunk DMAs never touch
        # them, edge chunks rewrite the full width
        chunks[:, :, 0:16] = jnp.zeros((NSLOT, 8, 16, 128), dtype)
        chunks[:, :, 16 + wp :] = jnp.zeros(
            (NSLOT, 8, wb - 16 - wp, 128), dtype
        )
        for k in range(-2, 7):  # band 0's chunks + 2 bands of prefetch
            issue_chunk(jnp.int32(k), True)

    t = rp - 1

    @pl.when((rp >= 1) & (rp < nby))
    def _():
        issue_chunk(t + 7, True)  # prefetch for band t+3 (3-deep)

    @pl.when((rp == 0) | (rp == nby + 1))
    def _():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    @pl.when((rp > 0) & (rp < nby + 1))
    def _():
        @pl.when(rp == 1)
        def _():
            for k in range(0, 5):
                issue_chunk(jnp.int32(k), False)

        @pl.when(rp > 1)
        def _():
            issue_chunk(t + 4, False)

        if "swap" in stages:
            # ---- Zmix: half-lane swap (MXU) + one-sublane shift select.
            # Per GLOBAL row, so it rolls with the chunks: only the newly
            # landed chunk is swapped each step (6x less work than
            # re-swapping the whole band).
            ri_ = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            ci_ = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            perm = (jnp.abs(ri_ - ci_) == 64).astype(dtype)
            lane = jax.lax.broadcasted_iota(jnp.int32, (wb, 128), 1)

            def swap_chunk(k):
                slot = jax.lax.rem(k + NSLOT, NSLOT)
                for row in range(8):
                    zr = jax.lax.dot_general(
                        chunks[slot, row], perm, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(dtype)
                    zsh = jnp.concatenate(
                        [zr[1:], jnp.zeros((1, 128), dtype)], axis=0
                    )
                    zmix[slot, row] = jnp.where(lane < 64, zr, zsh)

            @pl.when(rp == 1)
            def _():
                for k in range(-2, 4):
                    swap_chunk(jnp.int32(k))

            swap_chunk(t + 4)

        if "h" in stages:
            # ---- H pass: ONE merged selection dot per (tile, row-group):
            # S_m = [S_same | S_x] (lanes [0:kw] and [kw:2kw], built in the
            # wrapper) against RHS = [Z window ; Zmix window] stacked along
            # K — 3 K-passes instead of the 2-dot form's 2+2 AND the S
            # weights stay MXU-resident across a tile's whole row loop
            # (alternating ss/sx dots reloaded them every dot). R=8 band
            # rows lane-batched per dot (was 4): half the loop/dot count,
            # same MXU row volume. History: per-row dots 4.3 ms -> R=4
            # two-dot 3.15 ms -> this form (tools/warp_pf_stages.py).
            R = 8  # BAND % R == 0

            def rowslc(buf, r, c0, cn):
                # hband row r <-> PF row gg - 16 <-> chunk gg//8 - 2
                gg = 8 * t + 4 + r
                return buf[
                    jax.lax.rem(gg // 8 - 2 + NSLOT, NSLOT),
                    jax.lax.rem(gg, 8),
                    pl.ds(c0, cn),
                ]

            for tj in range(nt):
                ws = tj * tile
                if compact:
                    ci = jax.lax.broadcasted_iota(
                        jnp.int32, (tile, 2 * kw), 1
                    )
                    col = lambda j, ws=ws: tbl_ref[
                        0, 0, ws : ws + tile, j : j + 1
                    ]
                    sm = (
                        jnp.where(ci == col(0).astype(jnp.int32), col(1), 0.0)
                        + jnp.where(
                            ci == kw + col(2).astype(jnp.int32), col(3), 0.0
                        )
                    ).astype(dtype)
                else:
                    sm = sm_ref[0, 0, tj, :, 0 : 2 * kw]

                def h_body(g, _, ws=ws, sm=sm):
                    r = g * R
                    for i in range(R):
                        rhs[pl.ds(0, kw), i * 128 : (i + 1) * 128] = rowslc(
                            chunks, r + i, ws, kw
                        )
                        rhs[pl.ds(kw, kw), i * 128 : (i + 1) * 128] = rowslc(
                            zmix, r + i, ws, kw
                        )
                    t12 = jax.lax.dot_general(
                        sm, rhs[...], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).astype(dtype)
                    for i in range(R):
                        hband[r + i, ws : ws + tile] = t12[
                            :, i * 128 : (i + 1) * 128
                        ]
                    return 0

                jax.lax.fori_loop(0, BAND // R, h_body, 0)

        if "v" in stages:
            # ---- V pass: dense masked select (2 live terms per column)
            if compact:
                li = jax.lax.broadcasted_iota(jnp.int32, (wh, 128), 1)
                dl = tbl_ref[0, 0, :, 4:5].astype(jnp.int32)
                # cast to the carry dtype so numerics are bit-identical to
                # the dense-table path (whose vm is pre-cast in the wrapper)
                vmv = (
                    jnp.where(li == dl, tbl_ref[0, 0, :, 5:6], 0.0)
                    + jnp.where(li == dl + 1, tbl_ref[0, 0, :, 6:7], 0.0)
                ).astype(dtype)
            acc = jnp.zeros((8, wh, 128), jnp.float32)
            for d in range(DV):
                wv = (
                    vmv[:, d : d + 1] if compact
                    else vm_ref[0, 0, :, d : d + 1]
                )  # (wh, 1)
                acc = acc + hband[d : d + 8].astype(jnp.float32) * wv[None]
        else:
            acc = hband[0:8].astype(jnp.float32)

        o_ref[0, :, 0:8] = jnp.zeros((8, 8, 128), dtype)
        o_ref[0, :, 8 : 8 + wh] = acc.astype(dtype)
        o_ref[0, :, 8 + wh :] = jnp.zeros((8, wp - 8 - wh, 128), dtype)


@functools.partial(jax.jit, static_argnames=("h", "w", "tile", "stages"))
def warp_pf(zpf, s_same, s_x, vm, h: int, w: int, tile: int = 128,
            stages=("swap", "h", "v")):
    """Warp a PF carry by prebuilt selection tables -> PF result.

    Args:
      zpf: (b, h+16, wh+16, 128) PF feature map (kernels/drt_stack.py
        layout, th=8-compatible: HP == h + 16).
      s_same, s_x, vm: from :func:`build_warp_tables` (cast to zpf dtype).
    """
    b, hp_in, wp_in, c2 = zpf.shape
    wh, nt, kw, kwp, wb, hp, wp = warp_pf_geometry(h, w, tile)
    if (hp_in, wp_in, c2) != (hp, wp, 128):
        raise ValueError(
            f"PF shape {zpf.shape} != geometry {(hp, wp, 128)} for {h}x{w}"
        )
    nby = h // 8
    dtype = zpf.dtype
    kern = functools.partial(
        _kernel, nby=nby, wh=wh, tile=tile, nt=nt, kw=kw, wb=wb, hp=hp, wp=wp,
        stages=stages,
    )
    # merged selection table [S_same | S_x] at lanes [0:kw] / [kw:2kw]
    # (kernel H-pass docstring); kwp2 keeps the stored table lane-padded
    kwp2 = _round_up(2 * kw, 128)
    s_m = jnp.concatenate(
        [
            s_same.reshape(b, nby, nt, tile, kwp)[..., :kw],
            s_x.reshape(b, nby, nt, tile, kwp)[..., :kw],
        ],
        axis=-1,
    )
    s_m = jnp.pad(s_m, ((0, 0),) * 4 + ((0, kwp2 - 2 * kw),)).astype(dtype)
    cl = lambda r: jnp.clip(r - 1, 0, nby - 1)
    return pl.pallas_call(
        kern,
        grid=(b, nby + 2),
        in_specs=[
            pl.BlockSpec((1, 1, nt, tile, kwp2),
                         lambda bi, r: (bi, cl(r), 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, wh, 128), lambda bi, r: (bi, cl(r), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, wp, 128), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 8, wb, 128), dtype),   # rolling chunks
            pltpu.VMEM((NSLOT, 8, wb, 128), dtype),   # rolling zmix
            pltpu.VMEM((BAND, wh, 128), dtype),       # hband
            pltpu.VMEM((2 * kw, 8 * 128), dtype),     # merged H rhs
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(
        s_m,
        vm.reshape(b, nby, wh, 128).astype(dtype),
        zpf,
    )


@functools.partial(jax.jit, static_argnames=("h", "w", "tile", "stages"))
def warp_pf_compact(zpf, tbl, h: int, w: int, tile: int = 128,
                    stages=("swap", "h", "v")):
    """:func:`warp_pf` with the compact table: one (b, nby, wh, 8) f32
    input from :func:`build_warp_tables_compact`; selection one-hots are
    expanded in-kernel (saves ~60 MB/frame of dense-table HBM traffic and
    the XLA one-hot construction fusions — numerics are bit-identical to
    the dense path)."""
    b, hp_in, wp_in, c2 = zpf.shape
    wh, nt, kw, kwp, wb, hp, wp = warp_pf_geometry(h, w, tile)
    if (hp_in, wp_in, c2) != (hp, wp, 128):
        raise ValueError(
            f"PF shape {zpf.shape} != geometry {(hp, wp, 128)} for {h}x{w}"
        )
    nby = h // 8
    dtype = zpf.dtype
    kern = functools.partial(
        _kernel, nby=nby, wh=wh, tile=tile, nt=nt, kw=kw, wb=wb, hp=hp, wp=wp,
        stages=stages, compact=True,
    )
    cl = lambda r: jnp.clip(r - 1, 0, nby - 1)
    return pl.pallas_call(
        kern,
        grid=(b, nby + 2),
        in_specs=[
            pl.BlockSpec((1, 1, wh, 8), lambda bi, r: (bi, cl(r), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, wp, 128), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, 128), dtype),
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 8, wb, 128), dtype),   # rolling chunks
            pltpu.VMEM((NSLOT, 8, wb, 128), dtype),   # rolling zmix
            pltpu.VMEM((BAND, wh, 128), dtype),       # hband
            pltpu.VMEM((2 * kw, 8 * 128), dtype),     # merged H rhs
            pltpu.SemaphoreType.DMA((NSLOT,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(tbl.astype(jnp.float32), zpf)


def flow_warp_pf(zpf, flow, h: int, w: int, tile: int = 128):
    """Convenience: tables from ``flow`` + :func:`warp_pf`.

    Default = the DENSE table path. The compact in-kernel build
    (PNP_WARP_TABLES=compact) MEASURED SLOWER at 720p/b=1: 18.82 -> 18.17
    f/s — the (..., 8)-minor compact table is lane-padded 16x in XLA's HBM
    layout (so its stream costs as much as the dense vm), and the per-tile
    VPU one-hot expansion serializes against the H-pass MXU dots, costing
    more than the dense-table pipeline (which Pallas overlaps with
    compute). Kept reachable for shapes where the balance flips."""
    import os

    if os.environ.get("PNP_WARP_TABLES", "dense") == "compact":
        tbl = build_warp_tables_compact(flow, h, w, tile)
        return warp_pf_compact(zpf, tbl, h, w, tile)
    s_same, s_x, vm = build_warp_tables(flow, h, w, tile)
    return warp_pf(zpf, s_same, s_x, vm, h, w, tile)
