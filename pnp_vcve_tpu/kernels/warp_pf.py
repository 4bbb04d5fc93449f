"""Banded PF-native block8 warp: the MV warp as MXU selection-matrix
matmuls — no gather anywhere.

Replaces the XLA block8 gather (ops/warp.py:_warp_single_block8, measured
22.3 ms/frame of warp+fallout at 720p: XLA lowers the 14400-slice window
gather to a serial slice loop at ~2 us/slice) for flows constant over the
8x8 macroblock grid (the MV rasterizer's output) with |MV| <= 16 px (the
H.264 search range; reference flow_warp semantics
mmedit/models/common/flow_warp.py:6-50).

Design (one 8-row output band at a time):

* The carry stays in the stack's pixel-pair-packed PF layout
  (b, h+16, w/2+16, 128): lanes = [even-px c | odd-px c].  Source rows
  roll through an NSLOT circular chunk buffer — each band DMAs ONE new
  8-row PF chunk (sequential, full-bandwidth; Mosaic's async-copy
  requires the 128-lane minor, tools/warp_bisect.py).

* Per landed chunk, a one-time PREP re-stages the 8 rows row-in-lanes:
      zT[slot][:, i*128:(i+1)*128]    = chunk row i          (copy)
      zmixT[slot][:, i*128:(i+1)*128] = Zmix of chunk row i  (MXU swap)
  where Zmix is the packed cross-pair plane
      Zmix[m] = lanes<64: (Z @ P)[m]   (= odd plane of pair m)
                lanes>=64: (Z @ P)[m+1] (= even plane of pair m+1)
  with P the 128x128 half-lane-swap permutation (Mosaic has no
  lane-offset concat, kernels/drt_stack.py:_cross_pair).  Row-in-lanes
  staging makes each H dot slice its operand DIRECTLY out of the prep
  buffers: the earlier design staged 480 per-band window copies into a
  dot scratch (measured ~0.8 ms/warp of VPU copy overhead on top of the
  1.2 ms MXU floor).

* H pass = TWO MXU dots per (row-group, 128-pair tile).  For a per-block
  integer shift d = 2*delta + odd and fraction wx, the packed bilinear
  select splits by construction into
      out = S_same @ Z + S_x @ Zmix
  where (derived per-plane; E2E==O2O and E2O[k,m]==O2E[k,m-1]):
      S_same[k, .] = even d: wx0 @ (k+delta)   | odd d: wx1 @ (k+delta+1)
      S_x[k, .]    = even d: wx1 @ (k+delta)   | odd d: wx0 @ (k+delta)
  S column indices are window-relative (window = band cols
  [ws+16, ws+16+kw), kw = tile+24 — the tight span of k+delta+odd+8).
  Because the V pass only consumes band rows [4, 44) (see below), the
  5 row-groups of a band are chunk-ALIGNED: group g is exactly chunk
  t-1+g rows 0..7, so a group's dot operand is one static sublane slice
  of zT/zmixT[slot].  Results land lane-major in hbandT (wh, 40*128):
  lane block r*128 holds band row 4+r — ONE store per (group, tile).
  S matrices are built OUTSIDE the kernel from the block flows (one-hot
  selects) so the kernel sees only static shapes and static window
  slices — the dynamic shift lives in S's values.

* V pass = radix-8 two-phase masked select over the 40 live band rows.
  The y tap rows are dloc = floor(dy)+20 in [4, 36] and dloc+1; writing
  dloc-4 = 8a + r (a in [0,5), r in [0,8)):
      phase A (coarse, selection only):  cb[s] = sum_a A[., a] * hbandT
                row (8a+s),  s in [0,16)  — exact copies (A is 0/1)
      phase B (fine, the bilinear blend): out[i] = sum_r' B[., r'] *
                cb[r'+i],  r' in [0,9),  B = {wy0 @ r, wy1 @ r+1}
  72+72 dense VPU MACs/column vs the flat form's 320 (one dense 40-term
  select per out row).  Phase A skips a=4 for s>=8: the only consumer is
  the dloc=36 (dy=+16) wy1 tap, whose weight is exactly 0 by the clamp.
  Because out-of-image band rows/cols are structurally ZERO (chunk
  zero-fill + the PF pad ring), grid_sample's zeros padding needs no
  validity masks at all: invalid taps multiply 0.

Exactness contract: bit-identical semantics to ops.flow_warp
(impl='block8') for block-constant flows with |MV| <= 16 (builder clamps
beyond — callers keep the XLA block8 path for larger motion).  Every
selection table row has <= 2 nonzeros, so any dot/association order
produces the same rounded sum (two-term sums round identically).
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
HROWS = 40     # live band rows [4, 44): the only ones V can read
PAD_X = 16     # window starts 16 band cols right of the tile origin
SOFF = 8       # S column base: m = k + delta + SOFF, window-relative
MAX_MV = 16.0
CBS = 16       # V phase-A outputs: s = r + i + {0,1} in [0, 16)
NSLOT = 10     # circular chunk slots: a band spans 5 chunks, +3 prefetch


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
    kw = tile + 24           # window cols: m in [0, tile+18) (+slack to x8)
    kwp = _round_up(kw, 128)  # stored lane-padded for clean streaming
    wb = wh + 48             # band width: PF row at [16, wh+48-16), zeros out
    hp = h + 16              # PF rows (asserted against the input)
    wp = wh + 16             # PF cols
    return wh, nt, kw, kwp, wb, hp, wp


def _flow_to_terms(flow, h, w):
    """Shared table-build front end: per-out-pair shift/blend scalars."""
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
    dloc = rep(dy.astype(jnp.int32)) + PAD_Y  # in [4, 36]
    wy0_p, wy1_p = rep(1.0 - wy), rep(wy)
    return delta_p, odd_p, wx0_p, wx1_p, dloc, wy0_p, wy1_p


def build_warp_tables(flow: jnp.ndarray, h: int, w: int, tile: int = 128):
    """Selection tables from full-res block-constant flows.

    Args:
      flow: (b, h, w, 2) pixel-space (dx, dy), constant per 8x8 block
        (sampled at block top-left, as ops/warp.py block8 does).
    Returns:
      (s_same, s_x, vt): (b, nby, nt, tile, kwp) x2 window-relative H
      selection tables, and the packed V radix table (b, nby, wh, 128)
      with lanes [0:5) = coarse one-hot at a, [8:17) = {wy0 @ 8+r,
      wy1 @ 9+r} (module docstring, V pass).
    """
    b = flow.shape[0]
    wh, nt, kw, kwp, _, _, _ = warp_pf_geometry(h, w, tile)
    nby = h // 8

    delta_p, odd_p, wx0_p, wx1_p, dloc, wy0_p, wy1_p = _flow_to_terms(
        flow, h, w
    )

    k_local = (jnp.arange(wh, dtype=jnp.int32) % tile).reshape(1, 1, wh)
    m_x = k_local + delta_p + SOFF          # S_x column (and even S_same)
    m_same = m_x + odd_p                    # odd d shifts the S_same tap
    val_same = jnp.where(odd_p == 1, wx1_p, wx0_p)
    val_x = jnp.where(odd_p == 1, wx0_p, wx1_p)

    oh = lambda iota, col, val: jnp.where(
        iota == col[..., None], val[..., None], 0.0
    )
    iota_m = jnp.arange(kwp, dtype=jnp.int32)
    s_same = oh(iota_m, m_same, val_same).reshape(b, nby, nt, tile, kwp)
    s_x = oh(iota_m, m_x, val_x).reshape(b, nby, nt, tile, kwp)

    drel = dloc - 4                         # [0, 32]
    a_col = drel // 8                       # [0, 4]
    r_col = drel - 8 * a_col                # [0, 8)
    iota_d = jnp.arange(128, dtype=jnp.int32)
    vt = (
        oh(iota_d, a_col, jnp.ones_like(wy0_p))
        + oh(iota_d, 8 + r_col, wy0_p)
        + oh(iota_d, 9 + r_col, wy1_p)
    )  # (b, nby, wh, 128)
    return s_same, s_x, vt


def build_warp_tables_compact(flow: jnp.ndarray, h: int, w: int, tile: int = 128):
    """Compact per-pair selection table for the in-kernel one-hot build.

    The dense S/vt tables of :func:`build_warp_tables` carry <= 2 nonzeros
    per row; building them in XLA and streaming them into the kernel costs
    ~60 MB of HBM writes+reads per 720p frame (xplane:
    broadcast_select/pad fusions). This emits only the nonzero structure —
    8 f32 values per output pair — and :func:`warp_pf_compact` expands the
    one-hot rows on the VPU inside the kernel, where they are consumed.

    Layout: FIELDS-ON-SUBLANES, pairs on lanes — (b, nby, 8, wh). The
    round-3 (b, nby, wh, 8) layout streamed as much as the dense vt
    because an 8-lane minor is tile-padded 16x in the HBM layout; with wh
    minor the table is stored dense (1.8 MB/720p frame) and the kernel
    dot-transposes each band's (8, wh) slab to (wh, 8) columns against a
    hoisted identity (selection through the MXU is exact — one-hot rows).

    Returns:
      tbl: (b, nby, 8, wh) f32; sublane j = [m_same, val_same, m_x,
            val_x, dloc, wy0, wy1, 0][j] per out pair (column indices are
            exact small ints stored as f32, window-relative; see the S/vt
            derivation in :func:`build_warp_tables`).
    """
    b = flow.shape[0]
    wh, _, _, _, _, _, _ = warp_pf_geometry(h, w, tile)
    nby = h // 8

    delta_p, odd_p, wx0_p, wx1_p, dloc, wy0_p, wy1_p = _flow_to_terms(
        flow, h, w
    )
    k_local = (jnp.arange(wh, dtype=jnp.int32) % tile).reshape(1, 1, wh)
    m_x = k_local + delta_p + SOFF
    m_same = m_x + odd_p
    val_same = jnp.where(odd_p == 1, wx1_p, wx0_p)
    val_x = jnp.where(odd_p == 1, wx0_p, wx1_p)

    return jnp.stack(
        [
            m_same.astype(jnp.float32), val_same,
            m_x.astype(jnp.float32), val_x,
            dloc.astype(jnp.float32), wy0_p, wy1_p,
            jnp.zeros_like(val_x),
        ],
        axis=-2,
    )


PREFETCH = {1: 3, 2: 2}  # chunk-DMA prefetch depth, in grid steps


def _kernel(
    *refs,
    nby, wh, tile, nt, kw, wb, hp, wp, nb, stages=("swap", "h", "v"),
    compact=False,
):
    # compact=True: ONE (1,nb,wh,8) compact-table ref replaces the dense
    # (sm, vt) pair; one-hot selection rows are built on the VPU right
    # where they are consumed (build_warp_tables_compact docstring).
    if compact:
        (tbl_ref, zpf_hbm, o_ref, chunks, zt, zmixt, hbt, cbt,
         tblc, idm, sems) = refs
        sm_ref = vt_ref = None
    else:
        (sm_ref, vt_ref, zpf_hbm, o_ref,
         chunks, zt, zmixt, hbt, cbt, sems) = refs
        tbl_ref = None
    """Rolling-chunk band pipeline: the (trimmed) source band of out band
    t is PF-aligned 8-row chunks t-1..t+3; consecutive bands share most of
    those, so each grid step DMAs nb new chunks into the circular buffer
    and PREPs each once (zT copy + zmixT swap — module docstring).
    Grid step r covers the nb PADDED band slots t = nb*r - 1 + sl (slot
    t = -1 / nby are the 8-row PF pad rows, written as zeros): batching
    nb=2 bands per step halves the fixed per-step cost (DMA issue /
    semaphore / window bookkeeping — measured ~21 us/step, the dominant
    stage once H+V shrank; tools/warp_pf_stages.py).
    Out-of-range chunks (top/bottom halo) are zero-filled whole."""
    bi = pl.program_id(0)
    rp = pl.program_id(1)
    dep = PREFETCH[nb]
    fw = 1 if nb == 1 else 0  # first grid step with a real band
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

    def prep_chunk(k):
        """Landed chunk -> row-in-lanes zT + swapped zmixT (once each)."""
        slot = jax.lax.rem(k + NSLOT, NSLOT)
        if "h" in stages:
            for i in range(8):
                zt[slot, :, i * 128 : (i + 1) * 128] = chunks[slot, i]
        if "swap" in stages:
            ri_ = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
            ci_ = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
            perm = (jnp.abs(ri_ - ci_) == 64).astype(dtype)
            lane = jax.lax.broadcasted_iota(jnp.int32, (wb, 128), 1)
            for i in range(8):
                zr = jax.lax.dot_general(
                    chunks[slot, i], perm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).astype(dtype)
                zsh = jnp.concatenate(
                    [zr[1:], jnp.zeros((1, 128), dtype)], axis=0
                )
                zmixt[slot, :, i * 128 : (i + 1) * 128] = jnp.where(
                    lane < 64, zr, zsh
                )

    @pl.when(rp == 0)
    def _():
        # side-column zeros once per batch item; chunk DMAs never touch
        # them, edge chunks rewrite the full width
        chunks[:, :, 0:16] = jnp.zeros((NSLOT, 8, 16, 128), dtype)
        chunks[:, :, 16 + wp :] = jnp.zeros(
            (NSLOT, 8, wb - 16 - wp, 128), dtype
        )
        if compact:
            # hoisted identity for the per-band (8, wh) -> (wh, 8)
            # table dot-transpose (module docstring of
            # build_warp_tables_compact)
            ri = jax.lax.broadcasted_iota(jnp.int32, (wh, wh), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (wh, wh), 1)
            idm[...] = (ri == ci).astype(jnp.float32)
        # step-fw chunks + dep steps of prefetch
        for k in range(-1, nb * dep + nb + 2):
            issue_chunk(jnp.int32(k), True)

    @pl.when(rp >= 1)
    def _():
        # prefetch step rp+dep's nb new chunks (invalid -> zero-fill)
        for j in range(nb):
            issue_chunk(nb * (rp + dep) + 2 + j, True)

    @pl.when(rp == fw)
    def _():
        for k in range(-1, nb * fw + nb + 2):
            issue_chunk(jnp.int32(k), False)
        for k in range(-1, nb * fw + nb + 2):
            prep_chunk(jnp.int32(k))

    @pl.when(rp > fw)
    def _():
        for j in range(nb):
            issue_chunk(nb * rp + 2 + j, False)
            prep_chunk(nb * rp + 2 + j)

    def do_band(t, sl):
        """H + V for real band t into o_ref rows [8*sl, 8*sl+8)."""
        if compact:
            # band's compact fields to per-pair columns: (8, wh) -> (wh, 8)
            # (exact: a one-hot selection dot, even through bf16x3 f32)
            tblc[...] = jax.lax.dot_general(
                idm[...], tbl_ref[0, sl], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        if "h" in stages:
            # ---- H pass: two selection dots per (row-group, tile),
            # operands sliced straight out of the prep buffers (module
            # docstring). Group g = chunk t-1+g rows 0..7; hbandT lane
            # block 8g+i holds band row 4+8g+i. History: per-row dots
            # 4.3 ms -> R=4 two-dot 3.15 -> R=8 merged-K staged 2.03 ->
            # this form (tools/warp_pf_stages.py).
            for tj in range(nt):
                ws = tj * tile
                c0 = ws + PAD_X
                if compact:
                    ci = jax.lax.broadcasted_iota(jnp.int32, (tile, kw), 1)
                    col = lambda j, ws=ws: tblc[ws : ws + tile, j : j + 1]
                    lhs_s = jnp.where(
                        ci == col(0).astype(jnp.int32), col(1), 0.0
                    ).astype(dtype)
                    lhs_x = jnp.where(
                        ci == col(2).astype(jnp.int32), col(3), 0.0
                    ).astype(dtype)
                else:
                    lhs_s = sm_ref[0, sl, tj, :, 0:kw]
                    lhs_x = sm_ref[0, sl, tj, :, kw : 2 * kw]
                for g in range(5):
                    slot = jax.lax.rem(t - 1 + g + NSLOT, NSLOT)
                    ts = jax.lax.dot_general(
                        lhs_s, zt[slot, pl.ds(c0, kw)],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    tx = jax.lax.dot_general(
                        lhs_x, zmixt[slot, pl.ds(c0, kw)],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    hbt[ws : ws + tile, g * 1024 : (g + 1) * 1024] = (
                        ts + tx
                    ).astype(dtype)

        if "v" in stages:
            # ---- V pass: radix-8 two-phase select (module docstring)
            if compact:
                li = jax.lax.broadcasted_iota(jnp.int32, (wh, 128), 1)
                dl = tblc[:, 4:5].astype(jnp.int32)
                drel = dl - 4
                a_col = drel // 8
                r_col = drel - 8 * a_col
                one = jnp.ones((wh, 1), jnp.float32)
                # cast to the carry dtype so numerics are bit-identical to
                # the dense-table path (whose vt is pre-cast in the wrapper)
                vt = (
                    jnp.where(li == a_col, one, 0.0)
                    + jnp.where(li == 8 + r_col, tblc[:, 5:6], 0.0)
                    + jnp.where(li == 9 + r_col, tblc[:, 6:7], 0.0)
                ).astype(dtype)
            else:
                vt = vt_ref[0, sl]
            # phase A: coarse one-hot row selection into cb (exact copies)
            for s in range(CBS):
                na = 5 if s < 8 else 4  # a=4,s>=8 rows have weight == 0
                acc = vt[:, 0:1] * hbt[:, s * 128 : (s + 1) * 128]
                for a in range(1, na):
                    r0 = 8 * a + s
                    acc = acc + vt[:, a : a + 1] * hbt[
                        :, r0 * 128 : (r0 + 1) * 128
                    ]
                cbt[:, s * 128 : (s + 1) * 128] = acc
            # phase B: the 2-tap y blend, f32 accumulation
            for i in range(8):
                acc = jnp.zeros((wh, 128), jnp.float32)
                for rr in range(9):
                    s0 = rr + i
                    acc = acc + cbt[
                        :, s0 * 128 : (s0 + 1) * 128
                    ].astype(jnp.float32) * vt[:, 8 + rr : 9 + rr]
                o_ref[0, 8 * sl + i, 8 : 8 + wh] = acc.astype(dtype)
        else:
            for i in range(8):
                o_ref[0, 8 * sl + i, 8 : 8 + wh] = hbt[
                    :, i * 128 : (i + 1) * 128
                ]

    for sl in range(nb):
        t = nb * rp - 1 + sl
        real = (t >= 0) & (t < nby)

        @pl.when(real)
        def _(t=t, sl=sl):
            do_band(t, sl)

        @pl.when(~real)
        def _(sl=sl):
            # padded band slot = 8 PF pad rows: zeros
            o_ref[0, 8 * sl : 8 * sl + 8] = jnp.zeros((8, wp, 128), dtype)

    o_ref[:, :, 0:8] = jnp.zeros((1, 8 * nb, 8, 128), dtype)
    o_ref[:, :, 8 + wh :] = jnp.zeros((1, 8 * nb, wp - 8 - wh, 128), dtype)


def _pick_nb(nby: int) -> int:
    """Bands per grid step: PNP_WARP_NB=2 opts into pair-batched steps
    (requires even nby; falls back to 1). MEASURED at 720p/b=1: nb=2 is
    SLOWER end to end (19.63 vs 20.05 f/s) — halving the step count did
    not beat the per-step pipelining Mosaic already achieves at nb=1, so
    the default is 1. Kept reachable for shapes where the balance flips."""
    import os

    if os.environ.get("PNP_WARP_NB", "1") == "2" and nby % 2 == 0:
        return 2
    return 1


def _scratches(wh, wb, dtype, compact=False):
    s = [
        pltpu.VMEM((NSLOT, 8, wb, 128), dtype),      # rolling chunks (DMA)
        pltpu.VMEM((NSLOT, wb, 8 * 128), dtype),     # zT (row-in-lanes)
        pltpu.VMEM((NSLOT, wb, 8 * 128), dtype),     # zmixT
        pltpu.VMEM((wh, HROWS * 128), dtype),        # hbandT (lane-major)
        pltpu.VMEM((wh, CBS * 128), dtype),          # cbT (V phase A)
    ]
    if compact:
        s += [
            pltpu.VMEM((wh, 8), jnp.float32),        # tblc (fields as cols)
            pltpu.VMEM((wh, wh), jnp.float32),       # hoisted identity
        ]
    return s + [pltpu.SemaphoreType.DMA((NSLOT,))]


@functools.partial(jax.jit, static_argnames=("h", "w", "tile", "stages"))
def warp_pf(zpf, s_same, s_x, vt, h: int, w: int, tile: int = 128,
            stages=("swap", "h", "v")):
    """Warp a PF carry by prebuilt selection tables -> PF result.

    Args:
      zpf: (b, h+16, wh+16, 128) PF feature map (kernels/drt_stack.py
        layout, th=8-compatible: HP == h + 16).
      s_same, s_x, vt: from :func:`build_warp_tables` (cast to zpf dtype).
    """
    b, hp_in, wp_in, c2 = zpf.shape
    wh, nt, kw, kwp, wb, hp, wp = warp_pf_geometry(h, w, tile)
    if (hp_in, wp_in, c2) != (hp, wp, 128):
        raise ValueError(
            f"PF shape {zpf.shape} != geometry {(hp, wp, 128)} for {h}x{w}"
        )
    nby = h // 8
    nb = _pick_nb(nby)  # bands per grid step (kernel docstring)
    dtype = zpf.dtype
    kern = functools.partial(
        _kernel, nby=nby, wh=wh, tile=tile, nt=nt, kw=kw, wb=wb, hp=hp, wp=wp,
        nb=nb, stages=stages,
    )
    # merged selection table [S_same | S_x] at lanes [0:kw] / [kw:2kw]
    # (kernel H-pass docstring); kwp2 keeps the stored table lane-padded.
    # Band dim padded (1,1) so grid step r's nb band slots nb*r-1+sl are
    # one ALIGNED block r of the padded table (the pad fuses into the
    # one-hot build fusion — no extra HBM pass).
    kwp2 = _round_up(2 * kw, 128)
    s_m = jnp.concatenate(
        [
            s_same.reshape(b, nby, nt, tile, kwp)[..., :kw],
            s_x.reshape(b, nby, nt, tile, kwp)[..., :kw],
        ],
        axis=-1,
    )
    s_m = jnp.pad(
        s_m, ((0, 0), (1, 1)) + ((0, 0),) * 2 + ((0, kwp2 - 2 * kw),)
    ).astype(dtype)
    vt_p = jnp.pad(
        vt.reshape(b, nby, wh, 128), ((0, 0), (1, 1), (0, 0), (0, 0))
    ).astype(dtype)
    return pl.pallas_call(
        kern,
        grid=(b, (nby + 2) // nb),
        in_specs=[
            pl.BlockSpec((1, nb, nt, tile, kwp2),
                         lambda bi, r: (bi, r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, wh, 128), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8 * nb, wp, 128),
                               lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, 128), dtype),
        scratch_shapes=_scratches(wh, wb, dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(s_m, vt_p, zpf)


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
    nb = _pick_nb(nby)
    dtype = zpf.dtype
    kern = functools.partial(
        _kernel, nby=nby, wh=wh, tile=tile, nt=nt, kw=kw, wb=wb, hp=hp, wp=wp,
        nb=nb, stages=stages, compact=True,
    )
    tbl_p = jnp.pad(
        tbl.astype(jnp.float32), ((0, 0), (1, 1), (0, 0), (0, 0))
    )
    return pl.pallas_call(
        kern,
        grid=(b, (nby + 2) // nb),
        in_specs=[
            pl.BlockSpec((1, nb, 8, wh), lambda bi, r: (bi, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8 * nb, wp, 128),
                               lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp, 128), dtype),
        scratch_shapes=_scratches(wh, wb, dtype, compact=True),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(tbl_p, zpf)


def flow_warp_pf(zpf, flow, h: int, w: int, tile: int = 128):
    """Convenience: tables from ``flow`` + :func:`warp_pf`.

    Default = the DENSE table path. PNP_WARP_TABLES=compact switches to
    the fields-on-sublanes compact table + in-kernel one-hot expansion
    (build_warp_tables_compact docstring). History: the round-3
    (..., 8)-minor compact layout measured SLOWER (18.82 -> 18.17 f/s —
    16x lane padding + per-tile expansion serialized against the H dots);
    the round-4 transposed layout measures 20.16 vs 20.14 dense at
    720p/b=1 — PARITY in time while cutting ~60 MB/frame of table HBM
    build+stream. Dense stays default (measured-equal, simpler); compact
    is the choice when HBM traffic or footprint matters (e.g. larger b)."""
    import os

    if os.environ.get("PNP_WARP_TABLES", "dense") == "compact":
        tbl = build_warp_tables_compact(flow, h, w, tile)
        return warp_pf_compact(zpf, tbl, h, w, tile)
    s_same, s_x, vt = build_warp_tables(flow, h, w, tile)
    return warp_pf(zpf, s_same, s_x, vt, h, w, tile)
