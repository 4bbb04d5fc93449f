"""Fused DRT residual block in pixel-pair packed layout (the flagship BAE
block's production kernel).

One kernel computes, per row band (reference semantics
sr_backbone_utils.py:304-313, channel_first / one_layer / with_se):

    dyres = sum_r par_r * (x @ PK_r)
    h     = relu(gamma * (dynconv3x3(x) + b2) + dyres)
    out   = x + conv1_3x3(h) + b1

reading x from HBM once and writing out once; ``h`` never leaves VMEM.
Stage 1 is computed on a (TH+2)-row, (wh+2)-packed-col halo grid so stage 2
has the neighbors it needs (boundary halo recompute, ~12-25% extra MXU).

Layout tricks (all validated kernels in this package):
- pixel-pair packing: (h, w, 64) viewed as (h, w/2, 128) — full 128 lanes;
- staging-free per-tap matmuls: 9 full-lane (M,128)@(128,128) per conv
  (kernels from packing.pack_conv3x3_kernel_per_tap; 2x logical MACs);
- the partition 1x1 side path as 3 block-diagonal (M,128)@(128,128)
  matmuls gated by lane-selected partition values (no lane concatenation,
  which Mosaic cannot relayout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import pack_conv3x3_kernel_per_tap

__all__ = ["drt_block_packed"]


def _round_up(v: int, m: int = 8) -> int:
    return -(-v // m) * m


def _tap_conv(band, w_taps, row0, rows, cols, c2):
    """Per-tap packed conv: acc[m, c2] += band[row0+dy+? ...] — see callers."""
    acc = jnp.zeros((rows * cols, c2), jnp.float32)
    for dy in range(3):
        for k in range(3):
            win = band[row0 + dy : row0 + dy + rows, k : k + cols].reshape(
                rows * cols, c2
            )
            acc = acc + jnp.dot(win, w_taps[dy, k], preferred_element_type=jnp.float32)
    return acc


def _kernel(
    xp_hbm, parp_hbm, w2_ref, b2_ref, pk_ref, w1_ref, b1_ref, g_ref, o_ref,
    bands, parbands, hmid, sems, psems, *, th, wh, c2, h_total, w_orig,
):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    n_tiles = pl.num_programs(1)
    slot = jax.lax.rem(ri, 2)
    nxt = jax.lax.rem(ri + 1, 2)

    def start_tile(t, s):
        pltpu.make_async_copy(
            xp_hbm.at[bi, pl.ds(t * th, th + 4)], bands.at[s], sems.at[s]
        ).start()
        pltpu.make_async_copy(
            parp_hbm.at[bi, pl.ds(t * th, th + 2)], parbands.at[s], psems.at[s]
        ).start()

    # warm-up: first tile of each batch item issues its own DMA
    @pl.when(ri == 0)
    def _():
        start_tile(0, 0)

    # prefetch the next band while this one computes (double buffering:
    # the blocking per-tile DMA wait was the dominant cost at small tiles)
    @pl.when(ri + 1 < n_tiles)
    def _():
        start_tile(ri + 1, nxt)

    pltpu.make_async_copy(
        xp_hbm.at[bi, pl.ds(ri * th, th + 4)], bands.at[slot], sems.at[slot]
    ).wait()
    pltpu.make_async_copy(
        parp_hbm.at[bi, pl.ds(ri * th, th + 2)], parbands.at[slot], psems.at[slot]
    ).wait()
    band = bands.at[slot]
    parband = parbands.at[slot]

    rows1 = th + 2
    # the stage-1 grid column count must be a multiple of the sublane tile
    # (8): misaligned-SIZE window flattens force Mosaic value relayouts that
    # cost ~3x the matmuls themselves (measured); extra columns are dead
    # (masked as out-of-image below)
    cols1 = _round_up(wh + 2)
    c = c2 // 2

    # ---- stage 1: dynamic conv + bias, * gamma
    acc = _tap_conv(band, w2_ref[0], 0, rows1, cols1, c2)
    acc = (acc + b2_ref[0, 0].astype(jnp.float32)) * g_ref[0, 0].astype(jnp.float32)
    acc = acc.reshape(rows1, cols1, c2)

    # ---- partition side path: 3 block-diag 1x1 matmuls, lane-gated
    xc = band[1 : 1 + rows1, 1 : 1 + cols1].reshape(rows1 * cols1, c2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows1, cols1, c2), 2)
    for r in range(3):
        y_r = jnp.dot(
            xc, pk_ref[0, r], preferred_element_type=jnp.float32
        ).reshape(rows1, cols1, c2)
        ge = parband[:, 0:cols1, r : r + 1].astype(jnp.float32)      # even px, ch r
        go = parband[:, 0:cols1, 3 + r : 4 + r].astype(jnp.float32)  # odd px, ch r
        gate = jnp.where(lane < c, ge, go)
        acc = acc + y_r * gate

    h1 = jnp.maximum(acc, 0.0)

    # ---- zero out-of-image stage-1 positions (conv1 'same' zero padding).
    # stage-1 local (r1, j1, lane): global row = ri*th + r1 - 1,
    # orig col = 2*j1 - 2 + (lane >= c).
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows1, cols1, c2), 0) + ri * th - 1
    gcol = (
        2 * jax.lax.broadcasted_iota(jnp.int32, (rows1, cols1, c2), 1)
        - 2
        + (lane >= c).astype(jnp.int32)
    )
    valid = (grow >= 0) & (grow < h_total) & (gcol >= 0) & (gcol < w_orig)
    hmid[:] = jnp.where(valid, h1, 0.0).astype(hmid.dtype)

    # ---- stage 2: plain conv1 over hmid + residual
    out = _tap_conv(hmid, w1_ref[0], 0, th, wh, c2)
    out = out + b1_ref[0, 0].astype(jnp.float32)
    resid = band[2 : 2 + th, 2 : 2 + wh].reshape(th * wh, c2).astype(jnp.float32)
    o_ref[0] = (resid + out).reshape(th, wh, c2).astype(o_ref.dtype)


def _pack_pk(par_kernel):
    """(c, 3, c) -> (3, 2c, 2c) block-diagonal packed 1x1 kernels."""
    c = par_kernel.shape[0]
    out = jnp.zeros((3, 2 * c, 2 * c), par_kernel.dtype)
    for r in range(3):
        out = out.at[r, 0:c, 0:c].set(par_kernel[:, r])
        out = out.at[r, c:, c:].set(par_kernel[:, r])
    return out


@functools.partial(jax.jit, static_argnames=("th",))
def drt_block_packed(x, par, dyn_kernels, dyn_biases, par_kernel, conv1_kernel,
                     conv1_bias, gamma, th: int = 16):
    """Fused DRT block; args as in kernels.conv_block.drt_block_pallas.

    x (b,h,w,c) with even w; out = x + conv1(relu(gamma*dynconv(x)+dyres)).
    """
    b, h, w, c = x.shape
    if w % 2 or h % th:
        raise ValueError(f"need even w and h%th==0, got {h}x{w}, th={th}")
    c2 = 2 * c
    wh = w // 2

    # stage-1 packed grid j1 covers orig pairs (2j1-2, 2j1-1), j1 in
    # [0, cols1); its window needs packed padded cols [j1, j1+2] where padded
    # col p = orig (2p-4, 2p-3) -> orig left pad 4; right pad covers the
    # 8-aligned grid (see _kernel).
    cols1 = _round_up(wh + 2)
    wp2 = _round_up(cols1 + 2)
    xp = jnp.pad(x, ((0, 0), (2, 2), (4, 2 * wp2 - w - 4), (0, 0)))
    xp = xp.reshape(b, h + 4, wp2, c2)

    # par for the stage-1 grid: orig cols -2..w+1, rows +-1. Channels are
    # padded to a full 128-lane dim (Mosaic DMA requires lane-aligned
    # slices); the pad is identical across all blocks of a stack, so XLA
    # CSEs it to a single materialization per step.
    wp1 = _round_up(wh + 2)  # == cols1
    parp = jnp.pad(par, ((0, 0), (1, 1), (2, 2 * wp1 - w - 2), (0, 0)))
    parp = parp.reshape(b, h + 2, wp1, 6)
    parp = jnp.pad(parp, ((0, 0), (0, 0), (0, 0), (0, 128 - 6)))

    w2 = jax.vmap(pack_conv3x3_kernel_per_tap)(dyn_kernels)      # (b,3,3,c2,c2)
    b2 = jnp.concatenate([dyn_biases, dyn_biases], -1).reshape(b, 1, c2)
    g = jnp.concatenate([gamma, gamma], -1).reshape(b, 1, c2)
    pk = jnp.broadcast_to(_pack_pk(par_kernel)[None], (b, 3, c2, c2))
    w1 = jnp.broadcast_to(
        pack_conv3x3_kernel_per_tap(conv1_kernel)[None], (b, 3, 3, c2, c2)
    )
    b1 = jnp.broadcast_to(
        jnp.concatenate([conv1_bias, conv1_bias]).reshape(1, 1, c2), (b, 1, c2)
    )

    kernel = functools.partial(
        _kernel, th=th, wh=wh, c2=c2, h_total=h, w_orig=w
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, 3, c2, c2), lambda bi, ri: (bi, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, c2, c2), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, c2, c2), lambda bi, ri: (bi, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c2), lambda bi, ri: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wh, c2), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wh, c2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, wp2, c2), x.dtype),
            pltpu.VMEM((2, th + 2, wp1, 128), par.dtype),
            pltpu.VMEM((th + 2, cols1, c2), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, parp, w2, b2, pk, w1, b1, g)
    return out.reshape(b, h, w, c)
