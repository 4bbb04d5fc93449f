#!/usr/bin/env python
"""Primitive-cost probes for the banded Pallas warp (the 22 ms/frame wall;
the XLA gather itself measured 27 ms/warp in tools/warp_micro.py).

Candidate kernel designs on bench geometry (720p, c=64, 90 bands):
  floor. band DMA alone (44, WP, C) per band
  B. dense masked-select: 35-shift weighted horizontal + 35-term vertical
  A. per-block window DMAs (2 x 160 dynamic-start copies per band)

Input/DMA structure mirrors the production drt_stack kernels (4-D
batch-leading HBM refs, .at[bi, pl.ds(...)]).
"""

import functools
import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W, C = 720, 1280, 64
B = 8
NBY, NBX = H // B, W // B
PADX = 32
WP = W + 2 * PADX  # 1344
BAND = 48
PADY = 20
HP = H + 2 * PADY  # 760


def timeit(f, *a, n=30):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def stage(name, fn):
    try:
        ms, _ = fn()
        print(f"[ok] {name}: {ms:.3f} ms/warp", flush=True)
        return ms
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {repr(e)[:700]}", flush=True)
        return None


# ------------------------------------------------------------------ floor
def _floor_kernel(xp_hbm, o_ref, band, sem):
    ri = pl.program_id(1)
    bi = pl.program_id(0)
    cp = pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(ri * B, BAND)], band, sem)
    cp.start()
    cp.wait()
    o_ref[0] = band[16 : 16 + B, PADX : PADX + W] * 2.0


def probe_floor(xp):
    f = jax.jit(lambda x: pl.pallas_call(
        _floor_kernel,
        grid=(1, NBY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, B, W, C), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((BAND, WP, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(x))
    return timeit(f, xp)


# ---------------------------------------------------------------------- B
def _select_kernel(shidx_ref, wx0_ref, wx1_ref, dyidx_ref, wy0_ref, wy1_ref,
                   xp_hbm, o_ref, band, hband, sem):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    cp = pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(ri * B, BAND)], band, sem)
    cp.start()
    cp.wait()

    shidx = shidx_ref[ri]  # (W,) i32 in [0, 34]
    wx0 = wx0_ref[ri]
    wx1 = wx1_ref[ri]
    acc_h = jnp.zeros((BAND, W, C), jnp.float32)
    for s in range(35):
        w_s = (
            jnp.where(shidx == s, wx0, 0.0)
            + jnp.where(shidx == s - 1, wx1, 0.0)
        )
        sl = band[:, s + PADX - 17 : s + PADX - 17 + W]
        acc_h = acc_h + sl.astype(jnp.float32) * w_s[None, :, None]
    hband[:] = acc_h.astype(hband.dtype)

    dyidx = dyidx_ref[ri]
    wy0 = wy0_ref[ri]
    wy1 = wy1_ref[ri]
    acc = jnp.zeros((B, W, C), jnp.float32)
    for d in range(35):
        w_d = (
            jnp.where(dyidx == d, wy0, 0.0)
            + jnp.where(dyidx == d - 1, wy1, 0.0)
        )
        sl = hband[d : d + B]
        acc = acc + sl.astype(jnp.float32) * w_d[None, :, None]
    o_ref[0] = acc.astype(o_ref.dtype)


def probe_select(xp, shidx, wx0, wx1, dyidx, wy0, wy1):
    f = jax.jit(lambda a1, a2, a3, a4, a5, a6, x: pl.pallas_call(
        _select_kernel,
        grid=(1, NBY),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, B, W, C), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((BAND, WP, C), jnp.bfloat16),
            pltpu.VMEM((BAND, W, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(a1, a2, a3, a4, a5, a6, x))
    return timeit(f, shidx, wx0, wx1, dyidx, wy0, wy1, xp)


# ---------------------------------------------------------------------- A
def _dma_kernel(sy_ref, sx_ref, xp_hbm, o_ref, win_a, win_b, sem, *, nbx):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    for j in range(nbx):
        sy = sy_ref[ri * nbx + j]
        sx = sx_ref[ri * nbx + j]
        pltpu.make_async_copy(
            xp_hbm.at[bi, pl.ds(sy, 9), pl.ds(sx, B)],
            win_a.at[pl.ds(0, 9), j], sem.at[0],
        ).start()
        pltpu.make_async_copy(
            xp_hbm.at[bi, pl.ds(sy, 9), pl.ds(sx + B, B)],
            win_b.at[pl.ds(0, 9), j], sem.at[1],
        ).start()
    for j in range(nbx):
        pltpu.make_async_copy(
            xp_hbm.at[bi, pl.ds(0, 9), pl.ds(0, B)],
            win_a.at[pl.ds(0, 9), 0], sem.at[0],
        ).wait()
        pltpu.make_async_copy(
            xp_hbm.at[bi, pl.ds(0, 9), pl.ds(0, B)],
            win_b.at[pl.ds(0, 9), 0], sem.at[1],
        ).wait()
    acc = (
        win_a[0:B].astype(jnp.float32)
        + win_b[1 : B + 1].astype(jnp.float32)
    )
    o_ref[0] = (acc * 0.5).transpose(1, 0, 2, 3).reshape(B, nbx * B, C).astype(
        o_ref.dtype
    )


def probe_dma(xp, sy, sx):
    kern = functools.partial(_dma_kernel, nbx=NBX)
    f = jax.jit(lambda a1, a2, x: pl.pallas_call(
        kern,
        grid=(1, NBY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, B, W, C), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((10, NBX, B, C), jnp.bfloat16),
            pltpu.VMEM((10, NBX, B, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(a1, a2, x))
    return timeit(f, sy, sx, xp)


def main():
    rng = np.random.default_rng(0)
    xp = jnp.asarray(
        rng.standard_normal((1, HP, WP, C)).astype(np.float32), jnp.bfloat16
    )
    sy = jnp.asarray(rng.integers(0, HP - 10, NBY * NBX).astype(np.int32))
    sx = jnp.asarray(
        (rng.integers(0, (WP - 20) // B, NBY * NBX) * B).astype(np.int32)
    )
    shidx = jnp.asarray(rng.integers(0, 34, (NBY, W)).astype(np.int32))
    dyidx = jnp.asarray(rng.integers(0, 34, (NBY, W)).astype(np.int32))
    wx0 = jnp.asarray(rng.random((NBY, W)).astype(np.float32))
    wx1 = jnp.asarray(rng.random((NBY, W)).astype(np.float32))
    wy0 = jnp.asarray(rng.random((NBY, W)).astype(np.float32))
    wy1 = jnp.asarray(rng.random((NBY, W)).astype(np.float32))

    t_floor = stage("band DMA floor", lambda: probe_floor(xp))
    t_sel = stage(
        "dense select (35H+35V)",
        lambda: probe_select(xp, shidx, wx0, wx1, dyidx, wy0, wy1),
    )
    t_dma = stage("per-block window DMAs (320/band)", lambda: probe_dma(xp, sy, sx))
    print({"floor_ms": t_floor, "select_ms": t_sel, "block_dma_ms": t_dma})


if __name__ == "__main__":
    main()
