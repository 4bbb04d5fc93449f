#!/usr/bin/env python
"""Candidate C probe: banded block8 warp as MXU matmul-select.

Per 8-row out band (48-row source band; exact for |MV| <= 16):
  H pass: for each 128-px out tile, a (TILE, KW) selection matrix S —
    built OUTSIDE the kernel from per-out-col integer shifts + bilinear
    weights — contracts the band's STATIC (KW, C) window per row on the
    MXU: out_h[r, tile] = S @ band[r, ws:ws+KW].  No gather, no dynamic
    sublane slices; the dynamic shift lives entirely in S's values.
  V pass: dense masked select over out_h rows; masks are (W, D) with W on
    sublanes so the per-term weight is a single-lane slice broadcast.

Flop model: H = 90 bands x 10 tiles x 48 rows x (128x184x64) matmuls
~ 260 GFLOP eff / warp -> ~1.8 ms MXU-bound; DMA floor ~0.9 ms; V ~0.1 ms.

Also re-probes the band-DMA floor with 128 lanes to diagnose probe 1's
64-lane Mosaic compile-helper crash.
"""

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
NBY = H // B
PADX = 32
WP = W + 2 * PADX  # 1344
BAND = 48
PADY = 20
HP = H + 2 * PADY  # 760
TILE = 128
KW = 184           # window: taps land in [15, 177+1] for shifts in [-17, 17]
NT = W // TILE     # 10
DV = 40            # V dense terms (out row i reads hband[d + i], d in [0, DV))


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
        print(f"[FAIL] {name}: {repr(e)[:600]}", flush=True)
        return None


# ---------------------------------------------------------------- floor128
def _floor128_kernel(xp_hbm, o_ref, band, sem):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    cp = pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(ri * B, BAND)], band, sem)
    cp.start()
    cp.wait()
    o_ref[0] = band[16 : 16 + B, PADX // 2 : PADX // 2 + W // 2] * 2.0


def probe_floor128(xp2):
    f = jax.jit(lambda x: pl.pallas_call(
        _floor128_kernel,
        grid=(1, NBY),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, B, W // 2, 2 * C), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W // 2, 2 * C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((BAND, WP // 2, 2 * C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
    )(x))
    return timeit(f, xp2)


# ------------------------------------------------------------- C: matmul H
def _mmsel_kernel(s_ref, vm_ref, xp_hbm, o_ref, band, hband, sem):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    cp = pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(ri * B, BAND)], band, sem)
    cp.start()
    cp.wait()

    for tj in range(NT):
        ws = tj * TILE
        s = s_ref[0, tj]  # (TILE, KW) bf16

        def body(r, _):
            win = band[r, ws : ws + KW]
            hband[r, ws : ws + TILE] = jax.lax.dot_general(
                s, win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(hband.dtype)
            return 0

        jax.lax.fori_loop(0, BAND, body, 0)

    acc = jnp.zeros((B, W, C), jnp.float32)
    for d in range(DV):
        wv = vm_ref[0, :, d : d + 1]  # (W, 1)
        acc = acc + hband[d : d + B].astype(jnp.float32) * wv[None]
    o_ref[0] = acc.astype(o_ref.dtype)


def probe_mmsel(xp, s_all, vm):
    f = jax.jit(lambda s, v, x: pl.pallas_call(
        _mmsel_kernel,
        grid=(1, NBY),
        in_specs=[
            pl.BlockSpec((1, NT, TILE, KW), lambda bi, r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W, DV), lambda bi, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
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
    )(s, v, x))
    return timeit(f, s_all, vm, xp)


def build_s(m0, w0, w1):
    """(NBY, W) taps -> (NBY, NT, TILE, KW) selection matrices."""
    m = m0.reshape(NBY, NT, TILE) - (
        np.arange(NT, dtype=np.int32) * TILE
    ).reshape(1, NT, 1)
    iota = jnp.arange(KW, dtype=jnp.int32)
    m = jnp.asarray(m)[..., None]
    s = jnp.where(iota == m, jnp.asarray(w0).reshape(NBY, NT, TILE, 1), 0.0)
    s = s + jnp.where(
        iota == m + 1, jnp.asarray(w1).reshape(NBY, NT, TILE, 1), 0.0
    )
    return s.astype(jnp.bfloat16)


def main():
    rng = np.random.default_rng(0)
    xp = jnp.asarray(
        rng.standard_normal((1, HP, WP, C)).astype(np.float32), jnp.bfloat16
    )
    xp2 = jnp.asarray(
        rng.standard_normal((1, HP, WP // 2, 2 * C)).astype(np.float32),
        jnp.bfloat16,
    )
    base = np.arange(W, dtype=np.int32)[None, :] + PADX
    dx = rng.integers(-17, 18, (NBY, W)).astype(np.int32)
    m0 = base + dx
    w0 = rng.random((NBY, W)).astype(np.float32)
    w1 = rng.random((NBY, W)).astype(np.float32)
    s_all = jax.block_until_ready(build_s(m0, w0, w1))

    vm_np = np.zeros((NBY, W, DV), np.float32)
    dyi = rng.integers(1, DV - 1, (NBY, W))
    for d in range(DV):
        vm_np[:, :, d][dyi == d] = 0.7
        vm_np[:, :, d][dyi == d - 1] = 0.3
    vm = jnp.asarray(vm_np)

    t_floor = stage("band DMA floor (128-lane)", lambda: probe_floor128(xp2))
    t_mm = stage("matmul-select H + dense V", lambda: probe_mmsel(xp, s_all, vm))
    print({"floor128_ms": t_floor, "mmsel_ms": t_mm})


if __name__ == "__main__":
    main()
