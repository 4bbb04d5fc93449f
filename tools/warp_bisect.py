#!/usr/bin/env python
"""Bisect the Mosaic compile-helper crash: 64-lane minor vs fori+dot vs
dynamic stores.  Tiny shapes for fast remote compiles."""

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

H, W = 64, 256
BAND = 48
TILE = 128
KW = 184
WPAD = W + 64  # 320


def stage(name, fn):
    t0 = time.perf_counter()
    try:
        out = jax.block_until_ready(fn())
        print(f"[ok] {name} ({time.perf_counter()-t0:.1f}s) sum={float(np.asarray(out, dtype=np.float32).sum())}",
              flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = repr(e)
        for tag in ("exit code 1", "INTERNAL"):
            if tag in msg:
                msg = msg.split("WARN")[0]
                break
        print(f"[FAIL] {name} ({time.perf_counter()-t0:.1f}s): {msg[:300]}", flush=True)
        return False


def k_dma(lanes):
    def kern(x_hbm, o_ref, band, sem):
        ri = pl.program_id(1)
        cp = pltpu.make_async_copy(x_hbm.at[0, pl.ds(ri * 8, BAND)], band, sem)
        cp.start()
        cp.wait()
        o_ref[0] = band[16:24, 32 : 32 + W] * 2.0

    x = jnp.ones((1, H + 40, WPAD, lanes), jnp.bfloat16)
    return pl.pallas_call(
        kern,
        grid=(1, H // 8),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, W, lanes), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, lanes), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((BAND, WPAD, lanes), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def k_nodma(lanes):
    def kern(x_ref, o_ref):
        o_ref[0] = x_ref[0, 16:24, 32 : 32 + W] * 2.0

    x = jnp.ones((1, H, WPAD, lanes), jnp.bfloat16)
    return pl.pallas_call(
        kern,
        grid=(1, H // 8),
        in_specs=[pl.BlockSpec((1, H, WPAD, lanes), lambda bi, r: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, W, lanes), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, lanes), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x)


def k_fori_dot(lanes):
    def kern(s_ref, x_hbm, o_ref, band, hband, sem):
        ri = pl.program_id(1)
        cp = pltpu.make_async_copy(x_hbm.at[0, pl.ds(ri * 8, BAND)], band, sem)
        cp.start()
        cp.wait()
        s = s_ref[0, 0]

        def body(r, _):
            win = band[r, 0:KW]
            hband[r, 0:TILE] = jax.lax.dot_general(
                s, win, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(hband.dtype)
            return 0

        jax.lax.fori_loop(0, BAND, body, 0)
        o_ref[0] = hband[16:24, 0:W]

    x = jnp.ones((1, H + 40, WPAD, lanes), jnp.bfloat16)
    s = jnp.ones((1, 1, TILE, KW), jnp.bfloat16)
    return pl.pallas_call(
        kern,
        grid=(1, H // 8),
        in_specs=[
            pl.BlockSpec((1, 1, TILE, KW), lambda bi, r: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, W, lanes), lambda bi, r: (bi, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, H, W, lanes), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((BAND, WPAD, lanes), jnp.bfloat16),
            pltpu.VMEM((BAND, max(TILE, W), lanes), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(s, x)


def main():
    which = sys.argv[1:] or ["dma64", "nodma64", "fori128", "fori64"]
    if "dma64" in which:
        stage("dma 64-lane", lambda: k_dma(64))
    if "dma128" in which:
        stage("dma 128-lane", lambda: k_dma(128))
    if "nodma64" in which:
        stage("nodma 64-lane", lambda: k_nodma(64))
    if "fori128" in which:
        stage("fori+dot 128-lane", lambda: k_fori_dot(128))
    if "fori64" in which:
        stage("fori+dot 64-lane", lambda: k_fori_dot(64))


if __name__ == "__main__":
    main()
