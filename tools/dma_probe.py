#!/usr/bin/env python
"""Isolate the warp_pf DMA-stage limiter (NEXT.md lever (a)).

Replicates ONLY the kernel's memory traffic — the rolling 8-row chunk
DMA (HBM->VMEM, manual async copy ring) and the pipelined band output
write (VMEM->HBM) — with knobs:

  DP_SPLIT=K   split each chunk DMA into K column segments with separate
               semaphores, started back-to-back (tests whether a SINGLE
               DMA stream caps at ~190 GB/s and parallel streams scale)
  DP_OUT=0/1   include the band output write (default 1)
  DP_DEPTH=N   prefetch depth in grid steps (default 3, like warp_pf)

Prints achieved GB/s against the 819 GB/s v5e peak per configuration.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

H, W = 720, 1280
WH = W // 2          # 640
WP = WH + 16         # PF cols
HP = H + 16          # PF rows
NSLOT = 10
N = 30


def _kernel(zpf_hbm, o_ref, chunks, sems, *, split, write_out, depth, nchunks):
    rp = pl.program_id(0)
    dtype = o_ref.dtype
    # segment bounds sublane-aligned (the HBM (8,128) tiling rejects
    # unaligned middle-dim slices)
    bounds = [8 * round(WP * s / split / 8) for s in range(split)] + [WP]

    def issue(k, start):
        slot = jax.lax.rem(k + NSLOT, NSLOT)
        valid = (k >= 0) & (k < nchunks)
        for s in range(split):
            lo, hi = bounds[s], bounds[s + 1]
            d = pltpu.make_async_copy(
                zpf_hbm.at[0, pl.ds(8 * jnp.maximum(k, 0), 8),
                           pl.ds(lo, hi - lo)],
                chunks.at[slot, :, pl.ds(lo, hi - lo)],
                sems.at[slot, s],
            )
            if start:
                @pl.when(valid)
                def _():
                    d.start()
            else:
                @pl.when(valid)
                def _():
                    d.wait()

    @pl.when(rp == 0)
    def _():
        for k in range(depth + 1):
            issue(jnp.int32(k), True)

    @pl.when(rp >= 1)
    def _():
        issue(rp + depth, True)

    issue(rp, False)
    slot = jax.lax.rem(rp, NSLOT)
    if write_out:
        o_ref[0] = chunks[slot]
    else:
        # touch the landed chunk so the DMA isn't dead-code-eliminated;
        # the out block is (1, 8, 128) — output traffic negligible
        o_ref[0] = chunks[slot, 0, 0:8]


def run(split, write_out, depth):
    rng = np.random.default_rng(0)
    zpf = jnp.asarray(
        rng.standard_normal((1, HP, WP, 128)).astype(np.float32), jnp.bfloat16
    )
    nchunks = HP // 8  # 92
    kern = functools.partial(
        _kernel, split=split, write_out=write_out, depth=depth,
        nchunks=nchunks,
    )
    if write_out:
        out_specs = pl.BlockSpec((1, 8, WP, 128), lambda r: (0, r, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, HP, WP, 128), jnp.bfloat16)
    else:
        out_specs = pl.BlockSpec((1, 8, 128), lambda r: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, 8, 128), jnp.bfloat16)
    step = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((NSLOT, 8, WP, 128), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((NSLOT, split)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )

    def chained(z):
        def body(_, carry):
            # serialize iterations: the input depends on the last output
            dep = (carry.reshape(-1)[0].astype(jnp.float32) * 1e-30).astype(
                z.dtype
            )
            return step(z + dep)

        init = jnp.zeros(out_shape.shape, out_shape.dtype)
        return jnp.sum(
            jax.lax.fori_loop(0, N, body, init).astype(jnp.float32)
        )

    g = jax.jit(chained)
    float(g(zpf))
    t0 = time.perf_counter()
    float(g(zpf))
    dt = (time.perf_counter() - t0) / N
    in_bytes = nchunks * 8 * WP * 128 * 2
    out_bytes = (HP * WP * 128 * 2) if write_out else 0
    gbs = (in_bytes + out_bytes) / dt / 1e9
    print(f"split={split} out={int(write_out)} depth={depth}: "
          f"{dt * 1e3:7.3f} ms  {gbs:6.1f} GB/s "
          f"({(in_bytes + out_bytes) / 1e6:.0f} MB)", flush=True)


def _pipelined_kernel(x_ref, o_ref):
    o_ref[0] = x_ref[0]


def run_pipelined(write_out: bool):
    """Same traffic, but the chunk arrives via a pipelined BlockSpec input
    (Mosaic's internal double-buffered fetch) instead of manual async
    copies — isolates the manual-DMA machinery cost."""
    rng = np.random.default_rng(0)
    zpf = jnp.asarray(
        rng.standard_normal((1, HP, WP, 128)).astype(np.float32), jnp.bfloat16
    )
    nchunks = HP // 8

    def kern(x_ref, o_ref):
        if write_out:
            o_ref[0] = x_ref[0]
        else:
            o_ref[0] = x_ref[0, 0, 0:8]

    if write_out:
        out_specs = pl.BlockSpec((1, 8, WP, 128), lambda r: (0, r, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, HP, WP, 128), jnp.bfloat16)
    else:
        out_specs = pl.BlockSpec((1, 8, 128), lambda r: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((1, 8, 128), jnp.bfloat16)
    step = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[pl.BlockSpec((1, 8, WP, 128), lambda r: (0, r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
    )

    def chained(z):
        def body(_, carry):
            dep = (carry.reshape(-1)[0].astype(jnp.float32) * 1e-30).astype(
                z.dtype
            )
            return step(z + dep)

        init = jnp.zeros(out_shape.shape, out_shape.dtype)
        return jnp.sum(
            jax.lax.fori_loop(0, N, body, init).astype(jnp.float32)
        )

    g = jax.jit(chained)
    float(g(zpf))
    t0 = time.perf_counter()
    float(g(zpf))
    dt = (time.perf_counter() - t0) / N
    in_bytes = nchunks * 8 * WP * 128 * 2
    out_bytes = (HP * WP * 128 * 2) if write_out else 0
    gbs = (in_bytes + out_bytes) / dt / 1e9
    print(f"pipelined out={int(write_out)}: {dt * 1e3:7.3f} ms  "
          f"{gbs:6.1f} GB/s ({(in_bytes + out_bytes) / 1e6:.0f} MB)",
          flush=True)


def main():
    mode = os.environ.get("DP_MODE", "manual")
    if mode == "pipelined":
        for write_out in (False, True):
            run_pipelined(write_out)
        return
    for split in (1, 2, 4):
        for write_out in (False, True):
            run(split, write_out, int(os.environ.get("DP_DEPTH", "3")))


if __name__ == "__main__":
    main()
