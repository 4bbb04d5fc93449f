#!/usr/bin/env python
"""Decompose the block8 warp's 22 ms/frame (tools/warp_ab.py) into parts:
pad copy, block gather, weight apply, final transpose — each timed as its
own jitted op on the bench shapes, plus the full warp and a padgather
reference. Data-dependent chaining defeats async-dispatch lies.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

H, W, C = 720, 1280, 64
B = 8
PAD = 16
NBY, NBX = H // B, W // B


def chain_time(f, x, n=20):
    def chained(v):
        def body(_, acc):
            return f(acc).astype(v.dtype)

        return jnp.sum(jax.lax.fori_loop(0, n, body, x).astype(jnp.float32))

    g = jax.jit(chained)
    float(g(x))
    t0 = time.perf_counter()
    float(g(x))
    return (time.perf_counter() - t0) / n * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, W, C)).astype(np.float32), jnp.bfloat16)
    fb = (rng.standard_normal((NBY, NBX, 4)) * 6).astype(np.float32)
    flow = jnp.asarray(
        np.repeat(np.repeat(fb, B, axis=0), B, axis=1)[..., :2], jnp.bfloat16
    )

    from pnp_vcve_tpu.ops import warp as wmod

    res = {}

    # full block8 warp (shape-preserving => chainable)
    res["full_block8_ms"] = chain_time(
        lambda v: wmod._warp_single_block8(v, flow), x
    )
    # padgather reference
    res["full_padgather_ms"] = chain_time(
        lambda v: wmod._warp_single_padgather(v, flow, False), x
    )

    # pad alone (chain via crop-back)
    res["pad_roundtrip_ms"] = chain_time(
        lambda v: jnp.pad(v, ((PAD, PAD), (PAD, PAD), (0, 0)))[
            PAD:-PAD, PAD:-PAD, :
        ],
        x,
    )

    # gather alone: same starts/geometry as the warp, sum the halo to keep
    # shape (b8 block windows -> mean back to (h, w, c))
    starts_np = rng.integers(0, H - 10, (NBY * NBX, 2)).astype(np.int32)
    starts = jnp.asarray(starts_np)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
    )

    def gather_only(v):
        g = jax.lax.gather(
            v, starts, dnums, slice_sizes=(B + 1, B + 1, C),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )
        # cheap reduce back to frame shape: take the top-left 8x8 of each
        # window (no weights)
        g = g[:, :B, :B, :].reshape(NBY, NBX, B, B, C)
        return g.transpose(0, 2, 1, 3, 4).reshape(H, W, C)

    res["gather_plus_transpose_ms"] = chain_time(gather_only, x)

    def transpose_only(v):
        g = v.reshape(NBY, B, NBX, B, C).transpose(0, 2, 1, 3, 4)
        return g.transpose(0, 2, 1, 3, 4).reshape(H, W, C)

    res["block_transpose_roundtrip_ms"] = chain_time(transpose_only, x)

    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
