#!/usr/bin/env python
"""Stage ablation for warp_pf: which stage owns the 8.4 ms?"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from pnp_vcve_tpu.kernels.drt_stack import pack_pf
from pnp_vcve_tpu.kernels.warp_pf import build_warp_tables, warp_pf

H = int(os.environ.get("WPS_H", "720"))
W = int(os.environ.get("WPS_W", "1280"))
C = 64
N = 30
STAGE_SETS = {
    "all6": [
        ("dma only", ()),
        ("dma+swap", ("swap",)),
        ("dma+h(noswap)", ("h",)),
        ("dma+swap+h", ("swap", "h")),
        ("dma+v", ("v",)),
        ("all", ("swap", "h", "v")),
    ],
    "quick": [("dma only", ()), ("all", ("swap", "h", "v"))],
}


def chain_time(step, z0, *extra):
    def chained(z, *e):
        def body(_, acc):
            return step(acc, *e).astype(z.dtype)

        return jnp.sum(jax.lax.fori_loop(0, N, body, z).astype(jnp.float32))

    g = jax.jit(chained)
    float(g(z0, *extra))
    t0 = time.perf_counter()
    float(g(z0, *extra))
    return (time.perf_counter() - t0) / N * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((1, H, W, C)).astype(np.float32), jnp.bfloat16
    )
    fb = rng.uniform(-16, 16, (1, H // 8, W // 8, 2)).astype(np.float32)
    flow = jnp.asarray(np.repeat(np.repeat(fb, 8, axis=1), 8, axis=2))
    xpf = jax.block_until_ready(pack_pf(x, th=8))
    tabs = build_warp_tables(flow, H, W, 128)
    tabs = jax.tree.map(
        lambda t: jax.block_until_ready(t.astype(jnp.bfloat16)), tabs
    )

    for name, stages in STAGE_SETS[os.environ.get("WPS_SET", "all6")]:
        t = chain_time(
            lambda z, s0, s1, v, st=stages: warp_pf(
                z, s0 + z.reshape(-1)[0] * 1e-30, s1, v, H, W, 128, stages=st
            ),
            xpf, *tabs,
        )
        print(f"[{name:14s}] {t:8.3f} ms/warp", flush=True)


if __name__ == "__main__":
    main()
