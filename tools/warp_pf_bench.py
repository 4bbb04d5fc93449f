#!/usr/bin/env python
"""Production warp_pf kernel vs the XLA block8 warp at 720p, real TPU.

Chained-in-jit timing (fori_loop feeding output->input with a data-dependent
flow perturbation so XLA can neither DCE nor hoist the table build), per
frame at b=1, c=64, bf16:
  a) block8 XLA on unpacked (h,w,c)       -- current production
  b) warp_pf on PF carry, tables prebuilt -- kernel alone
  c) flow_warp_pf (tables + kernel)       -- full per-frame cost
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

from pnp_vcve_tpu.ops.warp import flow_warp
from pnp_vcve_tpu.kernels.drt_stack import pack_pf, unpack_pf
from pnp_vcve_tpu.kernels.warp_pf import build_warp_tables, warp_pf, flow_warp_pf

H, W, C = 720, 1280, 64
N = 30


def chain_time(step, z0, *extra):
    """step(z, *extra) -> z, iterated N times inside one jit."""

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

    # data-dependent flow: blocks hoisting, numerically a no-op in bf16
    dep = lambda z, f: f + z.reshape(-1)[:2].astype(jnp.float32).mean() * 1e-30

    t_a = chain_time(lambda z, f: flow_warp(z, dep(z, f), impl="block8"), x, flow)
    print(f"[a] block8 XLA:            {t_a:8.3f} ms/warp", flush=True)

    tabs = build_warp_tables(flow, H, W, 128)
    tabs = jax.tree.map(
        lambda t: jax.block_until_ready(t.astype(jnp.bfloat16)), tabs
    )
    t_b = chain_time(
        lambda z, s0, s1, v: warp_pf(
            z, s0 + z.reshape(-1)[0] * 1e-30, s1, v, H, W, 128
        ),
        xpf, *tabs,
    )
    print(f"[b] warp_pf kernel alone:  {t_b:8.3f} ms/warp", flush=True)

    t_c = chain_time(
        lambda z, f: flow_warp_pf(z, dep(z, f), H, W, 128), xpf, flow
    )
    print(f"[c] tables+kernel:         {t_c:8.3f} ms/warp", flush=True)

    want = np.asarray(
        jax.jit(lambda x, f: flow_warp(x, f, impl="block8"))(x, flow),
        np.float32,
    )
    got = np.asarray(
        unpack_pf(jax.jit(
            lambda z, f: flow_warp_pf(z, f, H, W, 128)
        )(xpf, flow), H, W),
        np.float32,
    )
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    print(f"rel err vs block8 (bf16):  {err:.2e}")
    print({"block8_ms": t_a, "kernel_ms": t_b, "full_ms": t_c,
           "relerr": float(err)})


if __name__ == "__main__":
    main()
