#!/usr/bin/env python
"""Time the padgather warp BACKWARD (the bilinear splat adjoint) alone.

The train step's gradient cost is dominated by the warp adjoint
(ops/warp.py _padgather_bwd); this isolates it at the reference recipe
shape (75 frames of 128x128x64 per step: b=5, t=15, two sweeps) so splat
variants can be compared without re-timing the whole train step.

    python tools/splat_probe.py [--frames 75] [--hw 128 128] [--c 64]

Prints one JSON line: ms per splat batch (vjp of flow_warp minus the
forward-only cost, both chained inside one jit).
"""

import argparse
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--frames", type=int, default=75)
    p.add_argument("--hw", type=int, nargs=2, default=(128, 128))
    p.add_argument("--c", type=int, default=64)
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    from pnp_vcve_tpu.ops.warp import flow_warp

    n, (h, w), c = args.frames, args.hw, args.c
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-16, 16, (n, h, w, 2)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)

    def one_vjp(x_, fl_, g_):
        out, pull = jax.vjp(
            lambda a, f: flow_warp(a, f, impl="padgather"), x_, fl_
        )
        dx, dfl = pull(g_)
        return dx.mean() + dfl.mean() + out.mean()

    def chain(fn, iters):
        def body(carry, _):
            x_ = x * (1.0 + 1e-6 * carry)
            return fn(x_, flow, g), None

        return jax.lax.scan(body, jnp.float32(0.0), None, length=iters)[0]

    def fwd_only(x_, fl_, g_):
        return flow_warp(x_, fl_, impl="padgather").mean() + g_.mean()

    j_vjp = jax.jit(lambda: chain(one_vjp, args.iters))
    j_fwd = jax.jit(lambda: chain(fwd_only, args.iters))

    for name, fn in (("vjp", j_vjp), ("fwd", j_fwd)):
        fn().block_until_ready()  # compile + warm

    t0 = time.perf_counter()
    j_vjp().block_until_ready()
    t_vjp = (time.perf_counter() - t0) / args.iters

    t0 = time.perf_counter()
    j_fwd().block_until_ready()
    t_fwd = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "padgather_splat_ms_per_batch",
        "frames": n, "hw": [h, w], "c": c,
        "vjp_ms": round(t_vjp * 1e3, 2),
        "fwd_ms": round(t_fwd * 1e3, 2),
        "bwd_ms": round((t_vjp - t_fwd) * 1e3, 2),
        "device_kind": jax.devices()[0].device_kind,
    }))


if __name__ == "__main__":
    main()
