#!/usr/bin/env python
"""Isolate the input-conv / head Pallas costs at 720p (the trace groups
them all under %resblocks: 14.8 ms/frame total vs ~5.7 ms of MXU math —
this tool splits that 14.8 by stage so the optimization target is known,
like tools/warp_pf_stages.py did for the warp).

Stages timed (b=1, c=64, bf16, chained-in-jit):
  a) input_conv_pf forward shape: 4 parts (lr 3ch + 3 PF 64ch)
  b) input_conv_pf backward shape: 3 parts (lr 3ch + 2 PF 64ch)
  c) input_conv_pf without the lr part (3 PF parts): lr-padding waste
  d) head_pf (hr conv + last conv on PF stack output)
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

from pnp_vcve_tpu.kernels.drt_stack import (
    head_pf, input_conv_pf, pack_pf, pf_geometry,
)

H, W, C = 720, 1280, 64
N = 20


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
    HP, WP, _, _, _ = pf_geometry(H, W, 8)
    mk_pf = lambda: jnp.asarray(
        rng.standard_normal((1, HP, WP, 128)).astype(np.float32), jnp.bfloat16
    )
    lr = jnp.asarray(
        rng.standard_normal((1, H, W, 3)).astype(np.float32), jnp.bfloat16
    )
    pf1, pf2, pf3 = mk_pf(), mk_pf(), mk_pf()

    def dep(z, x):
        return x + (z.reshape(-1)[0] * 1e-30).astype(x.dtype)

    def run(parts_fn, cin, label):
        k = jnp.asarray(
            rng.standard_normal((3, 3, cin, C)).astype(np.float32), jnp.bfloat16
        )
        bias = jnp.zeros((C,), jnp.float32)

        def step(z, *ps):
            parts = parts_fn(z, *ps)
            return input_conv_pf(
                [p for p, _ in parts], k, bias,
                part_pf=[f for _, f in parts],
            )

        t = chain_time(step, pf1, lr, pf2, pf3)
        print(f"[{label:28s}] {t:8.3f} ms", flush=True)
        return t

    # fixed-vs-marginal split: 1-part and 2-part cases (the kernel needs a
    # non-PF anchor part to fix h/w, so lr is in all of them). With the
    # per-part dot floor ~0.4 ms (9 taps x 5184 rows x 90 steps / 8
    # rows-per-cycle), a large intercept here means per-call overhead.
    # CAUTION (measured r3): 'lr only' = 2.89 ms here, which suggested the
    # lr reshape+pad-to-128-lanes prep dominates — but packing lr once per
    # clip as a narrow PF part made the REAL model SLOWER (18.63 -> 18.27
    # f/s): this tool's standalone lr carries a (w,c)-tiled HBM layout
    # whose relayout is far costlier than the model's h-minor scan-xs lr.
    # Standalone microbench layouts are not the model's layouts.
    run(lambda z, l, a, b: [(dep(z, l), False)], 3, "lr only")
    run(lambda z, l, a, b: [(dep(z, l), False), (z, True)], 3 + C,
        "lr + 1 PF")
    # a) forward: lr + 3 PF parts (key_warp, prev_out, cur)
    run(lambda z, l, a, b: [(dep(z, l), False), (z, True), (a, True), (b, True)],
        3 + 3 * C, "fwd: lr + 3 PF")
    # b) backward: lr + 2 PF parts
    run(lambda z, l, a, b: [(dep(z, l), False), (z, True), (a, True)],
        3 + 2 * C, "bwd: lr + 2 PF")
    # c) lr replaced by a full 64ch unpacked part: if (c) ~= (a), the
    # 3ch-padded-to-128 lr part costs as much as a real 64ch part (21x
    # MAC waste); cost attributable to lr-padding = (a) - [(c) - 64ch dot
    # premium]
    lr64 = jnp.asarray(
        rng.standard_normal((1, H, W, C)).astype(np.float32), jnp.bfloat16
    )
    run(lambda z, l, a, b: [(dep(z, lr64), False), (z, True), (a, True),
                            (b, True)],
        4 * C, "fwd: 64ch-unpacked + 3 PF")
    # d) head
    whr = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32), jnp.bfloat16)
    wlast = jnp.asarray(rng.standard_normal((3, 3, C, 3)).astype(np.float32), jnp.bfloat16)
    bhr = jnp.zeros((C,), jnp.float32)
    blast = jnp.zeros((3,), jnp.float32)

    def head_step(z):
        y = head_pf(z, whr, bhr, wlast, blast, H, W)  # (1, H, W, 3)
        # feed a scalar back into the pf input for the chain
        return z + (y.reshape(-1)[0] * 1e-30).astype(z.dtype)

    t = chain_time(head_step, pf1)
    print(f"[{'head_pf':28s}] {t:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
