#!/usr/bin/env python
"""Mosaic int8 feasibility probe for the DRT stack's tap matmuls.

The stack is MXU-bound at bf16 (NEXT.md: per-tap kernel at ~100%
occupancy); v5e's MXU doubles throughput at int8. Before rewriting the
production kernel, this probe compiles and times a band-shaped kernel:

  A (bf16 path): 9 tap matmuls (M,128)@(128,128) bf16 — the current form.
  B (int8 path): quantize the band once to an int8 scratch (per-call
     dynamic scale), 9 tap matmuls int8->int32, fp32 rescale.

Prints wall time per variant and the max abs error of B vs A. If Mosaic
rejects the int8 slicing/layouts, the compile error tells us early.
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

TH, WP, C2 = 16, 656, 128
ROWS, COLS = TH + 2, WP - 4


def _bf16_kernel(band_ref, w_ref, o_ref):
    acc = jnp.zeros((ROWS * COLS, C2), jnp.float32)
    band = band_ref[:]
    for dy in range(3):
        for k in range(3):
            win = band[dy : dy + ROWS, k : k + COLS].reshape(ROWS * COLS, C2)
            acc = acc + jnp.dot(win, w_ref[dy, k], preferred_element_type=jnp.float32)
    o_ref[:] = acc.reshape(ROWS, COLS, C2).astype(o_ref.dtype)


def _int8_kernel(band_ref, w_ref, ws_ref, o_ref, qband):
    band = band_ref[:]
    # per-call dynamic activation scale
    amax = jnp.max(jnp.abs(band.astype(jnp.float32)))
    s_x = jnp.maximum(amax, 1e-6) / 127.0
    qband[:] = jnp.clip(
        jnp.round(band.astype(jnp.float32) / s_x), -127, 127
    ).astype(jnp.int8)
    acc = jnp.zeros((ROWS * COLS, C2), jnp.int32)
    for dy in range(3):
        for k in range(3):
            win = qband[dy : dy + ROWS, k : k + COLS].reshape(ROWS * COLS, C2)
            acc = acc + jnp.dot(win, w_ref[dy, k], preferred_element_type=jnp.int32)
    scale = s_x * ws_ref[0]  # (C2,) per-out-channel weight scales
    out = acc.astype(jnp.float32).reshape(ROWS, COLS, C2) * scale
    o_ref[:] = out.astype(o_ref.dtype)


def run_bf16(band, w):
    return pl.pallas_call(
        _bf16_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS, C2), jnp.float32),
    )(band, w)


def run_int8(band, wq, ws):
    return pl.pallas_call(
        _int8_kernel,
        out_shape=jax.ShapeDtypeStruct((ROWS, COLS, C2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((TH + 4, WP, C2), jnp.int8)],
    )(band, wq, ws)


def main():
    rng = np.random.default_rng(0)
    band = jnp.asarray(rng.standard_normal((TH + 4, WP, C2)).astype(np.float32),
                       jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, C2, C2)).astype(np.float32) * 0.05,
                    jnp.bfloat16)

    # per-out-channel weight quantization
    w_f = np.asarray(w, np.float32)
    s_w = np.maximum(np.abs(w_f).max(axis=(0, 1, 2)), 1e-8) / 127.0  # (C2,)
    wq = jnp.asarray(np.clip(np.round(w_f / s_w), -127, 127).astype(np.int8))
    ws = jnp.asarray(s_w[None], jnp.float32)  # (1, C2)

    fa = jax.jit(lambda b_, w_: run_bf16(b_, w_))
    fb = jax.jit(lambda b_, wq_, ws_: run_int8(b_, wq_, ws_))

    def timeit(f, *a, n=50):
        out = f(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e6, out

    try:
        t_a, out_a = timeit(fa, band, w)
        print(f"bf16 tap-conv: {t_a:.1f} us/call")
    except Exception as e:
        print("bf16 FAILED:", repr(e)[:500])
        return
    try:
        t_b, out_b = timeit(fb, band, wq, ws)
        err = float(jnp.max(jnp.abs(out_a - out_b)))
        ref_scale = float(jnp.max(jnp.abs(out_a)))
        print(f"int8 tap-conv: {t_b:.1f} us/call  speedup x{t_a / t_b:.2f}  "
              f"max|err|={err:.4f} ({err / ref_scale:.2%} of max)")
    except Exception as e:
        print("int8 FAILED:", repr(e)[:1500])


if __name__ == "__main__":
    main()
