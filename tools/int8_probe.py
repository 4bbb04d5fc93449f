#!/usr/bin/env python
"""Mosaic int8 feasibility probes for the DRT stack's tap matmuls, staged
so the first failing capability is obvious:

  1. plain bf16 matmul kernel (sanity)
  2. pre-quantized int8 matmul (int8 MXU path)
  3. in-kernel quantize (bf16 -> int8 scratch) + int8 matmul
  4. tap-conv form: strided row/col slices of an int8 scratch band

Each stage compiles + times independently; failures print and continue.
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

M, K, N = 4096, 128, 128
BH, BW, C2 = 24, 656, 128
ROWS, COLS = 16, 320


def timeit(f, *a, n=100):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e6, out


def stage(name, fn):
    try:
        t_us, out = fn()
        print(f"[ok] {name}: {t_us:.1f} us", flush=True)
        return t_us, out
    except Exception as e:  # noqa: BLE001
        msg = repr(e).replace("\\n", " ")[:600]
        print(f"[FAIL] {name}: {msg}", flush=True)
        return None, None


def main():
    rng = np.random.default_rng(0)
    a_f = rng.standard_normal((M, K)).astype(np.float32)
    b_f = rng.standard_normal((K, N)).astype(np.float32) * 0.05
    a_bf = jnp.asarray(a_f, jnp.bfloat16)
    b_bf = jnp.asarray(b_f, jnp.bfloat16)
    s_a = np.abs(a_f).max() / 127.0
    s_b = np.abs(b_f).max(axis=0) / 127.0
    a_q = jnp.asarray(np.clip(np.round(a_f / s_a), -127, 127).astype(np.int8))
    b_q = jnp.asarray(np.clip(np.round(b_f / s_b), -127, 127).astype(np.int8))

    # --- 1. bf16 matmul
    def k1(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.float32
        )

    f1 = jax.jit(lambda a, b: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32))(a, b))
    t1, o1 = stage("bf16 matmul", lambda: timeit(f1, a_bf, b_bf))

    # --- 2. int8 matmul (pre-quantized)
    def k2(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(
            a_ref[:], b_ref[:], preferred_element_type=jnp.int32
        )

    f2 = jax.jit(lambda a, b: pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((M, N), jnp.int32))(a, b))
    t2, o2 = stage("int8 matmul", lambda: timeit(f2, a_q, b_q))
    if t1 and t2:
        print(f"  -> int8 speedup x{t1 / t2:.2f}")
    if o1 is not None and o2 is not None:
        approx = np.asarray(o2, np.float64) * (s_a * s_b[None, :])
        err = np.abs(approx - np.asarray(o1, np.float64)).max()
        print(f"  -> dequant max|err| {err:.4f} vs |out|max "
              f"{np.abs(np.asarray(o1)).max():.1f}")

    # --- 3. in-kernel quantize + int8 matmul
    def k3(a_ref, b_ref, o_ref, qa):
        a = a_ref[:].astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(a)), 1e-6)
        s = amax / 127.0
        qa[:] = jnp.clip(jnp.round(a / s), -127, 127).astype(jnp.int8)
        acc = jnp.dot(qa[:], b_ref[:], preferred_element_type=jnp.int32)
        o_ref[:] = acc.astype(jnp.float32) * s

    f3 = jax.jit(lambda a, b: pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((M, K), jnp.int8)])(a, b))
    t3, _ = stage("quantize-in-kernel + int8 matmul", lambda: timeit(f3, a_bf, b_q))

    # --- 4. tap-conv form on an int8 band with strided slices
    band_f = rng.standard_normal((BH, BW, C2)).astype(np.float32)
    band_bf = jnp.asarray(band_f, jnp.bfloat16)
    w_f = rng.standard_normal((3, 3, C2, C2)).astype(np.float32) * 0.05
    ws = np.abs(w_f).max(axis=(0, 1, 2)) / 127.0
    wq = jnp.asarray(np.clip(np.round(w_f / ws), -127, 127).astype(np.int8))

    def k4(band_ref, w_ref, o_ref, qband):
        bandv = band_ref[:].astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(bandv)), 1e-6) / 127.0
        qband[:] = jnp.clip(jnp.round(bandv / s), -127, 127).astype(jnp.int8)
        acc = jnp.zeros((ROWS * COLS, C2), jnp.int32)
        for dy in range(3):
            for k in range(3):
                win = qband[dy : dy + ROWS, k : k + COLS].reshape(
                    ROWS * COLS, C2
                )
                acc = acc + jnp.dot(
                    win, w_ref[dy, k], preferred_element_type=jnp.int32
                )
        o_ref[:] = (acc.astype(jnp.float32) * s).reshape(ROWS, COLS, C2)

    f4 = jax.jit(lambda band, w: pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((ROWS, COLS, C2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((BH, BW, C2), jnp.int8)])(band, w))
    t4, _ = stage("int8 tap-conv (strided slices)", lambda: timeit(f4, band_bf, wq, n=50))

    # --- 4b. bf16 tap-conv baseline, same geometry
    w_bf = jnp.asarray(w_f, jnp.bfloat16)

    def k5(band_ref, w_ref, o_ref):
        band = band_ref[:]
        acc = jnp.zeros((ROWS * COLS, C2), jnp.float32)
        for dy in range(3):
            for k in range(3):
                win = band[dy : dy + ROWS, k : k + COLS].reshape(
                    ROWS * COLS, C2
                )
                acc = acc + jnp.dot(
                    win, w_ref[dy, k], preferred_element_type=jnp.float32
                )
        o_ref[:] = acc.reshape(ROWS, COLS, C2)

    f5 = jax.jit(lambda band, w: pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((ROWS, COLS, C2), jnp.float32))(band, w))
    t5, _ = stage("bf16 tap-conv (same geometry)", lambda: timeit(f5, band_bf, w_bf, n=50))
    if t4 and t5:
        print(f"  -> tap-conv int8 speedup x{t5 / t4:.2f}")


if __name__ == "__main__":
    main()
