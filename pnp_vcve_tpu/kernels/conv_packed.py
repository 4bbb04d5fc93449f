"""Packed-layout 3x3 conv Pallas kernel (see kernels/packing.py).

Measured context: XLA's conv for C=64 at 720p reaches ~9 TFLOP/s on a
~110 TFLOP/s chip. Packing pixel pairs into full 128-wide lanes turns the
conv into (rows*w/2, 6C) @ (6C, 2C) matmuls — full-lane MXU shapes at 1.5x
logical MACs — with the feature map read from HBM exactly once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .packing import pack_conv3x3_kernel, pack_conv3x3_kernel_per_tap

__all__ = ["conv3x3_packed", "conv3x3_packed_v2"]


def _round_up(v: int, m: int) -> int:
    return -(-v // m) * m


def _kernel(xp_hbm, w_ref, b_ref, o_ref, band, win, sem, *, th, wh, c2):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    dma = pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(ri * th, th + 2)], band, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((th * wh, c2), jnp.float32)
    for dy in range(3):
        for k in range(3):
            win[0:th, 0:wh, k * c2 : (k + 1) * c2] = band[dy : dy + th, k : k + wh]
        acc = acc + jnp.dot(
            win[0:th, 0:wh].reshape(th * wh, 3 * c2),
            w_ref[0, dy],
            preferred_element_type=jnp.float32,
        )
    acc = acc + b_ref[0, 0].astype(jnp.float32)
    o_ref[0] = acc.reshape(th, wh, c2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th",))
def conv3x3_packed(x, kernels, biases, th: int = 16):
    """'same' 3x3 conv, per-sample kernels, pixel-pair packed MXU layout.

    Args:
      x: (b, h, w, c) NHWC, w even.
      kernels: (b, 3, 3, c, c_out) HWIO per sample.
      biases: (b, c_out).
    """
    b, h, w, c = x.shape
    c_out = kernels.shape[-1]
    if w % 2 or h % th:
        raise ValueError(f"need even w and h%th==0, got {h}x{w}, th={th}")
    c2 = 2 * c
    wh = w // 2
    wp = _round_up(wh + 2, 8)
    rpad = 2 * wp - w - 2

    xp = jnp.pad(x, ((0, 0), (1, 1), (2, rpad), (0, 0)))
    xp = xp.reshape(b, h + 2, wp, c2)

    w_packed = jax.vmap(lambda k: jnp.stack(
        [pack_conv3x3_kernel(k)[dy] for dy in range(3)]
    ))(kernels)  # (b, 3, 6c, 2*c_out)
    b_packed = jnp.concatenate([biases, biases], axis=-1).reshape(b, 1, 2 * c_out)

    kernel = functools.partial(_kernel, th=th, wh=wh, c2=c2)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, 3 * c2, 2 * c_out), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * c_out), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wh, 2 * c_out), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wh, 2 * c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, c2), x.dtype),
            pltpu.VMEM((th, wh, 3 * c2), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, w_packed, b_packed)
    return out.reshape(b, h, w, c_out)


def _kernel_v2(xp_hbm, w_ref, b_ref, o_ref, band, sem, *, th, wh, c2):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    dma = pltpu.make_async_copy(xp_hbm.at[bi, pl.ds(ri * th, th + 2)], band, sem)
    dma.start()
    dma.wait()

    acc = jnp.zeros((th * wh, c2), jnp.float32)
    for dy in range(3):
        for k in range(3):
            win = band[dy : dy + th, k : k + wh].reshape(th * wh, c2)
            acc = acc + jnp.dot(
                win, w_ref[0, dy, k], preferred_element_type=jnp.float32
            )
    acc = acc + b_ref[0, 0].astype(jnp.float32)
    o_ref[0] = acc.reshape(th, wh, c2).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th",))
def conv3x3_packed_v2(x, kernels, biases, th: int = 16):
    """Staging-free packed conv: 9 full-lane (M,128)@(128,128) matmuls per
    band, reading band slices directly (no VMEM window copies)."""
    b, h, w, c = x.shape
    c_out = kernels.shape[-1]
    if w % 2 or h % th:
        raise ValueError(f"need even w and h%th==0, got {h}x{w}, th={th}")
    c2 = 2 * c
    wh = w // 2
    wp = _round_up(wh + 2, 8)
    rpad = 2 * wp - w - 2

    xp = jnp.pad(x, ((0, 0), (1, 1), (2, rpad), (0, 0)))
    xp = xp.reshape(b, h + 2, wp, c2)

    w_packed = jax.vmap(pack_conv3x3_kernel_per_tap)(kernels)  # (b,3,3,2c,2co)
    b_packed = jnp.concatenate([biases, biases], axis=-1).reshape(b, 1, 2 * c_out)

    kernel = functools.partial(_kernel_v2, th=th, wh=wh, c2=c2)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, 3, c2, 2 * c_out), lambda bi, ri: (bi, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * c_out), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, wh, 2 * c_out), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wh, 2 * c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, c2), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, w_packed, b_packed)
    return out.reshape(b, h, w, c_out)
