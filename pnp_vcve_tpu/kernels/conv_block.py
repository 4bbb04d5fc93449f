"""Pallas TPU kernels for the BAE hot path.

Motivation (measured on the target chip): XLA's conv lowering for 3x3 C=64
feature maps at 720p reaches ~9 TFLOP/s of a ~110 TFLOP/s machine peak —
the K=N=64 contraction shapes starve the 128x128 MXU, and every op round-
trips the 118 MB feature map through HBM. These kernels keep a row band of
the feature map resident in VMEM, express the conv as K-stacked matmuls
(contraction 3*C per tap row instead of C), and read the input from HBM
exactly once per output.

- :func:`conv3x3_pallas` — 'same' 3x3 conv, NHWC, per-sample kernels (the
  MoE mixed kernels; broadcast the kernel for the shared-weight case).
- :func:`drt_block_pallas` — the whole DRT residual block (reference
  semantics sr_backbone_utils.py:304-313: channel_first, one_layer,
  with_se) fused into ONE kernel:

      dyres = sum_r par_r * (x @ PK_r)
      h     = relu(gamma * dynconv3x3(x) + dyres)     [gamma after bias]
      out   = x + conv1_3x3(h)

  One HBM read of x, one HBM write of out; the intermediate h never leaves
  VMEM. The stage-2 conv needs a 1-row halo of h, so stage 1 computes TH+2
  rows (recomputing 2 boundary rows per band — ~12% extra MXU work for a
  ~3x traffic cut).

Grid: (batch, row-bands). Input bands overlap, which BlockSpec cannot
express, so inputs stay in HBM (memory_space=ANY) and each program DMAs its
band into a VMEM scratch buffer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["conv3x3_pallas", "drt_block_pallas"]


def _round_up(v: int, m: int = 8) -> int:
    """Mosaic DMA slices along the sublane (second-minor) dim must be
    8-aligned; widths are padded up with zero columns."""
    return -(-v // m) * m


def _band_conv(band_ref, w_stack, rows, cols, c_in, c_out, win_ref):
    """3x3 conv over a (rows+2, cols+2, C) VMEM band -> (rows*cols, c_out) f32.

    For each dy the three dx-shifted windows are staged into ``win_ref`` at
    channel offsets 0/C/2C (ref stores normalize Mosaic vector layouts —
    a direct lane-dim concatenate of shifted slices is unsupported), then
    one (rows*cols, 3C) @ (3C, c_out) matmul runs per dy: contraction 3C
    instead of C, which is what keeps the MXU fed at C=64.
    """
    acc = jnp.zeros((rows * cols, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            win_ref[0:rows, 0:cols, dx * c_in : (dx + 1) * c_in] = band_ref[
                dy : dy + rows, dx : dx + cols
            ]
        win = win_ref[0:rows, 0:cols]
        acc = acc + jnp.dot(
            win.reshape(rows * cols, 3 * c_in), w_stack[dy],
            preferred_element_type=jnp.float32,
        )
    return acc


def _conv_kernel(xp_hbm, w_ref, b_ref, o_ref, band, win, sem, *, th, wdt, c_in, c_out):
    bi = pl.program_id(0)
    ri = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_hbm.at[bi, pl.ds(ri * th, th + 2)], band, sem
    )
    dma.start()
    dma.wait()
    acc = _band_conv(band, w_ref[0], th, wdt, c_in, c_out, win)
    acc = acc + b_ref[0, 0].astype(jnp.float32)
    o_ref[0] = acc.reshape(th, wdt, c_out).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th",))
def conv3x3_pallas(x, kernels, biases, th: int = 16):
    """'same' 3x3 conv with per-sample kernels.

    Args:
      x: (b, h, w, c_in) NHWC.
      kernels: (b, 3, 3, c_in, c_out) HWIO per sample.
      biases: (b, c_out).
      th: output rows per program (h must divide by it).
    """
    b, h, w, c_in = x.shape
    c_out = kernels.shape[-1]
    if h % th:
        raise ValueError(f"h={h} not divisible by th={th}")

    wp = _round_up(w + 2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, wp - w - 1), (0, 0)))
    w_stacked = kernels.reshape(b, 3, 3 * c_in, c_out)
    biases = biases.reshape(b, 1, c_out)

    kernel = functools.partial(_conv_kernel, th=th, wdt=w, c_in=c_in, c_out=c_out)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, 3 * c_in, c_out), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c_out), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c_out), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, c_in), x.dtype),
            pltpu.VMEM((th, w, 3 * c_in), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp, w_stacked, biases)


def _drt_kernel(
    xp2_hbm, parp_hbm, w2_ref, b2_ref, pk_ref, w1_ref, b1_ref, g_ref, o_ref,
    band, parband, win, hband, sem, psem, *, th, wdt, c, h_total,
):
    bi = pl.program_id(0)
    ri = pl.program_id(1)

    # input band: padded-by-2 x rows [ri*th, ri*th + th+4)
    dma = pltpu.make_async_copy(xp2_hbm.at[bi, pl.ds(ri * th, th + 4)], band, sem)
    dma.start()
    # partition band padded-by-1: rows [ri*th, ri*th + th+2)
    pdma = pltpu.make_async_copy(
        parp_hbm.at[bi, pl.ds(ri * th, th + 2)], parband, psem
    )
    pdma.start()
    dma.wait()
    pdma.wait()

    rows1 = th + 2          # stage-1 rows (output rows + 1 halo each side)
    cols1 = wdt + 2         # stage-1 cols (full width + 1 halo each side)

    # stage 1: dynamic conv (+bias, *gamma) + partition path + relu
    acc = _band_conv(band, w2_ref[0], rows1, cols1, c, c, win)
    acc = (acc + b2_ref[0, 0].astype(jnp.float32)) * g_ref[0, 0].astype(jnp.float32)

    xc = band[1 : 1 + rows1, 1 : 1 + cols1]  # x over the stage-1 grid
    y = jnp.dot(
        xc.reshape(rows1 * cols1, c), pk_ref[0].reshape(c, 3 * c),
        preferred_element_type=jnp.float32,
    ).reshape(rows1 * cols1, 3, c)
    par = parband[0:rows1, 0:cols1].reshape(rows1 * cols1, 3, 1).astype(jnp.float32)
    acc = acc + jnp.sum(y * par, axis=1)

    hmid = jnp.maximum(acc, 0.0).reshape(rows1, cols1, c)

    # zero the out-of-image halo (conv 'same' pads the *feature map*):
    # global row of local row k is ri*th + k - 1; cols -1 and wdt are pad.
    grow = jax.lax.broadcasted_iota(jnp.int32, (rows1, cols1), 0) + ri * th - 1
    gcol = jax.lax.broadcasted_iota(jnp.int32, (rows1, cols1), 1) - 1
    valid = (grow >= 0) & (grow < h_total) & (gcol >= 0) & (gcol < wdt)
    hband[0:rows1, 0:cols1] = jnp.where(valid[..., None], hmid, 0.0).astype(band.dtype)

    # stage 2: plain conv1 over hmid + residual
    out = _band_conv(hband, w1_ref[0], th, wdt, c, c, win)
    out = out + b1_ref[0, 0].astype(jnp.float32)
    resid = band[2 : 2 + th, 2 : 2 + wdt].reshape(th * wdt, c).astype(jnp.float32)
    o_ref[0] = (resid + out).reshape(th, wdt, c).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("th",))
def drt_block_pallas(x, par, dyn_kernels, dyn_biases, par_kernel, conv1_kernel,
                     conv1_bias, gamma, th: int = 16):
    """Fused DRT block (channel_first, one_layer, with_se).

    Args:
      x: (b, h, w, c).
      par: (b, h, w, 3) partition map.
      dyn_kernels: (b, 3, 3, c, c) per-sample mixed expert kernels.
      dyn_biases: (b, c) per-sample mixed biases.
      par_kernel: (c, 3, c) stacked partition 1x1 kernels (shared).
      conv1_kernel: (3, 3, c, c) HWIO (shared).
      conv1_bias: (c,).
      gamma: (b, c) SE gains.

    Returns: (b, h, w, c) = x + conv1(relu(gamma*dynconv(x) + dyres)).
    """
    b, h, w, c = x.shape
    if h % th:
        raise ValueError(f"h={h} not divisible by th={th}")

    wp2 = _round_up(w + 4)
    wp1 = _round_up(w + 2)
    xp2 = jnp.pad(x, ((0, 0), (2, 2), (2, wp2 - w - 2), (0, 0)))
    parp = jnp.pad(par, ((0, 0), (1, 1), (1, wp1 - w - 1), (0, 0)))
    w2 = dyn_kernels.reshape(b, 3, 3 * c, c)
    b2 = dyn_biases.reshape(b, 1, c)
    g = gamma.reshape(b, 1, c)
    pk = jnp.broadcast_to(par_kernel[None], (b, c, 3, c))
    w1 = jnp.broadcast_to(conv1_kernel.reshape(1, 3, 3 * c, c), (b, 3, 3 * c, c))
    b1 = jnp.broadcast_to(conv1_bias.reshape(1, 1, c), (b, 1, c))

    kernel = functools.partial(_drt_kernel, th=th, wdt=w, c=c, h_total=h)
    return pl.pallas_call(
        kernel,
        grid=(b, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # xp2
            pl.BlockSpec(memory_space=pl.ANY),   # parp
            pl.BlockSpec((1, 3, 3 * c, c), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, 3, c), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3 * c, c), lambda bi, ri: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda bi, ri: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, w, c), lambda bi, ri: (bi, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 4, wp2, c), x.dtype),
            pltpu.VMEM((th + 2, wp1, 3), par.dtype),
            pltpu.VMEM((th + 2, w + 2, 3 * c), x.dtype),
            pltpu.VMEM((th + 2, wp1, c), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(xp2, parp, w2, b2, pk, w1, b1, g)
