"""Pixel-pair packed layout for C=64 feature maps.

TPU vector lanes are 128 wide; a 64-channel feature map wastes half of
every VMEM tile and every MXU pass. Viewing two adjacent pixels as one
128-lane row — ``(h, w, 64) -> (h, w/2, 128)``, a free reshape — restores
full lane utilization. A 3x3 conv in packed layout becomes, per kernel row
dy, ONE matmul ``(rows*w/2, 384) @ (384, 128)``: the window is 3 packed
columns (= 6 original columns), and the packed kernel computes both the
even and the odd output pixel of each pair.

Packed-kernel row layout for output pair (2j, 2j+1), window = packed
padded cols [j, j+1, j+2] = original cols [2j-2 .. 2j+3]:

    rows   0: 64   orig col 2j-2   (unused -> zero)
    rows  64:128   orig col 2j-1   K[:, dx=0] -> even
    rows 128:192   orig col 2j     K[:, dx=1] -> even, K[:, dx=0] -> odd
    rows 192:256   orig col 2j+1   K[:, dx=2] -> even, K[:, dx=1] -> odd
    rows 256:320   orig col 2j+2   K[:, dx=2] -> odd
    rows 320:384   orig col 2j+3   (unused -> zero)

Cost: 1.5x the logical MACs (6-column window for 4 needed columns), paid
back several-fold by full-lane MXU shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pack_conv3x3_kernel", "pack_conv3x3_kernel_per_tap", "pack_pointwise_kernel"]


def pack_conv3x3_kernel_per_tap(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, c, c_out) HWIO -> (3, 3, 2c, 2c_out) per-(dy, packed-window-col)
    kernels for the staging-free formulation:

        out_packed[j] = sum_dy sum_k band[dy, j+k] @ W[dy, k]

    where band is the packed padded input (left pad 2 orig cols). Per
    (dy, k) the 128x128 kernel maps the two orig cols of packed window col
    k onto the even/odd outputs:

        k=0: hi (orig 2j-1) -> even via K[dy,0]
        k=1: lo (2j) -> even K[dy,1] + odd K[dy,0];  hi (2j+1) -> even
             K[dy,2] + odd K[dy,1]
        k=2: lo (2j+2) -> odd via K[dy,2]

    k=0 and k=2 are three-quarters zero (2x logical MACs overall), but no
    VMEM window staging is needed — each matmul reads the band slice
    directly.
    """
    k3, _, c, co = kernel.shape
    out = jnp.zeros((3, 3, 2 * c, 2 * co), kernel.dtype)
    out = out.at[:, 0, c : 2 * c, 0:co].set(kernel[:, 0])          # even dx=0
    out = out.at[:, 1, 0:c, 0:co].set(kernel[:, 1])                # even dx=1
    out = out.at[:, 1, c : 2 * c, 0:co].set(kernel[:, 2])          # even dx=2
    out = out.at[:, 1, 0:c, co : 2 * co].set(kernel[:, 0])         # odd  dx=0
    out = out.at[:, 1, c : 2 * c, co : 2 * co].set(kernel[:, 1])   # odd  dx=1
    out = out.at[:, 2, 0:c, co : 2 * co].set(kernel[:, 2])         # odd  dx=2
    return out


def pack_conv3x3_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, c, c_out) HWIO -> (3, 6*c, 2*c_out) packed form."""
    k3, _, c, co = kernel.shape
    out = jnp.zeros((3, 6 * c, 2 * co), kernel.dtype)
    for dx in range(3):
        # even output (channels 0:co) reads orig col 2j-1+dx = window row dx+1
        out = out.at[:, (dx + 1) * c : (dx + 2) * c, 0:co].set(kernel[:, dx])
        # odd output (channels co:2co) reads orig col 2j+dx = window row dx+2
        out = out.at[:, (dx + 2) * c : (dx + 3) * c, co : 2 * co].set(kernel[:, dx])
    return out


def pack_pointwise_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(c, n) 1x1 kernel -> (2c, 2n) block-diagonal packed form."""
    c, n = kernel.shape
    out = jnp.zeros((2 * c, 2 * n), kernel.dtype)
    out = out.at[0:c, 0:n].set(kernel)
    out = out.at[c : 2 * c, n : 2 * n].set(kernel)
    return out


def pack_conv3x3_kernel_ab(kernel: jnp.ndarray):
    """(3, 3, c, c_out) HWIO -> (W_A, W_B), each (3, 2c, 2c_out): the
    2-matmul-per-row packed formulation.

    For output packed col j (pixels 2j, 2j+1) the 3 horizontal taps read
    pixels 2j-1..2j+2 = the center pair (lo[j], hi[j]) plus the cross-pair
    lanes (hi[j-1], lo[j+1]). So per dy:

        out[j] = A[j] @ W_A[dy] + B[j] @ W_B[dy]
        A[j] = band[j]                      (lo[j], hi[j])     - DENSE kernel
        B[j] = (band[j-1].hi, band[j+1].lo) (cross-pair lanes) - half-dense

    vs the 3-tap packed form (pack_conv3x3_kernel_per_tap) whose k=0/k=2
    kernels are 3/4 zero: 2 MXU passes per dy instead of 3 (12 logical
    "c^2 units" -> 8, i.e. 1.33x waste instead of 2x). The B band is one
    lane-concat of two shifted views, built once per tile in VMEM.
    """
    _, _, c, co = kernel.shape
    wa = jnp.zeros((3, 2 * c, 2 * co), kernel.dtype)
    wa = wa.at[:, 0:c, 0:co].set(kernel[:, 1])        # lo[j] -> even (dx=1)
    wa = wa.at[:, c:, 0:co].set(kernel[:, 2])         # hi[j] -> even (dx=2)
    wa = wa.at[:, 0:c, co:].set(kernel[:, 0])         # lo[j] -> odd  (dx=0)
    wa = wa.at[:, c:, co:].set(kernel[:, 1])          # hi[j] -> odd  (dx=1)
    wb = jnp.zeros((3, 2 * c, 2 * co), kernel.dtype)
    wb = wb.at[:, 0:c, 0:co].set(kernel[:, 0])        # hi[j-1] -> even (dx=0)
    wb = wb.at[:, c:, co:].set(kernel[:, 2])          # lo[j+1] -> odd  (dx=2)
    return wa, wb
