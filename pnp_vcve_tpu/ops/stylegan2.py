"""StyleGAN2 native-op equivalents (reference dependency surface:
mmcv.ops.fused_bias_leakyrelu and mmcv.ops.upfirdn2d, imported by the
upstream synthesizer components, mmedit/models/components/stylegan2/
modules.py:13-15).

On GPU these are custom CUDA kernels purely for fusion; under XLA the
straightforward expressions fuse for free, so plain jnp is the TPU-native
form. Semantics follow the official StyleGAN2 ops:

- fused_bias_leakyrelu: ``scale * leaky_relu(x + bias)`` with the
  sqrt(2)-ish gain (default scale = 2**0.5).
- upfirdn2d: zero-upsample by ``up``, pad, correlate with the 2D FIR
  kernel, downsample by ``down`` (the official op correlates — i.e.
  convolves with the flipped kernel).

Layout: NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fused_bias_leakyrelu", "upfirdn2d", "make_resample_kernel"]


def fused_bias_leakyrelu(
    x: jnp.ndarray,
    bias: jnp.ndarray,
    negative_slope: float = 0.2,
    scale: float = 2**0.5,
) -> jnp.ndarray:
    """(n, h, w, c) + (c,) -> scale * leaky_relu(x + bias)."""
    y = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return scale * jax.nn.leaky_relu(y, negative_slope)


def make_resample_kernel(k) -> np.ndarray:
    """1D/2D FIR -> normalized 2D kernel (official make_kernel)."""
    k = np.asarray(k, np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    return k / k.sum()


def upfirdn2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    up: int = 1,
    down: int = 1,
    pad: tuple = (0, 0),
) -> jnp.ndarray:
    """Upsample-FIR-downsample (official upfirdn2d semantics, NHWC).

    pad: (pad0, pad1) applied to both spatial dims (before the filter).
    """
    n, h, w, c = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    if up > 1:
        x = jnp.zeros((n, h, up, w, up, c), x.dtype).at[:, :, 0, :, 0, :].set(x)
        x = x.reshape(n, h * up, w * up, c)
    x = jnp.pad(
        x,
        ((0, 0), (max(pad0, 0), max(pad1, 0)), (max(pad0, 0), max(pad1, 0)), (0, 0)),
    )
    if pad0 < 0 or pad1 < 0:
        x = x[
            :,
            max(-pad0, 0) : x.shape[1] - max(-pad1, 0),
            max(-pad0, 0) : x.shape[2] - max(-pad1, 0),
        ]

    # correlate with the kernel per channel (flip for lax conv semantics)
    k = jnp.asarray(kernel, x.dtype)[::-1, ::-1]
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    if down > 1:
        out = out[:, ::down, ::down]
    return out
