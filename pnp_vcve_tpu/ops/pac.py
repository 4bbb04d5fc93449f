"""Pixel-adaptive convolution (PAC).

Reference: mmedit/models/backbones/sr_backbones/pac_util.py (816 LoC of
pure-torch custom autograd, used by MW-GAN's MWP_Align). The op itself is

    out(p) = sum_d K(g, p, d) * (W_d @ x(p+d)) + b
    K(g, p, d) = exp(-0.5 * ||g(p) - g(p+d)||^2)   (gaussian, summed over
                                                    guidance channels)

In JAX the custom backward (GaussKernel2dFn/PacConv2dFn) is unnecessary —
autodiff handles the composition. 3x3, stride 1, 'same' padding (the only
configuration MW-GAN uses).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["pac_conv2d", "gauss_kernel2d"]


def _shifts3(x):
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return [xp[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)]


def gauss_kernel2d(guide: jnp.ndarray) -> jnp.ndarray:
    """(b, h, w, cg) -> (b, h, w, 9): exp(-0.5 ||g(p)-g(p+d)||^2) per tap
    (pac_util.py:90-111, channel_wise=False)."""
    taps = _shifts3(guide)
    center = taps[4]
    ks = [
        jnp.exp(-0.5 * jnp.sum((t - center) ** 2, axis=-1)) for t in taps
    ]
    return jnp.stack(ks, axis=-1)


def pac_conv2d(
    x: jnp.ndarray,
    guide: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """x (b,h,w,cin); guide (b,h,w,cg); kernel (3,3,cin,cout) HWIO."""
    k = gauss_kernel2d(guide)
    taps = _shifts3(x)
    out = None
    for i, t in enumerate(taps):
        dy, dx = divmod(i, 3)
        term = jnp.einsum(
            "bhwi,io->bhwo", t * k[..., i : i + 1], kernel[dy, dx],
            preferred_element_type=jnp.float32,
        )
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)
