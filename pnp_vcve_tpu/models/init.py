"""Weight initializers matching the reference's torch init distributions.

- :func:`kaiming_uniform_expert` — per-expert kaiming-uniform for the MoE
  kernel bank (reference Dynamic_conv2d._initialize_weights,
  sr_backbone_utils.py:160-164), with fan-in computed from the conv receptive
  field only (the expert axis is not fan-in).
- :func:`scaled_kaiming_normal` — mmcv ``kaiming_init(mode='fan_in')`` normal
  followed by the x0.1 residual-branch scaling (sr_backbone_utils.py:41-57,
  used at 291-292).
- :func:`torch_conv_default` / :func:`torch_conv_bias_default` — torch
  ``nn.Conv2d`` default init (kaiming uniform with a=sqrt(5)) for convs the
  reference leaves untouched (e.g. the input convs, conv_hr, conv_last).

These matter for training-from-scratch parity; checkpoint-loading parity is
handled by the converter instead.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = [
    "kaiming_uniform_expert",
    "scaled_kaiming_normal",
    "torch_conv_default",
    "torch_conv_bias_default",
    "torch_dense_default",
    "torch_dense_bias_default",
]


def _conv_fan_in(shape) -> int:
    """fan_in for HWIO (kh, kw, cin, cout) or expert bank (K, kh, kw, cin, cout)."""
    if len(shape) == 5:
        _, kh, kw, cin, _ = shape
    elif len(shape) == 4:
        kh, kw, cin, _ = shape
    elif len(shape) == 3:
        # stacked 1x1 kernels (cin, r, cout): fan_in of each 1x1 conv is cin
        return shape[0]
    elif len(shape) == 2:
        return shape[0]
    else:
        raise ValueError(f"Unsupported kernel shape {shape}")
    return kh * kw * cin


def kaiming_uniform_expert(key, shape, dtype=jnp.float32):
    """Uniform(-b, b) with b = sqrt(6 / fan_in) (kaiming uniform, gain sqrt(2))."""
    bound = math.sqrt(6.0 / _conv_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def scaled_kaiming_normal(scale: float = 0.1):
    """Normal(0, sqrt(2/fan_in)) * scale."""

    def init(key, shape, dtype=jnp.float32):
        std = math.sqrt(2.0 / _conv_fan_in(shape))
        return jax.random.normal(key, shape, dtype) * (std * scale)

    return init


def torch_conv_default(key, shape, dtype=jnp.float32):
    """torch nn.Conv2d default: kaiming uniform with a=sqrt(5) -> bound sqrt(1/fan_in)."""
    bound = math.sqrt(1.0 / _conv_fan_in(shape))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_default(fan_in: int):
    """torch conv/linear bias default: Uniform(-1/sqrt(fan_in), 1/sqrt(fan_in))."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


# Dense layers: torch nn.Linear default equals the conv default with
# fan_in = in_features (flax Dense kernels are (in, out)).
torch_dense_default = torch_conv_default
torch_dense_bias_default = torch_conv_bias_default
