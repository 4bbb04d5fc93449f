"""CAA (compression-aware adaptation) hyper-network heads.

Tiny MLPs mapping per-frame codec metadata to per-frame BAE parameters
(reference: mmedit/models/backbones/sr_backbones/domain_aware.py):

- :class:`BasePredictor` — CRF (or slice code) -> K expert routing weights
  (domain_aware.py:172-183).
- :class:`SEModule` — QP -> per-channel gain gamma via a squeeze-excite MLP
  with hard-sigmoid (domain_aware.py:201-222); the shipped flagship config
  uses this (``with_se=True``).
- :class:`BiasPredictor` — QP -> FiLM (gamma, beta) (domain_aware.py:185-199);
  research alternative kept for config parity.

All heads take scalars shaped ``(b, t)`` and are batched over frames with a
single dense matmul — there is no per-frame loop.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["BasePredictor", "BiasPredictor", "SEModule"]


class BasePredictor(nn.Module):
    """CRF -> expert routing weights: Dense(1->nf), ReLU, Dense(nf->K)[, softmax]."""

    nf: int = 64
    num_experts: int = 6
    softmax: bool = True

    @nn.compact
    def __call__(self, crfs: jnp.ndarray) -> jnp.ndarray:
        b, t = crfs.shape
        x = crfs.reshape(b * t, 1).astype(jnp.float32)
        x = nn.Dense(self.nf, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.num_experts, name="fc1")(x)
        if self.softmax:
            x = nn.softmax(x, axis=-1)
        return x.reshape(b, t, self.num_experts)


def hsigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """relu6(x + 3) / 3 (reference domain_aware.py:201-207)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) / 3.0


class SEModule(nn.Module):
    """QP -> per-channel gain: Dense(1->c/r, no bias), ReLU, Dense(->c, no bias), hsigmoid."""

    channels: int = 64
    reduction: int = 16

    @nn.compact
    def __call__(self, qps: jnp.ndarray):
        b, t = qps.shape
        x = qps.reshape(b * t, 1).astype(jnp.float32)
        hidden = max(1, self.channels // self.reduction)
        x = nn.Dense(hidden, use_bias=False, name="fc0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.channels, use_bias=False, name="fc1")(x)
        gamma = hsigmoid(x).reshape(b, t, self.channels)
        return gamma, None


class BiasPredictor(nn.Module):
    """QP -> FiLM (gamma, beta): embed + sigmoid/tanh heads."""

    nf: int = 64
    with_bias: bool = True

    @nn.compact
    def __call__(self, qps: jnp.ndarray):
        b, t = qps.shape
        x = qps.reshape(b * t, 1).astype(jnp.float32)
        emb = nn.relu(nn.Dense(self.nf, name="qf_embed")(x))
        gamma = nn.sigmoid(nn.Dense(self.nf, name="to_gamma")(emb)).reshape(b, t, -1)
        beta = None
        if self.with_bias:
            beta = nn.tanh(nn.Dense(self.nf, name="to_beta")(emb)).reshape(b, t, -1)
        return gamma, beta
