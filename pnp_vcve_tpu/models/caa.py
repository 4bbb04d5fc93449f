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
import jax
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


class QFAttention(nn.Module):
    """FBCNN-style FiLM-gated residual block
    (reference FBCNN_QFA.py:7-19): x + gamma*conv(lrelu(conv(x))) + beta."""

    channels: int = 64

    @nn.compact
    def __call__(self, x, gamma, beta):
        y = nn.Conv(self.channels, (3, 3), padding="SAME", name="conv0")(x)
        y = nn.Conv(self.channels, (3, 3), padding="SAME", name="conv1")(
            nn.leaky_relu(y, 0.1)
        )
        return x + gamma * y + beta


class JpegDomain(nn.Module):
    """FBCNN-style CAA alternate (reference domain_aware.py:14-40): a 3-layer
    QF embedding drives sigmoid/tanh FiLM over n_atten QFAttention blocks
    applied to the propagated feature."""

    n_atten: int = 4
    use_base_qp: bool = False
    nf: int = 64

    @nn.compact
    def __call__(self, feat, qps, base_qps):
        q = (base_qps if self.use_base_qp else qps).reshape(-1, 1).astype(jnp.float32)
        emb = q
        for i in range(3):
            emb = nn.leaky_relu(nn.Dense(self.nf, name=f"qf_embed{i}")(emb), 0.1)
        gamma = nn.sigmoid(nn.Dense(self.nf, name="to_gamma")(emb))[:, None, None, :]
        beta = nn.tanh(nn.Dense(self.nf, name="to_beta")(emb))[:, None, None, :]
        for i in range(self.n_atten):
            feat = QFAttention(self.nf, name=f"atten{i}")(feat, gamma, beta)
        return feat


class OneForAllDomain(nn.Module):
    """One-hot QP-bucket channel attention (domain_aware.py:44-56)."""

    nf: int = 64

    @nn.compact
    def __call__(self, feat, qps, base_qps=None):
        onehot = jax.nn.one_hot(
            jnp.floor(qps.reshape(-1) / 10.0).astype(jnp.int32), 10
        )
        att = nn.sigmoid(
            nn.leaky_relu(nn.Dense(self.nf, name="weight_U")(onehot), 0.1)
        )
        return feat * att[:, None, None, :]


class QENet(nn.Module):
    """QP-one-hot-gated two-conv enhancement (domain_aware.py:60-89)."""

    nf: int = 64
    use_base_qp: bool = False

    @nn.compact
    def __call__(self, feat, qps, base_qps):
        q = base_qps if self.use_base_qp else qps
        onehot = jax.nn.one_hot(jnp.floor(q.reshape(-1) / 10.0).astype(jnp.int32), 10)
        x = jax.nn.softplus(nn.Dense(self.nf, name="fc")(onehot))[:, None, None, :]
        out = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", name="hid_conv1")(feat) * x)
        out = nn.relu(nn.Conv(self.nf, (3, 3), padding="SAME", name="hid_conv2")(out) * x)
        return out


class ScaleAwareConv(nn.Module):
    """Per-sample expert-mixed conv routed by a scalar QP
    (domain_aware.py:94-156) — the same mix-then-conv machinery as the DRT
    MoE conv, with an fc routing head."""

    channels: int = 64
    out_channels: int = 64
    kernel_size: int = 3
    num_experts: int = 4
    use_bias: bool = False

    @nn.compact
    def __call__(self, feat, qps):
        from pnp_vcve_tpu.models.init import kaiming_uniform_expert
        from pnp_vcve_tpu.ops.dynamic_conv import dynamic_conv2d

        k = self.kernel_size
        q = qps.reshape(-1, 1).astype(jnp.float32)
        routing = nn.Dense(self.num_experts, name="routing_fc1")(
            nn.relu(nn.Dense(64, name="routing_fc0")(q))
        )
        routing = jax.nn.softmax(routing, axis=-1)
        bank = self.param(
            "weight_pool", kaiming_uniform_expert,
            (self.num_experts, k, k, self.channels, self.out_channels),
        )
        mixed = jnp.einsum("bk,khwio->bhwio", routing, bank)
        biases = None
        if self.use_bias:
            bias_pool = self.param(
                "bias_pool", nn.initializers.zeros,
                (self.num_experts, self.out_channels),
            )
            biases = routing @ bias_pool
        return dynamic_conv2d(feat, mixed, biases)
