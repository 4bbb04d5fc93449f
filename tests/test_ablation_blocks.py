"""Ablation block tests (SFT/CBAM/DRConv research variants)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.models.ablation_blocks import (
    DRConv2d,
    ResidualBlockDynamicCBAM,
    ResidualBlockDynamicSFT,
    ResidualBlockDynamicSFTRes,
    SFTLayer,
    SpatialAttention,
    SpatialAttentionConv,
    SpatialAttentionSimple,
    assign_region,
)

B, H, W, C = 2, 12, 12, 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_sft_layer_no_plus_one_quirk(rng):
    """With zero-initialized convs the output is 0 (feat*scale+shift, NOT
    feat*(scale+1)+shift) — the reference quirk."""
    m = SFTLayer(mid_channels=C)
    feat = jnp.asarray(rng.random((B, H, W, C), np.float32))
    side = jnp.asarray(rng.random((B, H, W, C // 2), np.float32))
    params = m.init(jax.random.PRNGKey(0), feat, side)
    zeroed = jax.tree_util.tree_map(jnp.zeros_like, params)
    out = m.apply(zeroed, feat, side)
    np.testing.assert_array_equal(np.asarray(out), 0.0)
    out2 = m.apply(params, feat, side)
    assert out2.shape == feat.shape


@pytest.mark.parametrize("cls", [SpatialAttention, SpatialAttentionConv, SpatialAttentionSimple])
def test_spatial_attention_shapes(rng, cls):
    m = cls()
    x = jnp.asarray(rng.random((B, H, W, C), np.float32))
    par = jnp.asarray(rng.random((B, H, W, 3), np.float32))
    params = m.init(jax.random.PRNGKey(0), x, par)
    out = m.apply(params, x, par)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_assign_region_forward_and_straight_through_grad(rng):
    r = 3
    ko = jnp.asarray(rng.standard_normal((B, r, H, W, C)).astype(np.float32))
    guide = jnp.asarray(rng.standard_normal((B, H, W, r)).astype(np.float32))
    out = assign_region(ko, guide)
    sel = np.take_along_axis(
        np.asarray(ko), np.argmax(np.asarray(guide), -1)[:, None, ..., None], axis=1
    )[:, 0]
    np.testing.assert_allclose(np.asarray(out), sel, atol=1e-6)

    # guide grad is the softmax-Jacobian straight-through (reference
    # asign_index.backward, partition_aware.py:43-51)
    g = jnp.ones_like(out)
    _, vjp = jax.vjp(assign_region, ko, guide)
    gk, gg = vjp(g)
    sm = jax.nn.softmax(np.asarray(guide), axis=-1)
    raw = np.einsum("bhwc,brhwc->bhwr", np.asarray(g), np.asarray(ko))
    expected = sm * (raw - (sm * raw).sum(-1, keepdims=True))
    np.testing.assert_allclose(np.asarray(gg), expected, atol=1e-5)
    assert np.isfinite(np.asarray(gk)).all()


def test_drconv_forward(rng):
    m = DRConv2d(channels=C, out_channels=C, region_num=3)
    x = jnp.asarray(rng.random((B, H, W, C), np.float32))
    par = jnp.asarray(rng.random((B, H, W, 3), np.float32))
    params = m.init(jax.random.PRNGKey(0), x, par)
    out = m.apply(params, x, par)
    assert out.shape == (B, H, W, C)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize("channel_first", [True, False])
def test_sft_res_blocks(rng, channel_first):
    x = jnp.asarray(rng.random((B, H, W, C), np.float32))
    side = jnp.asarray(rng.random((B, H, W, C // 2), np.float32))
    weights = jax.nn.softmax(jnp.asarray(rng.random((B, 4), np.float32)), -1)
    gamma = jnp.asarray(rng.random((B, C), np.float32))

    m = ResidualBlockDynamicSFTRes(
        mid_channels=C, num_experts=4, with_bias=True, with_se=True,
        channel_first=channel_first,
    )
    params = m.init(jax.random.PRNGKey(0), x, side, weights, gamma)
    out = m.apply(params, x, side, weights, gamma)
    assert out.shape == x.shape

    m2 = ResidualBlockDynamicSFT(mid_channels=C, num_experts=4)
    params2 = m2.init(jax.random.PRNGKey(0), x, side, weights)
    assert m2.apply(params2, x, side, weights).shape == x.shape

    par3 = jnp.asarray(rng.random((B, H, W, 3), np.float32))
    m3 = ResidualBlockDynamicCBAM(mid_channels=C, num_experts=4,
                                  channel_first=channel_first)
    params3 = m3.init(jax.random.PRNGKey(0), x, par3, weights)
    assert m3.apply(params3, x, par3, weights).shape == x.shape

    m4 = ResidualBlockDynamicSFTRes(mid_channels=C, num_experts=4, drconv=True,
                                    channel_first=channel_first)
    params4 = m4.init(jax.random.PRNGKey(0), x, par3, weights)
    assert m4.apply(params4, x, par3, weights).shape == x.shape


def test_caa_alternates(rng):
    """Research CAA predictors (domain_aware.py:14-156)."""
    from pnp_vcve_tpu.models.caa import (
        JpegDomain,
        OneForAllDomain,
        QENet,
        ScaleAwareConv,
    )

    nf = 8
    feat = jnp.asarray(rng.random((B, H, W, nf), np.float32))
    qps = jnp.asarray(rng.random((B,), np.float32) * 50)
    base = jnp.asarray(rng.random((B,), np.float32) * 50)

    for m in (JpegDomain(n_atten=2, nf=nf), QENet(nf=nf)):
        params = m.init(jax.random.PRNGKey(0), feat, qps, base)
        out = m.apply(params, feat, qps, base)
        assert out.shape == feat.shape and np.isfinite(np.asarray(out)).all()

    m = OneForAllDomain(nf=nf)
    params = m.init(jax.random.PRNGKey(0), feat, qps)
    assert m.apply(params, feat, qps).shape == feat.shape

    m = ScaleAwareConv(channels=nf, out_channels=nf, num_experts=3, use_bias=True)
    params = m.init(jax.random.PRNGKey(0), feat, qps)
    out = m.apply(params, feat, qps)
    assert out.shape == feat.shape and np.isfinite(np.asarray(out)).all()
