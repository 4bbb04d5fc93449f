"""Baseline model family tests: shapes, gradients, residual identity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.models.spynet import SPyNet
from pnp_vcve_tpu.models.baselines import STDFNet, MFQEv2
from pnp_vcve_tpu.models.alignment import (
    VOSAlignment,
    BasicDeformableAlignment,
    FVCDeformableAlignment,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_spynet_shapes_and_scale(rng):
    model = SPyNet()
    # non-multiple-of-32 size exercises the resize path
    ref = jnp.asarray(rng.random((1, 40, 52, 3), np.float32))
    supp = jnp.asarray(rng.random((1, 40, 52, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), ref, supp)
    flow = model.apply(params, ref, supp)
    assert flow.shape == (1, 40, 52, 2)
    # identical frames -> near-zero flow at init (zero init conv would not
    # hold; just check finiteness and magnitude sanity)
    assert np.isfinite(np.asarray(flow)).all()


def test_spynet_identical_frames_small_flow(rng):
    model = SPyNet(levels=3)
    x = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    params = model.init(jax.random.PRNGKey(1), x, x)
    flow = np.asarray(model.apply(params, x, x))
    assert np.abs(flow).max() < 10  # untrained, but must stay bounded


def test_stdf_shapes_and_residual(rng):
    model = STDFNet(radius=1, nf_stdf=8, nb_stdf=2, nf_stdf_out=8, nf_qe=8, nb_qe=2)
    lrs = jnp.asarray(rng.random((2, 3, 16, 16, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs)
    out = model.apply(params, lrs)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_stdf_grads(rng):
    model = STDFNet(radius=1, nf_stdf=4, nb_stdf=2, nf_stdf_out=4, nf_qe=4, nb_qe=1)
    lrs = jnp.asarray(rng.random((1, 3, 16, 16, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs)

    def loss(p):
        return jnp.mean(model.apply(p, lrs) ** 2)

    grads = jax.grad(loss)(params)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_mfqev2_shapes(rng):
    model = MFQEv2(nf=8)
    lrs = jnp.asarray(rng.random((1, 3, 32, 32, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), lrs)
    out, _ = model.apply(variables, lrs, train=True, mutable=["batch_stats"])
    assert out.shape == (1, 32, 32, 3)
    out_eval = model.apply(variables, lrs, train=False)
    assert np.isfinite(np.asarray(out_eval)).all()


def test_alignment_modules(rng):
    feat = jnp.asarray(rng.random((1, 16, 16, 8), np.float32))
    flow = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))

    out = VOSAlignment()(feat, flow)
    assert out.shape == feat.shape

    basic = BasicDeformableAlignment(channels=8, deform_groups=2)
    params = basic.init(jax.random.PRNGKey(0), feat, flow)
    out_b = basic.apply(params, feat, flow)
    assert out_b.shape == feat.shape

    fvc = FVCDeformableAlignment(channels=8, deform_groups=2)
    params = fvc.init(jax.random.PRNGKey(0), feat, flow)
    out_f = fvc.apply(params, feat, flow)
    assert out_f.shape == feat.shape


def test_basic_alignment_zero_offsets_reduce_to_conv(rng):
    """With the zero-initialized offset head, offsets equal the flow and the
    mask is 0.5 everywhere — outputs must be finite and flow-dependent."""
    feat = jnp.asarray(rng.random((1, 12, 12, 4), np.float32))
    flow0 = jnp.zeros((1, 12, 12, 2))
    flow1 = jnp.ones((1, 12, 12, 2)) * 2.0
    m = BasicDeformableAlignment(channels=4, deform_groups=1)
    params = m.init(jax.random.PRNGKey(0), feat, flow0)
    o0 = np.asarray(m.apply(params, feat, flow0))
    o1 = np.asarray(m.apply(params, feat, flow1))
    assert np.isfinite(o0).all() and np.isfinite(o1).all()
    assert np.abs(o0 - o1).max() > 1e-6
