"""Banded PF-native block8 warp (kernels/warp_pf.py) vs the XLA block8
oracle (ops/warp.py), interpret mode on CPU.

The kernel's contract: bit-identical semantics to flow_warp(impl='block8')
for flows constant over the 8x8 macroblock grid with |MV| <= 16 px
(reference flow_warp semantics mmedit/models/common/flow_warp.py:6-50;
the MV rasterizer only emits block-constant flows and H.264 bounds the
search range, data/mv_raster.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.ops.warp import flow_warp
from pnp_vcve_tpu.kernels.drt_stack import pack_pf, unpack_pf
from pnp_vcve_tpu.kernels.warp_pf import flow_warp_pf, build_warp_tables, warp_pf


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _block_flow(rng, b, h, w, lo=-16.0, hi=16.0):
    """Random flow, constant over 8x8 blocks, |MV| <= 16."""
    fb = rng.uniform(lo, hi, (b, h // 8, w // 8, 2)).astype(np.float32)
    return jnp.asarray(np.repeat(np.repeat(fb, 8, axis=1), 8, axis=2))


def _run(x, flow, h, w, tile):
    b = x.shape[0]
    xpf = pack_pf(x, th=8)
    ypf = flow_warp_pf(xpf, flow, h, w, tile=tile)
    got = unpack_pf(ypf, h, w)
    want = flow_warp(x, flow, impl="block8")
    return np.asarray(got), np.asarray(want), np.asarray(ypf)


@pytest.mark.parametrize("tile,w", [(128, 256), (64, 256)])
def test_warp_pf_matches_block8(rng, tile, w):
    b, h, c = 1, 32, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    flow = _block_flow(rng, b, h, w)
    got, want, ypf = _run(x, flow, h, w, tile)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
    # the kernel re-zeros the PF pad ring (chained-warp safety)
    wh = w // 2
    assert np.all(ypf[:, :8] == 0) and np.all(ypf[:, 8 + h :] == 0)
    assert np.all(ypf[:, :, :8] == 0) and np.all(ypf[:, :, 8 + wh :] == 0)


def test_warp_pf_integer_and_extreme_flows(rng):
    b, h, w, c = 1, 32, 256, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    # exact +-16 integer flows: taps leave the image everywhere possible
    fb = rng.choice(np.array([-16.0, -8.0, 0.0, 8.0, 16.0]), (b, 4, 32, 2))
    flow = jnp.asarray(
        np.repeat(np.repeat(fb.astype(np.float32), 8, axis=1), 8, axis=2)
    )
    got, want, _ = _run(x, flow, h, w, 128)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_warp_pf_batch2(rng):
    b, h, w, c = 2, 16, 128, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    flow = _block_flow(rng, b, h, w)
    got, want, _ = _run(x, flow, h, w, 64)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_warp_pf_odd_nby_single_band_steps(rng):
    """h=24 (nby=3, odd) takes the nb=1 single-band-per-step schedule —
    the fallback when bands can't pair (kernels/warp_pf.py _kernel)."""
    b, h, w, c = 1, 24, 128, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    flow = _block_flow(rng, b, h, w)
    got, want, _ = _run(x, flow, h, w, 64)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_warp_pf_zero_flow_is_identity(rng):
    b, h, w, c = 1, 16, 128, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    flow = jnp.zeros((b, h, w, 2), jnp.float32)
    got, want, _ = _run(x, flow, h, w, 64)
    np.testing.assert_allclose(got, np.asarray(x), atol=1e-6)


def test_warp_pf_tables_shapes(rng):
    b, h, w, tile = 1, 32, 256, 128
    flow = _block_flow(rng, b, h, w)
    s_same, s_x, vm = build_warp_tables(flow, h, w, tile)
    assert s_same.shape == (b, h // 8, 2, tile, 256)[:1] + s_same.shape[1:]
    # clamp contract: tables built from |MV|>16 equal tables from clamped MV
    big = flow * 4.0
    s2, sx2, vm2 = build_warp_tables(
        jnp.clip(big, -16.0, 16.0), h, w, tile
    )
    s3, sx3, vm3 = build_warp_tables(big, h, w, tile)
    for a, bb in ((s2, s3), (sx2, sx3), (vm2, vm3)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))


def test_warp_pf_compact_matches_dense(rng):
    """The compact in-kernel table build (warp_pf_compact) is bit-identical
    to the dense-table path (it is an opt-in perf variant; see the
    flow_warp_pf docstring for the measured tradeoff)."""
    from pnp_vcve_tpu.kernels.warp_pf import (
        build_warp_tables_compact, warp_pf_compact,
    )

    b, h, w, c, tile = 1, 32, 256, 64, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    flow = _block_flow(rng, b, h, w)
    xpf = pack_pf(x, th=8)
    s_same, s_x, vm = build_warp_tables(flow, h, w, tile)
    dense = warp_pf(xpf, s_same, s_x, vm, h, w, tile)
    tbl = build_warp_tables_compact(flow, h, w, tile)
    compact = warp_pf_compact(xpf, tbl, h, w, tile)
    np.testing.assert_array_equal(np.asarray(compact), np.asarray(dense))


def test_model_pf_resident_matches_block8(rng):
    """Flagship forward with warp_impl='pf' (the PF-resident pipeline:
    warp_pf + input_conv_pf(part_pf) + PF carries + fused head) equals the
    warp_impl='block8' pallas path on block-constant flows with |MV|<=16.
    mid_channels=64 is the PF-resident contract (128-lane PF)."""
    from pnp_vcve_tpu.models import PnPVCVE

    b, t, h, w = 1, 3, 16, 32
    lrs = jnp.asarray(rng.random((b, t, h, w, 3), np.float32))
    qps = jnp.asarray(rng.random((b, t), np.float32))
    slices = jnp.asarray(np.where(rng.random((b, t)) < 0.5, 73.0, 66.0))
    fb = rng.uniform(-16.0, 16.0, (b, t, h // 8, w // 8, 4)).astype(np.float32)
    mvs = jnp.asarray(np.repeat(np.repeat(fb, 8, axis=2), 8, axis=3))
    base_qps = jnp.full((b, t), 15.0 / 255.0)
    par = jnp.asarray((rng.random((b, t, h, w, 3)) > 0.5).astype(np.float32) / 255.0)

    kw = dict(
        mid_channels=64, num_blocks=2, num_experts=2, remat=False,
        use_pallas_kernels=True,
    )
    ref_model = PnPVCVE(**kw, warp_impl="block8")
    params = ref_model.init(
        jax.random.PRNGKey(0), lrs, qps, slices, mvs, base_qps, par
    )
    expected = ref_model.apply(params, lrs, qps, slices, mvs, base_qps, par)

    pf_model = PnPVCVE(**kw, warp_impl="pf")
    got = pf_model.apply(params, lrs, qps, slices, mvs, base_qps, par)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=3e-4, rtol=1e-4
    )


def test_model_pf_resident_guards():
    """warp_impl='pf' refuses unsupported configurations loudly."""
    from pnp_vcve_tpu.models import PnPVCVE

    b, t, h, w = 1, 2, 16, 32
    args = (
        jnp.zeros((b, t, h, w, 3)), jnp.zeros((b, t)),
        jnp.full((b, t), 73.0), jnp.zeros((b, t, h, w, 4)),
        jnp.zeros((b, t)), jnp.zeros((b, t, h, w, 3)),
    )
    bad = PnPVCVE(
        mid_channels=64, num_blocks=1, num_experts=2, remat=False,
        use_pallas_kernels=False, warp_impl="pf",
    )
    with pytest.raises(ValueError, match="use_pallas_kernels"):
        bad.init(jax.random.PRNGKey(0), *args)
    bad_c = PnPVCVE(
        mid_channels=8, num_blocks=1, num_experts=2, remat=False,
        use_pallas_kernels=True, warp_impl="pf",
    )
    with pytest.raises(ValueError, match="mid_channels"):
        bad_c.init(jax.random.PRNGKey(0), *args)
