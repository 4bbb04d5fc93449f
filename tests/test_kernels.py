"""Pallas kernel correctness tests (interpret mode on CPU) against the
reference-parity jax ops."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.ops.dynamic_conv import conv2d_nhwc, dynamic_conv2d


B, H, W, C = 2, 32, 48, 8


@pytest.fixture(autouse=True)
def _interpret_mode():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_conv3x3_pallas_matches_op(rng):
    from pnp_vcve_tpu.kernels import conv3x3_pallas

    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    kernels = jnp.asarray(
        rng.standard_normal((B, 3, 3, C, C)).astype(np.float32) * 0.1
    )
    biases = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.1)

    expected = dynamic_conv2d(x, kernels, biases)
    got = conv3x3_pallas(x, kernels, biases, th=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-5)


def test_conv3x3_pallas_shared_kernel(rng):
    from pnp_vcve_tpu.kernels import conv3x3_pallas

    x = jnp.asarray(rng.standard_normal((1, H, W, C)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
    bias = jnp.zeros((C,))
    expected = conv2d_nhwc(x, k, bias)
    got = conv3x3_pallas(x, k[None], bias[None], th=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-5)


def drt_reference(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma):
    """Reference composition from the parity-tested ops
    (sr_backbone_utils.py:304-313 semantics)."""
    y = jnp.einsum("bhwi,iro->bhwro", x, par_k, preferred_element_type=jnp.float32)
    dyres = jnp.einsum("bhwro,bhwr->bhwo", y, par.astype(jnp.float32))
    dyn = dynamic_conv2d(x, dyn_k, dyn_b, gamma=gamma).astype(jnp.float32)
    hmid = jax.nn.relu(dyn + dyres).astype(x.dtype)
    out = conv2d_nhwc(hmid, c1_k, c1_b)
    return x + out


def test_drt_block_pallas_matches_composition(rng):
    from pnp_vcve_tpu.kernels import drt_block_pallas

    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    par = jnp.asarray((rng.random((B, H, W, 3)) > 0.5).astype(np.float32) / 255.0)
    dyn_k = jnp.asarray(rng.standard_normal((B, 3, 3, C, C)).astype(np.float32) * 0.1)
    dyn_b = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.1)
    par_k = jnp.asarray(rng.standard_normal((C, 3, C)).astype(np.float32) * 0.1)
    c1_k = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
    c1_b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.random((B, C)).astype(np.float32))

    expected = drt_reference(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma)
    got = drt_block_pallas(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma, th=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-5, rtol=1e-4)


def test_drt_block_pallas_band_boundaries(rng):
    """Band edges must match exactly (halo recompute & masking)."""
    from pnp_vcve_tpu.kernels import drt_block_pallas

    x = jnp.asarray(rng.standard_normal((1, 24, 16, C)).astype(np.float32))
    par = jnp.asarray(rng.random((1, 24, 16, 3)).astype(np.float32))
    dyn_k = jnp.asarray(rng.standard_normal((1, 3, 3, C, C)).astype(np.float32) * 0.1)
    dyn_b = jnp.zeros((1, C))
    par_k = jnp.asarray(rng.standard_normal((C, 3, C)).astype(np.float32) * 0.1)
    c1_k = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
    c1_b = jnp.zeros((C,))
    gamma = jnp.ones((1, C))

    expected = drt_reference(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma)
    got = drt_block_pallas(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma, th=8)
    # check the rows at band boundaries (7, 8, 15, 16) specifically
    np.testing.assert_allclose(
        np.asarray(got)[:, 6:18], np.asarray(expected)[:, 6:18], atol=3e-5, rtol=1e-4
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-5, rtol=1e-4)


def test_conv3x3_packed_matches_op(rng):
    from pnp_vcve_tpu.kernels.conv_packed import conv3x3_packed

    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    kernels = jnp.asarray(
        rng.standard_normal((B, 3, 3, C, C)).astype(np.float32) * 0.1
    )
    biases = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.1)
    expected = dynamic_conv2d(x, kernels, biases)
    got = conv3x3_packed(x, kernels, biases, th=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-5)


def test_pack_conv3x3_kernel_unit(rng):
    """Packed kernel reproduces both pixels of a pair on a tiny case."""
    from pnp_vcve_tpu.kernels.packing import pack_conv3x3_kernel

    c = 4
    k = jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32))
    pk = pack_conv3x3_kernel(k)
    assert pk.shape == (3, 6 * c, 2 * c)
    # window rows = orig cols [2j-2 .. 2j+3]; random window, one dy slice
    winvals = jnp.asarray(rng.standard_normal((6, c)).astype(np.float32))
    got = winvals.reshape(-1) @ pk[1]
    even = sum(winvals[dx + 1] @ k[1, dx] for dx in range(3))
    odd = sum(winvals[dx + 2] @ k[1, dx] for dx in range(3))
    np.testing.assert_allclose(np.asarray(got[:c]), np.asarray(even), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got[c:]), np.asarray(odd), atol=1e-5)


def test_conv3x3_packed_v2_matches_op(rng):
    from pnp_vcve_tpu.kernels.conv_packed import conv3x3_packed_v2

    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    kernels = jnp.asarray(
        rng.standard_normal((B, 3, 3, C, C)).astype(np.float32) * 0.1
    )
    biases = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.1)
    expected = dynamic_conv2d(x, kernels, biases)
    got = conv3x3_packed_v2(x, kernels, biases, th=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-5)


def test_drt_block_packed_matches_composition(rng):
    from pnp_vcve_tpu.kernels.drt_packed import drt_block_packed

    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    par = jnp.asarray((rng.random((B, H, W, 3)) > 0.5).astype(np.float32) / 255.0)
    dyn_k = jnp.asarray(rng.standard_normal((B, 3, 3, C, C)).astype(np.float32) * 0.1)
    dyn_b = jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.1)
    par_k = jnp.asarray(rng.standard_normal((C, 3, C)).astype(np.float32) * 0.1)
    c1_k = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
    c1_b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.random((B, C)).astype(np.float32))

    expected = drt_reference(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma)
    got = drt_block_packed(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma, th=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-5, rtol=1e-4)


def test_drt_block_packed_boundaries(rng):
    """Band boundaries + image borders, odd-ish sizes."""
    from pnp_vcve_tpu.kernels.drt_packed import drt_block_packed

    x = jnp.asarray(rng.standard_normal((1, 24, 20, C)).astype(np.float32))
    par = jnp.asarray(rng.random((1, 24, 20, 3)).astype(np.float32))
    dyn_k = jnp.asarray(rng.standard_normal((1, 3, 3, C, C)).astype(np.float32) * 0.1)
    dyn_b = jnp.zeros((1, C))
    par_k = jnp.asarray(rng.standard_normal((C, 3, C)).astype(np.float32) * 0.1)
    c1_k = jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1)
    c1_b = jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1)
    gamma = jnp.asarray(rng.random((1, C)).astype(np.float32))

    expected = drt_reference(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma)
    got = drt_block_packed(x, par, dyn_k, dyn_b, par_k, c1_k, c1_b, gamma, th=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-5, rtol=1e-4)


def test_drt_stack_packed_matches_composition(rng):
    """N chained PF blocks == N applications of the reference composition."""
    from pnp_vcve_tpu.kernels.drt_stack import drt_stack_packed

    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    par = jnp.asarray((rng.random((B, H, W, 3)) > 0.5).astype(np.float32) / 255.0)

    blocks = []
    expected = x
    for _ in range(3):
        blk = dict(
            dyn_kernels=jnp.asarray(
                rng.standard_normal((B, 3, 3, C, C)).astype(np.float32) * 0.1
            ),
            dyn_biases=jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.1),
            par_kernel=jnp.asarray(
                rng.standard_normal((C, 3, C)).astype(np.float32) * 0.1
            ),
            conv1_kernel=jnp.asarray(
                rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1
            ),
            conv1_bias=jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1),
            gamma=jnp.asarray(rng.random((B, C)).astype(np.float32)),
        )
        blocks.append(blk)
        expected = drt_reference(
            expected, par, blk["dyn_kernels"], blk["dyn_biases"], blk["par_kernel"],
            blk["conv1_kernel"], blk["conv1_bias"], blk["gamma"],
        )

    got = drt_stack_packed(x, par, blocks, th=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4, rtol=1e-4)


def test_drt_stack_key_select_epilogue(rng):
    """key_select folds where(is_key, out, last_key) into the last block's
    epilogue (kernels/drt_stack.py _kernel_select): bitwise-equal to the
    XLA select on the PF carry, per-sample flags, both flag values."""
    from pnp_vcve_tpu.kernels.drt_stack import (
        drt_stack_packed_from_pf, pack_pf, pf_geometry,
    )

    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    par = jnp.asarray((rng.random((B, H, W, 3)) > 0.5).astype(np.float32) / 255.0)
    lk = pack_pf(
        jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)), 8
    )
    blk = dict(
        dyn_kernels=jnp.asarray(
            rng.standard_normal((B, 3, 3, C, C)).astype(np.float32) * 0.1
        ),
        dyn_biases=jnp.asarray(rng.standard_normal((B, C)).astype(np.float32) * 0.1),
        par_kernel=jnp.asarray(
            rng.standard_normal((C, 3, C)).astype(np.float32) * 0.1
        ),
        conv1_kernel=jnp.asarray(
            rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1
        ),
        conv1_bias=jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1),
        gamma=jnp.asarray(rng.random((B, C)).astype(np.float32)),
    )
    is_key = jnp.asarray([1.0, 0.0])  # one keyframe, one not (b=2)

    xpf = pack_pf(x, 8)
    out_ref = drt_stack_packed_from_pf(xpf, par, [blk, blk], h=H, w=W, th=8,
                                       unpack=False)
    out, new_lk = drt_stack_packed_from_pf(
        xpf, par, [blk, blk], h=H, w=W, th=8, unpack=False,
        key_select=(lk, is_key),
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out_ref))
    expected = jnp.where(is_key.reshape(-1, 1, 1, 1) > 0.5, out_ref, lk)
    np.testing.assert_array_equal(np.asarray(new_lk), np.asarray(expected))


def test_drt_stack_packed_odd_height(rng):
    """h not divisible by th (edge tiles + PF zero maintenance)."""
    from pnp_vcve_tpu.kernels.drt_stack import drt_stack_packed

    x = jnp.asarray(rng.standard_normal((1, 20, 12, C)).astype(np.float32))
    par = jnp.asarray(rng.random((1, 20, 12, 3)).astype(np.float32))
    blk = dict(
        dyn_kernels=jnp.asarray(rng.standard_normal((1, 3, 3, C, C)).astype(np.float32) * 0.1),
        dyn_biases=jnp.asarray(rng.standard_normal((1, C)).astype(np.float32) * 0.1),
        par_kernel=jnp.asarray(rng.standard_normal((C, 3, C)).astype(np.float32) * 0.1),
        conv1_kernel=jnp.asarray(rng.standard_normal((3, 3, C, C)).astype(np.float32) * 0.1),
        conv1_bias=jnp.asarray(rng.standard_normal((C,)).astype(np.float32) * 0.1),
        gamma=jnp.asarray(rng.random((1, C)).astype(np.float32)),
    )
    expected = drt_reference(
        x, par, blk["dyn_kernels"], blk["dyn_biases"], blk["par_kernel"],
        blk["conv1_kernel"], blk["conv1_bias"], blk["gamma"],
    )
    got = drt_stack_packed(x, par, [blk, blk], th=8)
    expected = drt_reference(
        expected, par, blk["dyn_kernels"], blk["dyn_biases"], blk["par_kernel"],
        blk["conv1_kernel"], blk["conv1_bias"], blk["gamma"],
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-4, rtol=1e-4)


def test_model_pallas_stack_path_matches_xla(rng):
    """Full flagship forward with use_pallas_kernels=True (the chained PF
    stack) equals the plain XLA path."""
    from pnp_vcve_tpu.models import PnPVCVE

    b, t, h, w = 1, 3, 24, 16
    lrs = jnp.asarray(rng.random((b, t, h, w, 3), np.float32))
    qps = jnp.asarray(rng.random((b, t), np.float32))
    slices = jnp.asarray(np.where(rng.random((b, t)) < 0.5, 73.0, 66.0))
    mvs = jnp.asarray(rng.standard_normal((b, t, h, w, 4)).astype(np.float32))
    base_qps = jnp.full((b, t), 15.0 / 255.0)
    par = jnp.asarray((rng.random((b, t, h, w, 3)) > 0.5).astype(np.float32) / 255.0)

    kw = dict(mid_channels=8, num_blocks=2, num_experts=2, remat=False)
    ref_model = PnPVCVE(**kw, use_pallas_kernels=False)
    params = ref_model.init(jax.random.PRNGKey(0), lrs, qps, slices, mvs, base_qps, par)
    expected = ref_model.apply(params, lrs, qps, slices, mvs, base_qps, par)

    pallas_model = PnPVCVE(**kw, use_pallas_kernels=True)
    got = pallas_model.apply(params, lrs, qps, slices, mvs, base_qps, par)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4, rtol=1e-4)


def test_model_pallas_pf_input_conv_path(rng):
    """PF-compatible shapes route through input_conv_pf + the PF stack and
    must match the XLA path ((h+16) % th == 0, w % 16 == 0)."""
    from pnp_vcve_tpu.models import PnPVCVE

    b, t, h, w = 1, 2, 32, 32
    lrs = jnp.asarray(rng.random((b, t, h, w, 3), np.float32))
    qps = jnp.asarray(rng.random((b, t), np.float32))
    slices = jnp.asarray(np.where(rng.random((b, t)) < 0.5, 73.0, 66.0))
    mvs = jnp.asarray(rng.standard_normal((b, t, h, w, 4)).astype(np.float32))
    base_qps = jnp.full((b, t), 15.0 / 255.0)
    par = jnp.asarray((rng.random((b, t, h, w, 3)) > 0.5).astype(np.float32) / 255.0)

    kw = dict(mid_channels=8, num_blocks=2, num_experts=2, remat=False)
    ref_model = PnPVCVE(**kw, use_pallas_kernels=False)
    params = ref_model.init(jax.random.PRNGKey(0), lrs, qps, slices, mvs, base_qps, par)
    expected = ref_model.apply(params, lrs, qps, slices, mvs, base_qps, par)

    pallas_model = PnPVCVE(**kw, use_pallas_kernels=True)
    got = pallas_model.apply(params, lrs, qps, slices, mvs, base_qps, par)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-4, rtol=1e-4)


def test_trainable_stack_grads_match_xla(rng):
    """custom-VJP fused stack: gradients == XLA composition gradients."""
    from pnp_vcve_tpu.models import PnPVCVE

    b, t, h, w = 1, 2, 32, 32
    lrs = jnp.asarray(rng.random((b, t, h, w, 3), np.float32))
    qps = jnp.asarray(rng.random((b, t), np.float32))
    slices = jnp.full((b, t), 73.0)
    mvs = jnp.asarray(rng.standard_normal((b, t, h, w, 4)).astype(np.float32))
    base_qps = jnp.full((b, t), 15.0 / 255.0)
    par = jnp.asarray((rng.random((b, t, h, w, 3)) > 0.5).astype(np.float32) / 255.0)
    gt = jnp.asarray(rng.random((b, t, h, w, 3), np.float32))

    kw = dict(mid_channels=8, num_blocks=2, num_experts=2, remat=False)
    ref_model = PnPVCVE(**kw, use_pallas_kernels=False)
    params = ref_model.init(jax.random.PRNGKey(0), lrs, qps, slices, mvs, base_qps, par)
    pallas_model = PnPVCVE(**kw, use_pallas_kernels=True)

    def loss(model, p):
        out = model.apply(p, lrs, qps, slices, mvs, base_qps, par)
        return jnp.mean((out - gt) ** 2)

    g_ref = jax.grad(lambda p: loss(ref_model, p))(params)
    g_pal = jax.grad(lambda p: loss(pallas_model, p))(params)
    for (kp, a), (_, b2) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_pal),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), atol=2e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(kp),
        )


def test_head_pf_matches_xla(rng):
    """Packed reconstruction head on PF input == XLA conv composition,
    from both th=8 and th=16 PF geometries (edge-row masking included)."""
    from pnp_vcve_tpu.kernels.drt_stack import _xla_head, head_pf, pack_pf

    b, h, w, c = 2, 24, 32, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    head = (
        jnp.asarray(rng.standard_normal((3, 3, c, c)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((3, 3, c, 3)).astype(np.float32) * 0.1),
        jnp.asarray(rng.standard_normal((3,)).astype(np.float32) * 0.1),
    )
    expected = _xla_head(x, head)
    for th in (8, 16):
        got = head_pf(pack_pf(x, th), *head, h, w)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=1e-4, rtol=1e-4
        )

    # multi-tile at the TALL out-tile (h=96 -> th=48, 2 grid steps):
    # covers the tile-boundary halo and the edge-row masking at th > 8
    h2 = 96
    x2 = jnp.asarray(rng.standard_normal((b, h2, w, c)).astype(np.float32))
    got2 = head_pf(pack_pf(x2, 8), *head, h2, w)
    np.testing.assert_allclose(
        np.asarray(got2), np.asarray(_xla_head(x2, head)), atol=1e-4, rtol=1e-4
    )


def test_model_pallas_fused_head_b2(rng):
    """b>=2 routes the reconstruction head through the packed Pallas kernel
    (head_pf on the PF stack output); must match the XLA path."""
    from pnp_vcve_tpu.models import PnPVCVE

    b, t, h, w = 2, 2, 32, 32
    lrs = jnp.asarray(rng.random((b, t, h, w, 3), np.float32))
    qps = jnp.asarray(rng.random((b, t), np.float32))
    slices = jnp.asarray(np.where(rng.random((b, t)) < 0.5, 73.0, 66.0))
    mvs = jnp.asarray(rng.standard_normal((b, t, h, w, 4)).astype(np.float32))
    base_qps = jnp.full((b, t), 15.0 / 255.0)
    par = jnp.asarray((rng.random((b, t, h, w, 3)) > 0.5).astype(np.float32) / 255.0)

    kw = dict(mid_channels=8, num_blocks=2, num_experts=2, remat=False)
    ref_model = PnPVCVE(**kw, use_pallas_kernels=False)
    params = ref_model.init(jax.random.PRNGKey(0), lrs, qps, slices, mvs, base_qps, par)
    expected = ref_model.apply(params, lrs, qps, slices, mvs, base_qps, par)

    pallas_model = PnPVCVE(**kw, use_pallas_kernels=True)
    got = pallas_model.apply(params, lrs, qps, slices, mvs, base_qps, par)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=3e-4, rtol=1e-4)


def test_input_conv_pf_ab_fullwidth_part(rng):
    """input_conv_pf with 64-channel parts exercises the A/B (2-matmul)
    path; 3-channel parts stay on the lane-padded tap path. Both must match
    the XLA sum-of-convs."""
    from jax.experimental.pallas import tpu as pltpu

    from pnp_vcve_tpu.kernels.drt_stack import input_conv_pf, unpack_pf

    b, h, w = 1, 16, 16
    c_lr, c_f = 3, 64
    lr = jnp.asarray(rng.standard_normal((b, h, w, c_lr)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((b, h, w, c_f)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((b, h, w, c_f)).astype(np.float32))
    cin = c_lr + 2 * c_f
    kernel = jnp.asarray(
        rng.standard_normal((3, 3, cin, 64)).astype(np.float32) * 0.1
    )
    bias = jnp.asarray(rng.standard_normal((64,)).astype(np.float32) * 0.1)

    with pltpu.force_tpu_interpret_mode():
        got_pf = input_conv_pf([lr, f1, f2], kernel, bias, cout=64)
    got = unpack_pf(got_pf, h, w)

    x = jnp.concatenate([lr, f1, f2], axis=-1)
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    ref = jnp.where(ref >= 0, ref, 0.1 * ref).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_input_conv_pf_accepts_pf_parts(rng):
    """part_pf: PF-layout parts (warp_pf outputs / the PF carry) produce
    identical results to the same parts passed unpacked."""
    from jax.experimental.pallas import tpu as pltpu

    from pnp_vcve_tpu.kernels.drt_stack import input_conv_pf, pack_pf, unpack_pf

    b, h, w = 1, 16, 32
    lr = jnp.asarray(rng.standard_normal((b, h, w, 3)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((b, h, w, 64)).astype(np.float32))
    f2 = jnp.asarray(rng.standard_normal((b, h, w, 64)).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((3, 3, 131, 64)).astype(np.float32) * 0.1
    )
    bias = jnp.asarray(rng.standard_normal((64,)).astype(np.float32) * 0.1)

    with pltpu.force_tpu_interpret_mode():
        want = input_conv_pf([lr, f1, f2], kernel, bias, cout=64)
        got = input_conv_pf(
            [lr, pack_pf(f1, th=8), pack_pf(f2, th=8)], kernel, bias,
            cout=64, part_pf=[False, True, True],
        )
    np.testing.assert_allclose(
        np.asarray(unpack_pf(got, h, w), np.float32),
        np.asarray(unpack_pf(want, h, w), np.float32),
        atol=2e-4, rtol=2e-4,
    )
