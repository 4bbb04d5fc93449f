"""Flagship model tests.

The risky surfaces are keyframe routing and the scan plumbing. We validate
them by re-implementing the propagation as a straight Python loop (the shape
of the reference's forward, iconvsr_ipb_par.py:44-149) that reuses the same
flax sub-modules applied step-by-step with numpy-computed routing — then
check the scanned model reproduces it exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.models import PnPVCVE, ResidualBlocksWithInputConvDynamicDRT
from pnp_vcve_tpu.models.pnp_vcve import keyframe_indices
from pnp_vcve_tpu.models.caa import BasePredictor, SEModule
from pnp_vcve_tpu.ops import flow_warp, conv2d_nhwc


B, T, H, W, C, K, NB = 2, 5, 16, 16, 8, 3, 1


def make_model(**over):
    kw = dict(
        mid_channels=C,
        num_blocks=NB,
        num_experts=K,
        # keep >1 hidden unit in the SE head at tiny widths (a 1-unit ReLU
        # head can die and stall grads — an artifact of the test size only)
        se_reduction=2,
        remat=False,
    )
    kw.update(over)
    return PnPVCVE(**kw)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(7)
    lrs = rng.random((B, T, H, W, 3)).astype(np.float32)
    mvs = (rng.standard_normal((B, T, H, W, 4)) * 2).astype(np.float32)
    par = (rng.random((B, T, H, W, 3)) > 0.5).astype(np.float32)
    qps = rng.integers(20, 40, (B, T)).astype(np.float32) / 255.0
    base_qps = np.broadcast_to(
        np.array([[15.0], [25.0]], np.float32) / 255.0, (B, T)
    ).copy()
    # batch 0: I P B B P ; batch 1: I B B B B (last forced key)
    slices = np.array(
        [[73, 80, 66, 66, 80], [73, 66, 66, 66, 66]], np.float32
    )
    return dict(
        lrs=lrs, qps=qps, slices=slices, mvs=mvs, base_qps=base_qps, par_map=par
    )


def test_keyframe_indices_brute_force(inputs):
    slices = jnp.asarray(inputs["slices"])
    keyframe, key_fwd, key_bwd = jax.jit(keyframe_indices)(slices)
    kf = np.asarray(keyframe)
    for b in range(B):
        assert kf[b, 0] and kf[b, -1]
        for i in range(T):
            if i >= 1:
                expected_fwd = max(j for j in range(i) if kf[b, j])
                assert int(key_fwd[b, i]) == expected_fwd
            if i <= T - 2:
                expected_bwd = min(j for j in range(i + 1, T) if kf[b, j])
                assert int(key_bwd[b, i]) == expected_bwd


def loop_forward(params, model, inputs):
    """Straight-line reimplementation of the propagation (oracle)."""
    lrs = jnp.asarray(inputs["lrs"])
    mvs = jnp.asarray(inputs["mvs"])
    par = jnp.asarray(inputs["par_map"])
    p = params["params"]

    weights = BasePredictor(nf=C, num_experts=K, softmax=True).apply(
        {"params": p["base_predictor"]}, jnp.asarray(inputs["base_qps"])
    )
    gammas, _ = SEModule(channels=C, reduction=2).apply(
        {"params": p["bias_predictor"]}, jnp.asarray(inputs["qps"])
    )

    slices = inputs["slices"]
    kf = (slices == 73) | (slices == 80)
    kf[:, 0] = kf[:, -1] = True

    def resblocks(which, feat, i):
        in_ch = feat.shape[-1]
        mod = ResidualBlocksWithInputConvDynamicDRT(
            in_channels=in_ch, out_channels=C, num_blocks=NB, num_experts=K
        )
        return mod.apply(
            {"params": p[which]["resblocks"]},
            feat, par[:, i], weights[:, i], gammas[:, i],
        )

    flows_fwd = mvs[..., 0:2]
    flows_bwd = mvs[..., 2:4]

    outputs = [None] * T
    # backward sweep
    for i in range(T - 1, -1, -1):
        lr = lrs[:, i]
        if i < T - 1:
            key_list, nbr_list = [], []
            for b in range(B):
                key_idx = i + 1 + int(np.where(kf[b, i + 1:])[0][0])
                key_fea = flow_warp(
                    outputs[key_idx][b : b + 1], flows_bwd[b : b + 1, i]
                )
                key_list.append(key_fea)
                if key_idx == i + 1:  # align_key
                    nbr_list.append(key_fea)
                else:
                    nbr_list.append(outputs[i + 1][b : b + 1])
            key_warp = jnp.concatenate(key_list, 0)
            neighbor = jnp.concatenate(nbr_list, 0)
        else:
            key_warp = jnp.zeros((B, H, W, C), jnp.float32)
            neighbor = jnp.zeros((B, H, W, C), jnp.float32)
        feat = jnp.concatenate([lr, key_warp, neighbor], -1)
        outputs[i] = resblocks("backward", feat, i)

    # forward sweep + reconstruction
    ys = []
    fp = p["forward"]
    for i in range(T):
        lr = lrs[:, i]
        if i > 0:
            key_list, nbr_list = [], []
            for b in range(B):
                key_idx = int(np.where(kf[b, :i])[0][-1])
                key_fea = flow_warp(
                    outputs[key_idx][b : b + 1], flows_fwd[b : b + 1, i]
                )
                key_list.append(key_fea)
                if key_idx == i - 1:
                    nbr_list.append(key_fea)
                else:
                    nbr_list.append(outputs[i - 1][b : b + 1])
            key_warp = jnp.concatenate(key_list, 0)
            neighbor = jnp.concatenate(nbr_list, 0)
        else:
            key_warp = jnp.zeros((B, H, W, C), jnp.float32)
            neighbor = jnp.zeros((B, H, W, C), jnp.float32)
        feat = jnp.concatenate([lr, key_warp, neighbor, outputs[i]], -1)
        out = resblocks("forward", feat, i)
        outputs[i] = out

        y = jax.nn.leaky_relu(
            conv2d_nhwc(out, fp["conv_hr_kernel"], fp["conv_hr_bias"]), 0.1
        )
        y = conv2d_nhwc(y, fp["conv_last_kernel"], fp["conv_last_bias"]) + lr
        ys.append(y)
    return jnp.stack(ys, axis=1)


def test_model_matches_loop_oracle(inputs):
    model = make_model()
    jinp = {k: jnp.asarray(v) for k, v in inputs.items()}
    params = model.init(jax.random.PRNGKey(0), **jinp)
    out = jax.jit(model.apply)(params, **jinp)
    assert out.shape == (B, T, H, W, 3)

    expected = loop_forward(params, model, inputs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5
    )


def test_model_remat_matches(inputs):
    jinp = {k: jnp.asarray(v) for k, v in inputs.items()}
    m1 = make_model(remat=False)
    m2 = make_model(remat=True)
    params = m1.init(jax.random.PRNGKey(0), **jinp)
    o1 = jax.jit(m1.apply)(params, **jinp)
    o2 = jax.jit(m2.apply)(params, **jinp)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_model_grads_flow(inputs):
    """All parameters receive gradients through both sweeps."""
    jinp = {k: jnp.asarray(v) for k, v in inputs.items()}
    model = make_model(remat=True)
    params = model.init(jax.random.PRNGKey(0), **jinp)

    def loss(p):
        out = model.apply(p, **jinp)
        return jnp.mean((out - jinp["lrs"]) ** 2)

    grads = jax.jit(jax.grad(loss))(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    zero = [
        jax.tree_util.keystr(path)
        for path, g in flat
        if float(jnp.max(jnp.abs(g))) == 0.0
    ]
    assert not zero, f"zero grads for: {zero}"


def test_model_vsr_output_shape(inputs):
    jinp = {k: jnp.asarray(v) for k, v in inputs.items()}
    model = make_model(vsr=True)
    params = model.init(jax.random.PRNGKey(0), **jinp)
    out = jax.jit(model.apply)(params, **jinp)
    assert out.shape == (B, T, 4 * H, 4 * W, 3)


def test_drt_woqp_block(inputs):
    """blocktype='drt_woqp' (plain conv2 instead of the expert mixture,
    reference sr_backbone_utils.py:336-383)."""
    from pnp_vcve_tpu.models.bae import ResidualBlocksWithInputConvDynamicDRT

    rng_np = np.random.default_rng(0)
    x = jnp.asarray(rng_np.random((1, 8, 8, C), np.float32))
    par = jnp.asarray(rng_np.random((1, 8, 8, 3), np.float32))
    w = jnp.asarray(rng_np.random((1, K), np.float32))
    g = jnp.asarray(rng_np.random((1, C), np.float32))
    mod = ResidualBlocksWithInputConvDynamicDRT(
        in_channels=C, out_channels=C, num_blocks=1, num_experts=K,
        use_dynamic=False,
    )
    params = mod.init(jax.random.PRNGKey(0), x, par, w, g)
    out = mod.apply(params, x, par, w, g)
    assert out.shape == x.shape
    # no expert bank in the tree
    flat = jax.tree_util.tree_leaves_with_path(params)
    names = [jax.tree_util.keystr(p) for p, _ in flat]
    assert not any("bank" in n for n in names)
    assert any("conv2_kernel" in n for n in names)


def test_spatial_padding_non_div4():
    """Non-/4 inputs (e.g. KITTI 375x1242) run via reflect pad + crop
    (reference spatial_padding, iconvsr.py:371-394)."""
    import numpy as np

    rng = np.random.default_rng(3)
    b, t, h, w = 1, 2, 22, 30
    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=False)
    args = (
        jnp.asarray(rng.random((b, t, h, w, 3), np.float32)),
        jnp.asarray(rng.random((b, t), np.float32)),
        jnp.full((b, t), 73.0),
        jnp.asarray(rng.standard_normal((b, t, h, w, 4)).astype(np.float32)),
        jnp.full((b, t), 15.0 / 255.0),
        jnp.zeros((b, t, h, w, 3)),
    )
    params = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(params, *args)
    assert out.shape == (b, t, h, w, 3)
    assert np.isfinite(np.asarray(out)).all()

    # padded-then-cropped equals itself when already /4 (no-op check)
    h4, w4 = 24, 32
    args4 = (
        jnp.asarray(rng.random((b, t, h4, w4, 3), np.float32)),
        args[1], args[2],
        jnp.asarray(rng.standard_normal((b, t, h4, w4, 4)).astype(np.float32)),
        args[4],
        jnp.zeros((b, t, h4, w4, 3)),
    )
    params4 = model.init(jax.random.PRNGKey(0), *args4)
    out4 = model.apply(params4, *args4)
    assert out4.shape == (b, t, h4, w4, 3)


def test_mirror_extension_detection():
    import numpy as np

    from pnp_vcve_tpu.train.eval import is_mirror_extended

    rng = np.random.default_rng(0)
    half = rng.random((3, 8, 8, 3), np.float32)
    mirrored = np.concatenate([half, half[::-1]], axis=0)
    assert is_mirror_extended(mirrored)
    assert not is_mirror_extended(rng.random((6, 8, 8, 3), np.float32))
    assert not is_mirror_extended(rng.random((5, 8, 8, 3), np.float32))
