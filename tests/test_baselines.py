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


def test_dcngan_generator_and_gan_step(rng):
    import optax
    from pnp_vcve_tpu.models.baselines.dcngan import DCNGANNet, DCNGANDiscriminator
    from pnp_vcve_tpu.train import create_train_state
    from pnp_vcve_tpu.train.gan import make_gan_train_step

    gen = DCNGANNet(nf_fa=4, nb_fa=2)
    disc = DCNGANDiscriminator(d=8)
    # >=64px: the discriminator's final 4x4 VALID conv needs a 4x4 input
    lrs = jnp.asarray(rng.random((1, 3, 64, 64, 3), np.float32))
    base_qps = jnp.zeros((1, 3))
    gt = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))

    g_params = gen.init(jax.random.PRNGKey(0), lrs, base_qps=base_qps)["params"]
    out = gen.apply({"params": g_params}, lrs, base_qps=base_qps)
    assert out.shape == (1, 64, 64, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh head

    d_params = disc.init(jax.random.PRNGKey(1), gt)["params"]
    d_out = disc.apply({"params": d_params}, gt)
    assert d_out["prediction"].shape[0] == 1
    assert len(d_out["feature_maps"]) == 4

    g_state = create_train_state(g_params, optax.adam(1e-4))
    d_state = create_train_state(d_params, optax.adam(1e-4))
    step = make_gan_train_step(gen, disc, fm_weight=0.1, donate=False)
    batch = {"lq": lrs, "gt": gt, "base_qps": base_qps}
    g2, d2, metrics = step(g_state, d_state, batch)
    assert np.isfinite(float(metrics["loss_g"]))
    assert np.isfinite(float(metrics["loss_d"]))
    # both networks actually updated
    changed_g = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree_util.tree_leaves(g_state.params),
                        jax.tree_util.tree_leaves(g2.params))
    )
    changed_d = any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree_util.tree_leaves(d_state.params),
                        jax.tree_util.tree_leaves(d2.params))
    )
    assert changed_g and changed_d


@pytest.mark.parametrize("low_res", [True, False])
def test_basicvsr_pp_pqf_shapes(rng, low_res):
    from pnp_vcve_tpu.models.baselines.basicvsr_pp import BasicVSRPlusPlusPQF

    model = BasicVSRPlusPlusPQF(
        mid_channels=8, num_blocks=1, deform_groups=2, is_low_res_input=low_res
    )
    b, t, h, w = 1, 4, 64, 64
    lrs = jnp.asarray(rng.random((b, t, h, w, 3), np.float32))
    slices = jnp.asarray(np.array([[73, 66, 80, 66]], np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs, slices=slices)
    out = model.apply(params, lrs, slices=slices)
    expected_hw = (4 * h, 4 * w) if low_res else (h, w)
    assert out.shape == (b, t, *expected_hw, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_basicvsr_pp_pqf_chain_carry(rng):
    """The PQF second-order branch must engage: outputs differ when slice
    types change (same weights, same pixels)."""
    from pnp_vcve_tpu.models.baselines.basicvsr_pp import BasicVSRPlusPlusPQF

    model = BasicVSRPlusPlusPQF(
        mid_channels=8, num_blocks=1, deform_groups=2, is_low_res_input=True
    )
    lrs = jnp.asarray(rng.random((1, 5, 64, 64, 3), np.float32))
    s_all_pqf = jnp.full((1, 5), 80.0)
    s_sparse = jnp.asarray(np.array([[73, 66, 66, 66, 80]], np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs, slices=s_all_pqf)
    o1 = np.asarray(model.apply(params, lrs, slices=s_all_pqf))
    o2 = np.asarray(model.apply(params, lrs, slices=s_sparse))
    assert np.abs(o1 - o2).max() > 1e-7


def test_sidecvsr_shapes_and_incremental(rng):
    from pnp_vcve_tpu.models.baselines.sidecvsr import SIDECVSR

    model = SIDECVSR(nf=16, nframes=7, scg_n=1)
    b, n, h, w = 1, 7, 16, 16
    x = jnp.asarray(rng.random((b, n, h, w, 1), np.float32))
    mvs = jnp.asarray(rng.standard_normal((b, n, h, w, 2)).astype(np.float32) * 0.1)
    pms = jnp.asarray(rng.random((b, n, h, w, 1), np.float32))
    rms = jnp.asarray(rng.random((b, n, h, w, 1), np.float32))
    ufs = jnp.asarray(rng.random((b, n, h, w, 1), np.float32))
    params = model.init(jax.random.PRNGKey(0), x, mvs, pms, rms, ufs)
    out, l1 = model.apply(params, x, mvs, pms, rms, ufs)
    assert out.shape == (b, 4 * h, 4 * w, 1)
    assert l1.shape == (b, n, h, w, 16)

    # incremental path: shift window by 1 and reuse the cached features;
    # must equal recomputing from scratch on the shifted window
    x2 = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    pm2 = jnp.concatenate([pms[:, 1:], pms[:, -1:]], axis=1)
    rm2 = jnp.concatenate([rms[:, 1:], rms[:, -1:]], axis=1)
    uf2 = jnp.concatenate([ufs[:, 1:], ufs[:, -1:]], axis=1)
    out_inc, _ = model.apply(params, x2, mvs, pm2, rm2, uf2, pre_l1_fea=l1)
    out_full, _ = model.apply(params, x2, mvs, pm2, rm2, uf2)
    np.testing.assert_allclose(
        np.asarray(out_inc), np.asarray(out_full), atol=1e-5, rtol=1e-5
    )


def test_basicvsr_net_shapes(rng):
    from pnp_vcve_tpu.models.baselines.basicvsr import BasicVSRNet

    model = BasicVSRNet(mid_channels=16, num_blocks=1)
    lrs = jnp.asarray(rng.random((1, 3, 64, 64, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs)
    out = model.apply(params, lrs)
    assert out.shape == (1, 3, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_edvr_shapes(rng):
    from pnp_vcve_tpu.models.baselines.edvr import EDVRNet

    model = EDVRNet(mid_channels=8, num_frames=3, deform_groups=2,
                    num_blocks_extraction=1, num_blocks_reconstruction=1)
    lrs = jnp.asarray(rng.random((1, 3, 32, 32, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs)
    out = model.apply(params, lrs)
    assert out.shape == (1, 128, 128, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pac_conv_matches_torch_semantics(rng):
    """PAC = gaussian guidance kernel * per-tap conv; validated against a
    direct numpy implementation of the pac_util spec."""
    from pnp_vcve_tpu.ops.pac import pac_conv2d

    b, h, w, cin, cout, cg = 1, 6, 7, 3, 4, 2
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    g = rng.standard_normal((b, h, w, cg)).astype(np.float32)
    k = rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.2
    bias = rng.standard_normal(cout).astype(np.float32) * 0.1

    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    gp = np.pad(g, ((0, 0), (1, 1), (1, 1), (0, 0)))
    expected = np.zeros((b, h, w, cout)) + bias
    for y in range(h):
        for xx in range(w):
            for dy in range(3):
                for dx in range(3):
                    kk = np.exp(-0.5 * np.sum((gp[0, y + dy, xx + dx] - g[0, y, xx]) ** 2))
                    expected[0, y, xx] += kk * (xp[0, y + dy, xx + dx] @ k[dy, dx])
    got = np.asarray(pac_conv2d(jnp.asarray(x), jnp.asarray(g), jnp.asarray(k), jnp.asarray(bias)))
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


def test_mwgan_shapes(rng):
    from pnp_vcve_tpu.models.baselines.mwgan import DenseMWNetMiniPSNR

    model = DenseMWNetMiniPSNR(nf=16, nb=1, front_rbs=1, gc=8)
    lrs = jnp.asarray(rng.random((1, 5, 32, 32, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs)
    out = model.apply(params, lrs)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_tdan_shapes(rng):
    from pnp_vcve_tpu.models.baselines.tdan import TDANNet

    model = TDANNet(mid_channels=8, num_blocks_before_align=1,
                    num_blocks_after_align=1)
    lrs = jnp.asarray(rng.random((1, 5, 16, 16, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs)
    hr, aligned = model.apply(params, lrs)
    assert hr.shape == (1, 64, 64, 3)
    assert aligned.shape == (1, 5, 16, 16, 3)
    # center frame passes through unchanged
    np.testing.assert_allclose(
        np.asarray(aligned[:, 2]), np.asarray(lrs[:, 2]), atol=1e-6
    )


def _pqf_branch_loop_oracle(
    branch_params, feats, flows, keys, flow_compose, second_order,
    c, nb, g, m,
):
    """Reference propagate semantics as a python loop
    (basicvsr_pp_v2.py:177-257 base / :397-502 v2 / :560-620 skip modes):
    per step, rescan the key list for the most recent key at lag >= 2 and
    build the flow chain to it."""
    from pnp_vcve_tpu.models.baselines.basicvsr_pp import (
        ResidualBlocksWithInputConv,
        SecondOrderDeformableAlignment,
    )
    from pnp_vcve_tpu.ops.warp import flow_warp

    align = SecondOrderDeformableAlignment(
        channels=c, deform_groups=g, max_residue_magnitude=m
    )
    backbone = ResidualBlocksWithInputConv(out_channels=c, num_blocks=nb)
    p_align = {"params": branch_params["deform_align"]}
    p_backbone = {"params": branch_params["backbone"]}

    b, t = feats.shape[0], feats.shape[1]
    feat_prop = jnp.zeros_like(feats[:, 0])
    outs = []
    for i in range(t):
        feat_cur = feats[:, i]
        if i > 0:
            flow_n1 = flows[:, i - 1]
            cond_n1 = flow_warp(feat_prop, flow_n1)
            feat_n2 = jnp.zeros_like(feat_prop)
            flow_n2 = jnp.zeros_like(flow_n1)
            cond_n2 = jnp.zeros_like(cond_n1)
            if second_order == "plain":
                if i > 1:
                    feat_n2 = outs[i - 2]
                    flow_n2 = flow_n1 + flow_warp(flows[:, i - 2], flow_n1)
                    cond_n2 = flow_warp(feat_n2, flow_n2)
            else:
                elig = [j for j in range(0, i - 1) if keys[0, j]]
                if i > 1 and elig:
                    k = max(elig)  # most recent key at lag >= 2
                    feat_n2 = outs[k]
                    acc = flows[:, k]
                    for s in range(k + 1, i):
                        tmp = flows[:, s]
                        if flow_compose == "compose":
                            acc = tmp + flow_warp(acc, tmp)
                        else:
                            acc = flow_warp(acc, tmp)
                    flow_n2 = acc if flow_compose == "compose" else flow_n1 + acc
                    cond_n2 = flow_warp(feat_n2, flow_n2)
            cond = jnp.concatenate([cond_n1, feat_cur, cond_n2], axis=-1)
            x2c = jnp.concatenate([feat_prop, feat_n2], axis=-1)
            feat_prop = align.apply(p_align, x2c, cond, flow_n1, flow_n2)
        feat_in = jnp.concatenate([feat_cur, feat_prop], axis=-1)
        feat_prop = feat_prop + backbone.apply(p_backbone, feat_in)
        outs.append(feat_prop)
    return jnp.stack(outs, axis=1)


@pytest.mark.parametrize(
    "flow_compose,second_order",
    [("resample", "pqf"), ("compose", "pqf"), ("compose", "plain")],
)
def test_pqf_branch_scan_matches_loop_oracle(rng, flow_compose, second_order):
    """The O(1)-carry scan == the reference's rescan-per-step loop, on a key
    pattern where a lag-1 key SHADOWS an older eligible key (frames 3,4)."""
    from pnp_vcve_tpu.models.baselines.basicvsr_pp import BasicVSRPlusPlusPQF

    b, t, h, w, c = 1, 7, 16, 16, 8
    feats = jnp.asarray(rng.random((b, t, h, w, c), np.float32))
    flows = jnp.asarray(rng.standard_normal((b, t - 1, h, w, 2)).astype(np.float32))
    keys = jnp.asarray(
        np.array([[1, 0, 0, 1, 1, 0, 0]], bool)
    )  # keys at 0,3,4: at step 5 the lag-1 key (4) shadows eligible key 3

    import flax.linen as nn

    class _BranchOnly(BasicVSRPlusPlusPQF):
        # compact wrapper: _sweep needs a compact scope to create its scan
        @nn.compact
        def __call__(self, fs, fl, ks):  # noqa: D102
            return self._sweep(
                "branch", 0, fs, None, fl, ks, flow_compose, second_order
            )

    model = _BranchOnly(mid_channels=c, num_blocks=1, deform_groups=2)
    params = model.init(jax.random.PRNGKey(0), feats, flows, keys)
    got = model.apply(params, feats, flows, keys)
    expected = _pqf_branch_loop_oracle(
        params["params"]["branch"], feats, flows, keys, flow_compose,
        second_order, c, 1, 2, 10.0,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(expected), atol=2e-5, rtol=1e-4
    )


@pytest.mark.parametrize("variant", ["v2", "v2_withB_skip", "v2_onlyB_skip"])
def test_basicvsr_pp_variants_forward(rng, variant):
    from pnp_vcve_tpu.models.baselines.basicvsr_pp import BasicVSRPlusPlusPQF

    model = BasicVSRPlusPlusPQF(
        mid_channels=8, num_blocks=1, deform_groups=2, is_low_res_input=True,
        variant=variant,
    )
    lrs = jnp.asarray(rng.random((1, 5, 64, 64, 3), np.float32))
    slices = jnp.asarray(np.array([[73, 66, 80, 66, 80]], np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs, slices=slices)
    out = model.apply(params, lrs, slices=slices)
    assert out.shape == (1, 5, 256, 256, 3)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "typ,kw,scale",
    [
        ("EDSR", dict(mid_channels=8, num_blocks=2, upscale_factor=4), 4),
        ("RRDBNet", dict(mid_channels=8, num_blocks=1, growth_channels=4,
                         upscale_factor=4), 4),
        ("MSRResNet", dict(mid_channels=8, num_blocks=2, upscale_factor=4), 4),
        ("SRCNN", dict(channels=(3, 8, 4, 3), upscale_factor=4), 4),
        ("RDN", dict(mid_channels=8, num_blocks=2, num_layers=2,
                     channel_growth=4, upscale_factor=4), 4),
    ],
)
def test_sisr_zoo(rng, typ, kw, scale):
    from pnp_vcve_tpu.core.builder import BACKBONES

    model = BACKBONES.build(dict(type=typ, **kw))
    x = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 16 * scale, 16 * scale, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_toflow_and_realbasicvsr(rng):
    from pnp_vcve_tpu.core.builder import BACKBONES

    tof = BACKBONES.build(dict(type="TOFlow"))
    lrs = jnp.asarray(rng.random((1, 7, 32, 32, 3), np.float32))
    params = tof.init(jax.random.PRNGKey(0), lrs)
    out = tof.apply(params, lrs)
    assert out.shape == (1, 32, 32, 3)

    rb = BACKBONES.build(dict(type="RealBasicVSRNet", mid_channels=8,
                              num_propagation_blocks=1, num_cleaning_blocks=1))
    lrs = jnp.asarray(rng.random((1, 3, 16, 16, 3), np.float32))
    params = rb.init(jax.random.PRNGKey(0), lrs)
    out = rb.apply(params, lrs)
    assert out.shape == (1, 3, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_iconvsr_refill(rng):
    """IconVSR with EDVR information refill (iconvsr.py:15-265)."""
    from pnp_vcve_tpu.core.builder import BACKBONES

    model = BACKBONES.build(dict(type="IconVSRNet", mid_channels=8,
                                 num_blocks=1, keyframe_stride=3))
    lrs = jnp.asarray(rng.random((1, 7, 16, 16, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs)
    out = model.apply(params, lrs)
    assert out.shape == (1, 7, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()

    # refill must engage: zeroing the EDVR params changes the output
    import flax

    flat = flax.traverse_util.flatten_dict(params["params"])
    zeroed = {
        k: (jnp.zeros_like(v) if k[0] == "edvr" else v) for k, v in flat.items()
    }
    params2 = {"params": flax.traverse_util.unflatten_dict(zeroed)}
    out2 = model.apply(params2, lrs)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-7


def test_mfqe_joint_enhance_protocol():
    """Two-model cascade: PQFs enhanced first (from decoded frames), then
    non-PQFs from the ENHANCED PQFs (order observable via marker models)."""
    import numpy as np

    from pnp_vcve_tpu.models.baselines.mfqev2 import mfqe_joint_enhance

    t, h, w, c = 5, 4, 4, 3
    frames = np.zeros((t, h, w, c), np.float32)
    for i in range(t):
        frames[i] = i / 10.0
    slices = ["I", "B", "P", "B", "P"]

    def pqf_apply(stack):     # marker: +100 on the center
        return stack[:, 1] + 100.0

    def nonpqf_apply(stack):  # passes through the LEFT reference
        return stack[:, 0]

    out = mfqe_joint_enhance(pqf_apply, nonpqf_apply, frames, slices)
    # PQFs (I/P at 0,2,4) got +100
    np.testing.assert_allclose(out[0], frames[0] + 100.0)
    np.testing.assert_allclose(out[2], frames[2] + 100.0)
    # non-PQF 1's left PQF is frame 0 — and it must see the ENHANCED one
    np.testing.assert_allclose(out[1], frames[0] + 100.0)
    np.testing.assert_allclose(out[3], frames[2] + 100.0)
