"""Baseline checkpoint-converter tests: synthetic reference-shaped state
dicts -> converted trees must match the models' init trees exactly
(structure + shapes), and layout transforms must be numerically correct."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from pnp_vcve_tpu.core.convert_baselines import (
    _convT,
    assert_tree_matches,
    convert_bvpp_pqf,
    convert_spynet,
    convert_stdf,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_convtranspose_mapping_matches_torch(rng):
    """flax ConvTranspose(kernel=_convT(w)) == torch conv_transpose2d
    (stride 2, pad 1, k=4 — the STDF up-conv configuration)."""
    import flax.linen as nn

    x = rng.standard_normal((1, 6, 6, 3)).astype(np.float32)
    tw = rng.standard_normal((3, 5, 4, 4)).astype(np.float32)
    tb = rng.standard_normal((5,)).astype(np.float32)
    ref = (
        torch.nn.functional.conv_transpose2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(tw), torch.from_numpy(tb), stride=2, padding=1,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    m = nn.ConvTranspose(5, (4, 4), strides=(2, 2), padding="SAME")
    p = {"params": {"kernel": jnp.asarray(_convT(tw)), "bias": jnp.asarray(tb)}}
    out = np.asarray(m.apply(p, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def _torch_shape(kind, shape):
    """Inverse layout transform: our param shape -> torch tensor shape."""
    if kind == "conv":  # (kh,kw,i,o) <- (o,i,kh,kw)
        kh, kw, i, o = shape
        return (o, i, kh, kw)
    if kind == "convT":  # (kh,kw,i,o) <- (i,o,kh,kw)
        kh, kw, i, o = shape
        return (i, o, kh, kw)
    return shape


def _fill(sd, rng, key, kind, shape):
    sd[key] = rng.standard_normal(_torch_shape(kind, shape)).astype(np.float32)


def test_spynet_converter_matches_model(rng):
    from pnp_vcve_tpu.models.spynet import SPyNet

    model = SPyNet()
    tpl = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3))
    )["params"]

    sd = {}
    for i in range(6):
        for j in range(5):
            ours = tpl[f"basic_module{i}"][f"conv{j}"]
            _fill(sd, rng, f"basic_module.{i}.basic_module.{j}.conv.weight",
                  "conv", ours["kernel"].shape)
            sd[f"basic_module.{i}.basic_module.{j}.conv.bias"] = (
                rng.standard_normal(ours["bias"].shape).astype(np.float32)
            )
    converted = convert_spynet(sd)
    assert_tree_matches(converted, jax.device_get(tpl))
    # transform spot check: OIHW -> HWIO transpose
    np.testing.assert_array_equal(
        converted["basic_module0"]["conv0"]["kernel"],
        np.transpose(sd["basic_module.0.basic_module.0.conv.weight"], (2, 3, 1, 0)),
    )


def test_stdf_converter_matches_model(rng):
    from pnp_vcve_tpu.models.baselines import STDFNet

    model = STDFNet()
    tpl = jax.device_get(
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32, 1)))["params"]
    )

    sd = {}

    def put(ref_key, ours, kind="conv"):
        _fill(sd, rng, f"{ref_key}.weight", kind, ours["kernel"].shape)
        sd[f"{ref_key}.bias"] = rng.standard_normal(ours["bias"].shape).astype(np.float32)

    s = tpl["stdf"]
    put("stdf.in_conv.0", s["in_conv"])
    put("stdf.out_conv.0", s["out_conv"])
    put("stdf.offset_mask", s["offset_mask"])
    _fill(sd, rng, "stdf.deform_conv.weight", "conv", s["deform_kernel"].shape)
    sd["stdf.deform_conv.bias"] = rng.standard_normal(s["deform_bias"].shape).astype(np.float32)
    put("stdf.tr_conv.0", s["tr_conv_0"])
    put("stdf.tr_conv.2", s["tr_conv_1"])
    put("stdf.tr_conv.4", s["tr_conv_up"], "convT")
    for i in (1, 2):
        put(f"stdf.dn_conv{i}.0", s[f"dn_conv{i}_0"])
        put(f"stdf.dn_conv{i}.2", s[f"dn_conv{i}_1"])
        put(f"stdf.up_conv{i}.0", s[f"up_conv{i}_0"])
        put(f"stdf.up_conv{i}.2", s[f"up_conv{i}_up"], "convT")
    q = tpl["qenet"]
    put("qenet.in_conv", q["in_conv"])
    put("qenet.out_conv.1", q["out_conv"])
    for k in range(6):
        put(f"qenet.hid_conv.{2 * k + 1}", q[f"hid_conv{k}"])

    converted = convert_stdf(sd)
    assert_tree_matches(converted, tpl)


def test_bvpp_pqf_converter_matches_model(rng):
    from pnp_vcve_tpu.models.baselines.basicvsr_pp import BasicVSRPlusPlusPQF

    model = BasicVSRPlusPlusPQF(mid_channels=8, num_blocks=1, deform_groups=2)
    lrs = jnp.zeros((1, 4, 64, 64, 3))
    slices = jnp.full((1, 4), 73.0)
    tpl = jax.device_get(
        model.init(jax.random.PRNGKey(0), lrs, slices=slices)["params"]
    )

    sd = {}

    def put(ref_key, ours, kind="conv"):
        _fill(sd, rng, f"{ref_key}.weight", kind, ours["kernel"].shape)
        sd[f"{ref_key}.bias"] = rng.standard_normal(ours["bias"].shape).astype(np.float32)

    def put_blocks(prefix, tree, n):
        put(f"{prefix}.main.0", tree["input_conv"])
        for i in range(n):
            put(f"{prefix}.main.2.{i}.conv1", tree[f"block{i}_conv1"])
            put(f"{prefix}.main.2.{i}.conv2", tree[f"block{i}_conv2"])

    put_blocks("feat_extract", tpl["feat_extract"], 5)
    put_blocks("reconstruction", tpl["reconstruction"], 5)
    for i in range(6):
        for j in range(5):
            ours = tpl["spynet"][f"basic_module{i}"][f"conv{j}"]
            _fill(sd, rng, f"spynet.basic_module.{i}.basic_module.{j}.conv.weight",
                  "conv", ours["kernel"].shape)
            sd[f"spynet.basic_module.{i}.basic_module.{j}.conv.bias"] = (
                rng.standard_normal(ours["bias"].shape).astype(np.float32)
            )
    put("conv_hr", tpl["conv_hr"])
    put("conv_last", tpl["conv_last"])
    for up in ("upsample1", "upsample2"):
        _fill(sd, rng, f"{up}.upsample_conv.weight", "conv", tpl[f"{up}_kernel"].shape)
        sd[f"{up}.upsample_conv.bias"] = rng.standard_normal(
            tpl[f"{up}_bias"].shape
        ).astype(np.float32)
    for branch in ("backward_1", "forward_1", "backward_2", "forward_2"):
        align = tpl[branch]["deform_align"]
        _fill(sd, rng, f"deform_align.{branch}.weight", "conv", align["weight"].shape)
        sd[f"deform_align.{branch}.bias"] = rng.standard_normal(
            align["bias"].shape
        ).astype(np.float32)
        for our_i, ref_i in enumerate((0, 2, 4, 6)):
            put(f"deform_align.{branch}.conv_offset.{ref_i}",
                align[f"conv_offset{our_i}"])
        put_blocks(f"backbone.{branch}", tpl[branch]["backbone"], 1)

    converted = convert_bvpp_pqf(sd, num_blocks=1)
    assert_tree_matches(converted, tpl)
