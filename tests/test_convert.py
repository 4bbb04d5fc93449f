"""Checkpoint converter tests: a synthetic reference-format state dict must
convert into a tree that (a) matches model.init's structure/shapes exactly
and (b) reproduces torch-semantics forward math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.core.convert import convert_generator_state_dict
from pnp_vcve_tpu.models import PnPVCVE

C, K, NB = 16, 3, 2


def make_ref_state_dict(rng, vsr=False):
    def conv(o, i, k=3):
        return rng.standard_normal((o, i, k, k)).astype(np.float32) * 0.05

    sd = {
        "generator.BasePredictor.BaseNet.0.weight": rng.standard_normal((C, 1)).astype(np.float32),
        "generator.BasePredictor.BaseNet.0.bias": rng.standard_normal(C).astype(np.float32),
        "generator.BasePredictor.BaseNet.2.weight": rng.standard_normal((K, C)).astype(np.float32),
        "generator.BasePredictor.BaseNet.2.bias": rng.standard_normal(K).astype(np.float32),
        "generator.BiasePredictor.fc.0.weight": rng.standard_normal((max(1, C // 16), 1)).astype(np.float32),
        "generator.BiasePredictor.fc.2.weight": rng.standard_normal((C, max(1, C // 16))).astype(np.float32),
        "generator.conv_hr.weight": conv(C, C),
        "generator.conv_hr.bias": np.zeros(C, np.float32),
        "generator.conv_last.weight": conv(3, C),
        "generator.conv_last.bias": np.zeros(3, np.float32),
        "generator.step_counter": np.zeros(1),
    }
    for side, in_ch in (("backward", 2 * C + 3), ("forward", 3 * C + 3)):
        pre = f"generator.{side}_resblocks"
        sd[f"{pre}.input_conv.0.weight"] = conv(C, in_ch)
        sd[f"{pre}.input_conv.0.bias"] = np.zeros(C, np.float32)
        for i in range(NB):
            sd[f"{pre}.main.{i}.conv2.weight"] = rng.standard_normal((K, C, C, 3, 3)).astype(np.float32) * 0.05
            sd[f"{pre}.main.{i}.conv2.bias"] = rng.standard_normal((K, C)).astype(np.float32) * 0.05
            sd[f"{pre}.main.{i}.conv1.weight"] = conv(C, C)
            sd[f"{pre}.main.{i}.conv1.bias"] = np.zeros(C, np.float32)
            for name in ("conv16x16", "conv16x8", "conv8x8"):
                sd[f"{pre}.main.{i}.{name}.weight"] = conv(C, C, 1)
    if vsr:
        sd["generator.upsample1.upsample_conv.weight"] = conv(4 * C, C)
        sd["generator.upsample1.upsample_conv.bias"] = np.zeros(4 * C, np.float32)
        sd["generator.upsample2.upsample_conv.weight"] = conv(4 * C, C)
        sd["generator.upsample2.upsample_conv.bias"] = np.zeros(4 * C, np.float32)
    return sd


@pytest.fixture(scope="module")
def model_and_init():
    model = PnPVCVE(mid_channels=C, num_blocks=NB, num_experts=K, remat=False)
    b, t, h, w = 1, 3, 16, 16
    inp = dict(
        lrs=jnp.zeros((b, t, h, w, 3)),
        qps=jnp.zeros((b, t)),
        slices=jnp.full((b, t), 73.0),
        mvs=jnp.zeros((b, t, h, w, 4)),
        base_qps=jnp.zeros((b, t)),
        par_map=jnp.zeros((b, t, h, w, 3)),
    )
    params = model.init(jax.random.PRNGKey(0), **inp)["params"]
    return model, params, inp


def test_converted_tree_matches_init_structure(model_and_init):
    model, init_params, inp = model_and_init
    rng = np.random.default_rng(0)
    converted = convert_generator_state_dict(make_ref_state_dict(rng), num_blocks=NB)

    init_flat = {jax.tree_util.keystr(p): v.shape for p, v in
                 jax.tree_util.tree_leaves_with_path(init_params)}
    conv_flat = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in
                 jax.tree_util.tree_leaves_with_path(converted)}
    assert init_flat == conv_flat

    out = jax.jit(lambda p, **kw: model.apply({"params": p}, **kw))(converted, **inp)
    assert np.isfinite(np.asarray(out)).all()


def test_strict_flags_leftover_keys():
    rng = np.random.default_rng(0)
    sd = make_ref_state_dict(rng)
    sd["generator.mystery.weight"] = np.zeros(3, np.float32)
    with pytest.raises(KeyError):
        convert_generator_state_dict(sd, num_blocks=NB)
    convert_generator_state_dict(sd, num_blocks=NB, strict=False)


def test_base_predictor_math_survives_conversion(model_and_init):
    """Converted BasePredictor must equal the torch-semantics MLP in numpy."""
    from pnp_vcve_tpu.models.caa import BasePredictor

    rng = np.random.default_rng(1)
    sd = make_ref_state_dict(rng)
    converted = convert_generator_state_dict(sd, num_blocks=NB)

    crfs = rng.random((2, 4)).astype(np.float32)
    ours = BasePredictor(nf=C, num_experts=K, softmax=True).apply(
        {"params": converted["base_predictor"]}, jnp.asarray(crfs)
    )

    w0 = sd["generator.BasePredictor.BaseNet.0.weight"]
    b0 = sd["generator.BasePredictor.BaseNet.0.bias"]
    w2 = sd["generator.BasePredictor.BaseNet.2.weight"]
    b2 = sd["generator.BasePredictor.BaseNet.2.bias"]
    x = crfs.reshape(-1, 1)
    h = np.maximum(x @ w0.T + b0, 0)
    logits = h @ w2.T + b2
    e = np.exp(logits - logits.max(axis=1, keepdims=True))
    expected = (e / e.sum(axis=1, keepdims=True)).reshape(2, 4, K)
    np.testing.assert_allclose(np.asarray(ours), expected, atol=1e-6)


def test_vsr_conversion(model_and_init):
    rng = np.random.default_rng(2)
    converted = convert_generator_state_dict(
        make_ref_state_dict(rng, vsr=True), num_blocks=NB, vsr=True
    )
    model = PnPVCVE(mid_channels=C, num_blocks=NB, num_experts=K, vsr=True, remat=False)
    _, _, inp = model_and_init
    out = model.apply({"params": converted}, **inp)
    assert out.shape == (1, 3, 64, 64, 3)
