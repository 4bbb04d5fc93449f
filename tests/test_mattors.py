"""GCA + IndexNet mattors (VERDICT r2 item 4): forward tests from
reference-shaped configs, plus a TRUE torch oracle for the GCA attention
module (reference common/gca_module.py run on CPU via the tests/oracle
shim, weights copied across)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.core.builder import build_generator


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_gca_module_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    from tests.oracle.loader import load_ref

    gca_mod = load_ref("mmedit.models.common.gca_module")
    torch.manual_seed(0)
    ref = gca_mod.GCAModule(in_channels=16, out_channels=16).eval()

    b, h, w = 2, 16, 16
    img_feat = rng.standard_normal((b, h, w, 16)).astype(np.float32)
    alpha_feat = rng.standard_normal((b, h, w, 16)).astype(np.float32)
    unknown = (rng.random((b, h, w, 1)) > 0.5).astype(np.float32)

    nchw = lambda a: torch.tensor(np.ascontiguousarray(np.moveaxis(a, -1, 1)))
    with torch.no_grad():
        expected = ref(nchw(img_feat), nchw(alpha_feat), nchw(unknown)).numpy()

    from pnp_vcve_tpu.models.upstream.matting import GCAModule

    model = GCAModule(in_channels=16, out_channels=16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img_feat), jnp.asarray(alpha_feat),
        jnp.asarray(unknown),
    )
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "guidance_conv": {
            "kernel": np.transpose(sd["guidance_conv.weight"], (2, 3, 1, 0)),
            "bias": sd["guidance_conv.bias"],
        },
        "out_conv": {
            "kernel": np.transpose(sd["out_conv.conv.weight"], (2, 3, 1, 0)),
        },
        "out_bn": {
            "scale": sd["out_conv.bn.weight"],
            "bias": sd["out_conv.bn.bias"],
        },
    }
    batch_stats = {
        "out_bn": {
            "mean": sd["out_conv.bn.running_mean"],
            "var": sd["out_conv.bn.running_var"],
        }
    }
    got = model.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, params),
         "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats)},
        jnp.asarray(img_feat), jnp.asarray(alpha_feat), jnp.asarray(unknown),
    )
    got = np.moveaxis(np.asarray(got), -1, 1)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


def test_gca_mattor_forward(rng):
    model = build_generator(dict(type="GCAMattor", enc_layers=(1, 1, 1, 1),
                                 dec_layers=(1, 1, 1, 1)))
    b, h, w = 1, 64, 64
    merged = jnp.asarray(rng.random((b, h, w, 3), np.float32))
    trimap = jnp.asarray(
        np.eye(3, dtype=np.float32)[rng.integers(0, 3, (b, h, w))]
    )
    variables = model.init(jax.random.PRNGKey(0), merged, trimap)
    alpha = model.apply(variables, merged, trimap)
    assert alpha.shape == (b, h, w, 1)
    assert float(alpha.min()) >= 0.0 and float(alpha.max()) <= 1.0


def test_indexnet_forward(rng):
    model = build_generator(dict(type="IndexNet"))
    b, h, w = 1, 64, 64
    merged = jnp.asarray(rng.random((b, h, w, 3), np.float32))
    trimap = jnp.asarray(rng.random((b, h, w, 1), np.float32))
    variables = model.init(jax.random.PRNGKey(0), merged, trimap)
    alpha = model.apply(variables, merged, trimap)
    assert alpha.shape == (b, h, w, 1)
    assert np.isfinite(np.asarray(alpha)).all()


def test_indexnet_holistic_mode(rng):
    model = build_generator(dict(type="IndexNetMattor", index_mode="holistic"))
    b, h, w = 1, 32, 32
    merged = jnp.asarray(rng.random((b, h, w, 3), np.float32))
    trimap = jnp.asarray(rng.random((b, h, w, 1), np.float32))
    variables = model.init(jax.random.PRNGKey(0), merged, trimap)
    alpha = model.apply(variables, merged, trimap)
    assert alpha.shape == (b, h, w, 1)
