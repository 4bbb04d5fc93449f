"""Inpaintor family (DeepFill v1/v2, PConv, AOT): forward-shape tests from
reference-shaped config dicts, plus a TRUE torch oracle for the contextual
attention op (the reference's common/contextual_attention.py run on CPU
through the tests/oracle shim)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.core.builder import build_generator


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_contextual_attention_matches_torch_oracle(rng):
    torch = pytest.importorskip("torch")
    from tests.oracle.loader import load_ref

    ca_mod = load_ref("mmedit.models.common.contextual_attention")

    class _RefCA(ca_mod.ContextualAttentionModule):
        # torch>=2 nearest-downsample returns a non-contiguous view; the
        # reference's `.view` in patch_correlation then throws. contiguous()
        # preserves numerics exactly.
        def patch_correlation(self, x, kernel):
            return super().patch_correlation(x.contiguous(), kernel)

    ref = _RefCA()

    b, h, w, c = 2, 16, 16, 8
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    ctx = rng.standard_normal((b, h, w, c)).astype(np.float32)
    mask = np.zeros((b, h, w, 1), np.float32)
    mask[:, 4:10, 5:12] = 1.0

    tx = torch.tensor(np.moveaxis(x, -1, 1))
    tctx = torch.tensor(np.moveaxis(ctx, -1, 1))
    tmask = torch.tensor(np.moveaxis(mask, -1, 1))
    with torch.no_grad():
        expected, _ = ref(tx, tctx, mask=tmask)
    expected = expected.numpy()

    from pnp_vcve_tpu.models.upstream.inpainting import contextual_attention

    out, score = contextual_attention(
        jnp.asarray(x), jnp.asarray(ctx), jnp.asarray(mask)
    )
    got = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("conv_type", ["conv", "gated_conv"])
def test_deepfill_forward(rng, conv_type):
    model = build_generator(
        dict(type="DeepFillEncoderDecoder", conv_type=conv_type)
    )
    b, h, w = 1, 64, 64
    masked = jnp.asarray(rng.random((b, h, w, 3), np.float32)) * 2 - 1
    mask = jnp.zeros((b, h, w, 1)).at[:, 16:32, 16:40].set(1.0)
    x = jnp.concatenate([masked, jnp.ones((b, h, w, 1)), mask], axis=-1)
    params = model.init(jax.random.PRNGKey(0), x)
    s1, s2 = model.apply(params, x)
    assert s1.shape == (b, h, w, 3) and s2.shape == (b, h, w, 3)
    assert np.isfinite(np.asarray(s2)).all()
    assert float(jnp.abs(s2).max()) <= 1.0


def test_pconv_forward(rng):
    model = build_generator(dict(type="PConvEncoderDecoder", num_layers=5))
    b, h, w = 1, 64, 64
    img = jnp.asarray(rng.random((b, h, w, 3), np.float32))
    valid = jnp.ones((b, h, w, 1)).at[:, 8:24, 8:40].set(0.0)
    params = model.init(jax.random.PRNGKey(0), img, valid)
    out, m = model.apply(params, img, valid)
    assert out.shape == (b, h, w, 3)
    assert np.isfinite(np.asarray(out)).all()
    # masks only ever grow toward valid
    assert float(m.min()) >= 0.0 and float(m.max()) <= 1.0


def test_aot_forward(rng):
    model = build_generator(
        dict(type="AOTEncoderDecoder", mid_channels=16, neck_channels=32,
             num_aotblock=2)
    )
    b, h, w = 1, 64, 64
    masked = jnp.asarray(rng.random((b, h, w, 3), np.float32)) * 2 - 1
    mask = jnp.zeros((b, h, w, 1)).at[:, 16:32, 16:40].set(1.0)
    x = jnp.concatenate([masked, mask], axis=-1)
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (b, h, w, 3)
    assert float(jnp.abs(out).max()) <= 1.0
