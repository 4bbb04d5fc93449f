"""The six discriminator components missing in round 2 (VERDICT item 6):
built from reference-shaped config dicts and forward-tested."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.core.builder import build_discriminator


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _img(rng, b, h, w, c=3):
    return jnp.asarray(rng.random((b, h, w, c), np.float32))


def test_lightcnn(rng):
    d = build_discriminator(dict(type="LightCNN", in_channels=3))
    x = _img(rng, 2, 128, 128)
    p = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(p, x)
    assert out.shape == (2, 1)


def test_multilayer_disc_fc(rng):
    d = build_discriminator(
        dict(type="MultiLayerDiscriminator", in_channels=3, max_channels=64,
             num_convs=3, fc_in_channels=64 * 8 * 8, fc_out_channels=7)
    )
    x = _img(rng, 2, 64, 64)
    p = d.init(jax.random.PRNGKey(0), x)
    assert d.apply(p, x).shape == (2, 7)


def test_multilayer_disc_out_convs(rng):
    d = build_discriminator(
        dict(type="MultiLayerDiscriminator", in_channels=3, max_channels=64,
             num_convs=3, with_out_convs=True)
    )
    x = _img(rng, 1, 64, 64)
    p = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(p, x)
    assert out.shape == (1, 8, 8, 1)


def test_deepfill_disc_pair(rng):
    d = build_discriminator(
        dict(type="DeepFillv1Discriminators",
             fc_in_global=256 * 4 * 4, fc_in_local=512 * 4 * 4)
    )
    g_img = _img(rng, 2, 64, 64)
    l_img = _img(rng, 2, 64, 64)
    p = d.init(jax.random.PRNGKey(0), (g_img, l_img))
    g_pred, l_pred = d.apply(p, (g_img, l_img))
    assert g_pred.shape == (2, 1) and l_pred.shape == (2, 1)


def test_smpatch_disc_with_spectral_norm(rng):
    d = build_discriminator(
        dict(type="SoftMaskPatchDiscriminator", in_channels=3,
             base_channels=16, num_conv=3, with_spectral_norm=True)
    )
    x = _img(rng, 1, 64, 64)
    vars_ = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(vars_, x)
    assert out.ndim == 4 and out.shape[-1] == 1
    # spectral-norm power-iteration stats update under train
    out2, mut = d.apply(vars_, x, True, mutable=["batch_stats"])
    assert "batch_stats" in mut


def test_ttsr_disc(rng):
    d = build_discriminator(dict(type="TTSRDiscriminator", in_size=64))
    x = _img(rng, 2, 64, 64)
    p = d.init(jax.random.PRNGKey(0), x)
    assert d.apply(p, x).shape == (2, 1)


def test_modified_vgg(rng):
    d = build_discriminator(
        dict(type="ModifiedVGG", in_channels=3, mid_channels=16)
    )
    x = _img(rng, 2, 128, 128)
    vars_ = d.init(jax.random.PRNGKey(0), x)
    out = d.apply(vars_, x)
    assert out.shape == (2, 1)
    # BN stats mutable in train mode
    out2, mut = d.apply(vars_, x, True, mutable=["batch_stats"])
    assert "batch_stats" in mut
