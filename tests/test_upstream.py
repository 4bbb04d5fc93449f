"""Upstream generation/inpainting/matting families + mask utils +
matting metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.core.builder import BACKBONES, COMPONENTS


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_resnet_generator_and_patch_disc(rng):
    gen = BACKBONES.build(dict(type="ResnetGenerator", base_channels=8, num_blocks=2))
    x = jnp.asarray(rng.random((1, 32, 32, 3), np.float32) * 2 - 1)
    params = gen.init(jax.random.PRNGKey(0), x)
    out = gen.apply(params, x)
    assert out.shape == x.shape and np.abs(np.asarray(out)).max() <= 1.0

    disc = COMPONENTS.build(dict(type="PatchDiscriminator", base_channels=8))
    dp = disc.init(jax.random.PRNGKey(0), x)
    d = disc.apply(dp, x)
    assert d["prediction"].ndim == 4 and len(d["feature_maps"]) == 4


def test_unet_generator(rng):
    gen = BACKBONES.build(dict(type="UnetGenerator", base_channels=4, num_down=6))
    x = jnp.asarray(rng.random((1, 64, 64, 3), np.float32))
    params = gen.init(jax.random.PRNGKey(0), x)
    out = gen.apply(params, x)
    assert out.shape == x.shape


def test_gl_inpaintor_with_mask(rng):
    from pnp_vcve_tpu.utils.mask import bbox2mask, random_bbox

    gl = BACKBONES.build(dict(type="GLEncoderDecoder"))
    img = rng.random((1, 64, 64, 3)).astype(np.float32)
    bbox = random_bbox((64, 64), (20, 20), max_bbox_delta=8, min_margin=4,
                       rng=rng)
    mask = bbox2mask((64, 64), bbox, dtype="float32")[None]
    masked = img * (1 - mask)
    x = jnp.asarray(np.concatenate([masked, mask], axis=-1))
    params = gl.init(jax.random.PRNGKey(0), x)
    out = gl.apply(params, x)
    assert out.shape == (1, 64, 64, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_dim_mattor(rng):
    dim = BACKBONES.build(dict(type="DIM", base_channels=4))
    merged = jnp.asarray(rng.random((1, 32, 32, 3), np.float32))
    trimap = jnp.asarray(rng.random((1, 32, 32, 1), np.float32))
    params = dim.init(jax.random.PRNGKey(0), merged, trimap)
    alpha = dim.apply(params, merged, trimap)
    assert alpha.shape == (1, 32, 32, 1)
    assert 0 <= float(alpha.min()) and float(alpha.max()) <= 1


def test_mask_generators(rng):
    from pnp_vcve_tpu.utils.mask import (
        brush_stroke_mask,
        get_irregular_mask,
        random_irregular_mask,
    )

    m = brush_stroke_mask((64, 64), rng=rng)
    assert m.shape == (64, 64, 1) and set(np.unique(m)).issubset({0, 1})
    assert m.sum() > 0
    m2 = random_irregular_mask((64, 64), rng=rng)
    assert m2.shape == (64, 64, 1) and m2.sum() > 0
    m3 = get_irregular_mask((64, 64), area_ratio_range=(0.0, 1.0), rng=rng)
    assert m3.shape == (64, 64, 1)


def test_matting_metrics(rng):
    from pnp_vcve_tpu.metrics.matting import connectivity, gradient_error, mse, sad

    h = w = 48
    alpha = (rng.random((h, w)) * 255).astype(np.uint8)
    trimap = np.full((h, w), 128, np.uint8)
    trimap[:8] = 0
    trimap[-8:] = 255
    alpha[:8] = 0
    alpha[-8:] = 255
    # a prediction masked by the trimap
    pred = np.clip(alpha.astype(np.int32) + rng.integers(-20, 21, (h, w)), 0, 255).astype(np.uint8)
    pred[trimap == 0] = 0
    pred[trimap == 255] = 255

    perfect = alpha.copy()
    assert sad(alpha, trimap, perfect) == 0
    assert mse(alpha, trimap, perfect) == 0
    assert gradient_error(alpha, trimap, perfect) == pytest.approx(0, abs=1e-9)
    assert connectivity(alpha, trimap, perfect) == pytest.approx(0, abs=1e-6)
    assert sad(alpha, trimap, pred) > 0
    assert mse(alpha, trimap, pred) > 0
    assert gradient_error(alpha, trimap, pred) > 0
    # unmasked prediction raises (reference asserts)
    with pytest.raises(ValueError):
        sad(alpha, trimap, alpha * 0 + 7)


def test_stylegan2_generator_and_discriminator(rng):
    from pnp_vcve_tpu.core.builder import BACKBONES, COMPONENTS

    gen = BACKBONES.build(dict(type="StyleGANv2Generator", out_size=32,
                               style_channels=32, max_channels=32))
    z = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
    params = gen.init(jax.random.PRNGKey(0), z)
    img = gen.apply(params, z)
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
    # demodulated style convs: different latents give different images
    img2 = gen.apply(params, z[::-1])
    assert np.abs(np.asarray(img) - np.asarray(img2)).max() > 1e-6

    disc = COMPONENTS.build(dict(type="StyleGANv2Discriminator", in_size=32,
                                 max_channels=32))
    dp = disc.init(jax.random.PRNGKey(1), img)
    score = disc.apply(dp, img)
    assert score.shape == (2, 1)
    assert np.isfinite(np.asarray(score)).all()


def test_cain_vfi(rng):
    from pnp_vcve_tpu.core.builder import BACKBONES

    net = BACKBONES.build(dict(type="CAIN", mid_channels=8, depth=2,
                               num_block_groups=1, num_block_layers=2))
    imgs = jnp.asarray(rng.random((1, 2, 32, 32, 3), np.float32))
    params = net.init(jax.random.PRNGKey(0), imgs)
    out = net.apply(params, imgs)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
    # identical inputs at mean 0.5 -> output mean near 0.5 (mean restore)
    const = jnp.full((1, 2, 32, 32, 3), 0.5)
    out2 = net.apply(params, const)
    assert abs(float(out2.mean()) - 0.5) < 0.5


def test_masked_and_composition_losses(rng):
    from pnp_vcve_tpu.train.losses import l1_composition_loss, masked_l1_loss

    pred = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    tgt = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4].set(1.0)
    # masked loss == plain l1 over the masked half
    expected = float(np.abs(np.asarray(pred - tgt))[:, :4].mean())
    assert float(masked_l1_loss(pred, tgt, mask)) == pytest.approx(expected, rel=1e-5)
    # all-ones mask == plain mean
    assert float(masked_l1_loss(pred, tgt, jnp.ones((1, 8, 8, 1)))) == pytest.approx(
        float(np.abs(np.asarray(pred - tgt)).mean()), rel=1e-5)

    alpha = jnp.asarray(rng.random((1, 8, 8, 1), np.float32))
    fg = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    bg = jnp.asarray(rng.random((1, 8, 8, 3), np.float32))
    merged = alpha * fg + (1 - alpha) * bg
    assert float(l1_composition_loss(alpha, fg, bg, merged)) == pytest.approx(0, abs=1e-7)
    assert float(l1_composition_loss(alpha * 0.5, fg, bg, merged)) > 0


def test_generation_paired_dataset(rng, tmp_path):
    from PIL import Image

    from pnp_vcve_tpu.core.builder import build_dataset

    d = tmp_path / "train"
    d.mkdir()
    for i in range(3):
        img = (rng.random((32, 64, 3)) * 255).astype(np.uint8)  # A|B
        Image.fromarray(img).save(d / f"{i}.png")
    ds = build_dataset(dict(type="GenerationPairedDataset",
                            dataroot=str(tmp_path), crop_size=16))
    s = ds.sample(np.random.default_rng(0))
    assert s["img_a"].shape == (16, 16, 3)
    assert s["img_b"].shape == (16, 16, 3)
    items = list(ds)
    assert len(items) == 3 and items[0]["img_a"].shape == (32, 32, 3)


def test_glean(rng):
    from pnp_vcve_tpu.core.builder import BACKBONES

    net = BACKBONES.build(dict(type="GLEAN", in_size=16, out_size=64,
                               rrdb_channels=8, num_rrdbs=1,
                               style_channels=16, max_channels=16))
    lq = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
    params = net.init(jax.random.PRNGKey(0), lq)
    out = net.apply(params, lq)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()
    # the latent bank must engage: different inputs -> different codes/outputs
    out2 = net.apply(params, lq * 0.5)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_liif_arbitrary_scale(rng):
    from pnp_vcve_tpu.core.builder import BACKBONES
    from pnp_vcve_tpu.models.upstream import make_coord

    net = BACKBONES.build(dict(type="LIIF", mid_channels=8, num_blocks=2,
                               mlp_hidden=(16, 16)))
    x = jnp.asarray(rng.random((1, 16, 16, 3), np.float32))
    # query a 24x24 grid (x1.5, non-integer scale)
    coord = make_coord((24, 24))[None]
    cell = jnp.full((1, 24 * 24, 2), 2.0 / 24)
    params = net.init(jax.random.PRNGKey(0), x, coord, cell)
    out = net.apply(params, x, coord, cell)
    assert out.shape == (1, 576, 3)
    assert np.isfinite(np.asarray(out)).all()
    # and a x2 grid from the same params (scale generalization)
    coord2 = make_coord((32, 32))[None]
    cell2 = jnp.full((1, 32 * 32, 2), 2.0 / 32)
    out2 = net.apply(params, x, coord2, cell2)
    assert out2.shape == (1, 1024, 3)
