"""EXACT chunked two-sweep scan (north star, SURVEY §7.3.9): the carry
API must make chunked execution numerically identical to the full scan,
sequentially and through the shard_map pipeline on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.models import PnPVCVE
from pnp_vcve_tpu.models.pnp_vcve import keyframe_indices

B, T, H, W = 1, 8, 16, 16


@pytest.fixture(scope="module")
def model_params_inputs():
    rng = np.random.default_rng(0)
    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=False)
    slices = np.array([[73.0, 66.0, 80.0, 66.0, 66.0, 80.0, 66.0, 66.0]])
    inp = dict(
        lrs=jnp.asarray(rng.random((B, T, H, W, 3), np.float32)),
        qps=jnp.asarray(rng.random((B, T), np.float32)),
        slices=jnp.asarray(slices),
        mvs=jnp.asarray(rng.standard_normal((B, T, H, W, 4)).astype(np.float32) * 2),
        base_qps=jnp.full((B, T), 15.0 / 255.0),
        par_map=jnp.asarray((rng.random((B, T, H, W, 3)) > 0.5).astype(np.float32) / 255),
    )
    params = model.init(jax.random.PRNGKey(0), **inp)["params"]
    full = np.asarray(model.apply({"params": params}, **inp))
    return model, params, inp, full


def _chunk(inp, s, e):
    return {k: v[:, s:e] for k, v in inp.items()}


def test_sequential_chunked_equals_full(model_params_inputs):
    """Two chunks driven by explicit carries == the full scan."""
    model, params, inp, full = model_params_inputs
    keyframe, _, _ = keyframe_indices(inp["slices"])

    mid = T // 2
    km = lambda s, e: keyframe[:, s:e]

    # backward sweep: right chunk first, carry flows right -> left
    featsR, carry_b = model.apply(
        {"params": params}, **_chunk(inp, mid, T), sweep="backward",
        keyframe_mask=km(mid, T),
    )
    featsL, _ = model.apply(
        {"params": params}, **_chunk(inp, 0, mid), sweep="backward",
        carry=carry_b, keyframe_mask=km(0, mid),
    )
    # forward sweep: left chunk first, carry flows left -> right
    ysL, carry_f = model.apply(
        {"params": params}, **_chunk(inp, 0, mid), sweep="forward",
        bwd_feats=featsL, keyframe_mask=km(0, mid),
    )
    ysR, _ = model.apply(
        {"params": params}, **_chunk(inp, mid, T), sweep="forward",
        carry=carry_f, bwd_feats=featsR, keyframe_mask=km(mid, T),
    )
    got = np.concatenate([np.asarray(ysL), np.asarray(ysR)], axis=1)
    np.testing.assert_allclose(got, full, atol=2e-6, rtol=1e-6)


def test_full_sweep_unchanged_default(model_params_inputs):
    """sweep='full' without carries is byte-compatible with the old API."""
    model, params, inp, full = model_params_inputs
    again = np.asarray(model.apply({"params": params}, **inp, sweep="full"))
    np.testing.assert_array_equal(again, full)


def test_exact_pipeline_on_8_device_mesh(model_params_inputs):
    from jax.sharding import Mesh

    from pnp_vcve_tpu.parallel.seqpar import enhance_clip_exact_pipeline

    model, params, inp, full = model_params_inputs
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    sample = {
        "lq": np.asarray(inp["lrs"][0]),
        "qps": np.asarray(inp["qps"][0]),
        "slices": np.asarray(inp["slices"][0]),
        "mvs": np.asarray(inp["mvs"][0]),
        "base_qps": np.asarray(inp["base_qps"][0]),
        "partitions": np.asarray(inp["par_map"][0]),
    }
    got = enhance_clip_exact_pipeline(model, params, sample, mesh)
    np.testing.assert_allclose(got, full[0], atol=2e-6, rtol=1e-6)


def test_exact_pipeline_chunks_gt_one_frame(model_params_inputs):
    """D=4 chunks of 2 frames on a 4-device submesh."""
    from jax.sharding import Mesh

    from pnp_vcve_tpu.parallel.seqpar import (
        enhance_clip_exact_pipeline,
        largest_divisor_chunks,
    )

    model, params, inp, full = model_params_inputs
    assert largest_divisor_chunks(8, 5) == 4
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    sample = {
        "lq": np.asarray(inp["lrs"][0]),
        "qps": np.asarray(inp["qps"][0]),
        "slices": np.asarray(inp["slices"][0]),
        "mvs": np.asarray(inp["mvs"][0]),
        "base_qps": np.asarray(inp["base_qps"][0]),
        "partitions": np.asarray(inp["par_map"][0]),
    }
    got = enhance_clip_exact_pipeline(model, params, sample, mesh)
    np.testing.assert_allclose(got, full[0], atol=2e-6, rtol=1e-6)


def _make_clip(rng, slices_row):
    return {
        "lq": rng.random((T, H, W, 3)).astype(np.float32),
        "qps": rng.random(T).astype(np.float32),
        "slices": np.asarray(slices_row, np.float32),
        "mvs": (rng.standard_normal((T, H, W, 4)) * 2).astype(np.float32),
        "base_qps": np.full(T, 15.0 / 255.0, np.float32),
        "partitions": (rng.random((T, H, W, 3)) > 0.5).astype(np.float32) / 255,
    }


def test_stream_schedule_bitwise_equals_per_clip(model_params_inputs):
    """B=3 clips through the B/(B+D-1) streaming schedule == 3 independent
    single-clip pipeline runs, bitwise (different keyframe layouts per clip
    so the carry diagonals are actually exercised)."""
    from jax.sharding import Mesh

    from pnp_vcve_tpu.parallel.seqpar import (
        enhance_clip_exact_pipeline,
        enhance_clips_exact_stream,
    )

    model, params, _, _ = model_params_inputs
    rng = np.random.default_rng(7)
    clips = [
        _make_clip(rng, [73.0, 66.0, 80.0, 66.0, 66.0, 80.0, 66.0, 66.0]),
        _make_clip(rng, [73.0, 80.0, 66.0, 66.0, 80.0, 66.0, 66.0, 80.0]),
        _make_clip(rng, [66.0] * 8),  # no interior keyframes at all
    ]
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    streamed = enhance_clips_exact_stream(model, params, clips, mesh)
    assert len(streamed) == 3
    for clip, got in zip(clips, streamed):
        want = enhance_clip_exact_pipeline(model, params, clip, mesh)
        np.testing.assert_array_equal(got, want)


def test_stream_schedule_single_clip_and_full_depth(model_params_inputs):
    """Degenerate B=1 and D=8 (one frame per chunk) corners of the stream."""
    from jax.sharding import Mesh

    from pnp_vcve_tpu.parallel.seqpar import enhance_clips_exact_stream

    model, params, inp, full = model_params_inputs
    sample = {
        "lq": np.asarray(inp["lrs"][0]),
        "qps": np.asarray(inp["qps"][0]),
        "slices": np.asarray(inp["slices"][0]),
        "mvs": np.asarray(inp["mvs"][0]),
        "base_qps": np.asarray(inp["base_qps"][0]),
        "partitions": np.asarray(inp["par_map"][0]),
    }
    mesh = Mesh(np.array(jax.devices()[:8]), ("sp",))
    (got,) = enhance_clips_exact_stream(model, params, [sample], mesh)
    np.testing.assert_allclose(got, full[0], atol=2e-6, rtol=1e-6)


def test_evaluate_dataset_exact_frame_parallel(model_params_inputs):
    """evaluate_dataset(frame_parallel='exact') matches the default path."""
    from pnp_vcve_tpu.models.restorer import Restorer
    from pnp_vcve_tpu.train.eval import evaluate_dataset

    model, params, inp, full = model_params_inputs
    rng = np.random.default_rng(3)
    sample = {
        "lq": np.asarray(inp["lrs"][0]),
        "qps": np.asarray(inp["qps"][0]),
        "slices": np.asarray(inp["slices"][0]),
        "mvs": np.asarray(inp["mvs"][0]),
        "base_qps": np.asarray(inp["base_qps"][0]),
        "partitions": np.asarray(inp["par_map"][0]),
        "gt": rng.random((T, H, W, 3)).astype(np.float32),
        "clip_name": "000",
    }
    restorer = Restorer(
        generator=model, test_cfg={"metrics": ["PSNR"], "crop_border": 0}
    )
    base = evaluate_dataset(restorer, params, [sample], verbose=False)
    exact = evaluate_dataset(
        restorer, params, [sample], verbose=False, frame_parallel="exact"
    )
    assert exact["PSNR"] == pytest.approx(base["PSNR"], abs=1e-4)


# ---------------------------------------------------------------------------
# PF-resident serving pipeline (warp_impl='pf') through the same carry API:
# the headline single-chip path must compose with the exact multi-chip
# pipeline (VERDICT r4 #1). Interpret-mode Pallas on the CPU mesh; c=64 is
# the PF contract, so these are the slow tier's heaviest seqpar tests.
# ---------------------------------------------------------------------------

T_PF, H_PF, W_PF = 4, 16, 32


@pytest.fixture(scope="module")
def pf_model_params_inputs():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)
    model = PnPVCVE(
        mid_channels=64, num_blocks=2, num_experts=2, remat=False,
        use_pallas_kernels=True, warp_impl="pf",
    )
    # block-constant flows with |MV| <= 16: the PF warp's exactness domain
    fb = rng.uniform(-16.0, 16.0, (B, T_PF, H_PF // 8, W_PF // 8, 4))
    mvs = jnp.asarray(
        np.repeat(np.repeat(fb.astype(np.float32), 8, axis=2), 8, axis=3)
    )
    inp = dict(
        lrs=jnp.asarray(rng.random((B, T_PF, H_PF, W_PF, 3), np.float32)),
        qps=jnp.asarray(rng.random((B, T_PF), np.float32)),
        slices=jnp.asarray([[73.0, 66.0, 80.0, 66.0]]),
        mvs=mvs,
        base_qps=jnp.full((B, T_PF), 15.0 / 255.0),
        par_map=jnp.asarray(
            (rng.random((B, T_PF, H_PF, W_PF, 3)) > 0.5).astype(np.float32) / 255
        ),
    )
    with pltpu.force_tpu_interpret_mode():
        params = model.init(jax.random.PRNGKey(0), **inp)["params"]
        full = np.asarray(model.apply({"params": params}, **inp))
    return model, params, inp, full


def test_pf_sequential_chunked_equals_full(pf_model_params_inputs):
    """PF chunked sweeps driven by explicit PF-layout carries == full scan,
    bitwise."""
    from jax.experimental.pallas import tpu as pltpu

    model, params, inp, full = pf_model_params_inputs
    keyframe, _, _ = keyframe_indices(inp["slices"])
    mid = T_PF // 2
    km = lambda s, e: keyframe[:, s:e]

    with pltpu.force_tpu_interpret_mode():
        featsR, carry_b = model.apply(
            {"params": params}, **_chunk(inp, mid, T_PF), sweep="backward",
            keyframe_mask=km(mid, T_PF),
        )
        # the PF carry/feature layout is the packed (b, HP, WP, 2c) tensor
        hp, wp, c2 = model.carry_feature_shape(H_PF, W_PF)
        assert featsR.shape == (B, T_PF - mid, hp, wp, c2)
        assert carry_b[0].shape == (B, hp, wp, c2)
        featsL, _ = model.apply(
            {"params": params}, **_chunk(inp, 0, mid), sweep="backward",
            carry=carry_b, keyframe_mask=km(0, mid),
        )
        ysL, carry_f = model.apply(
            {"params": params}, **_chunk(inp, 0, mid), sweep="forward",
            bwd_feats=featsL, keyframe_mask=km(0, mid),
        )
        ysR, _ = model.apply(
            {"params": params}, **_chunk(inp, mid, T_PF), sweep="forward",
            carry=carry_f, bwd_feats=featsR, keyframe_mask=km(mid, T_PF),
        )
    got = np.concatenate([np.asarray(ysL), np.asarray(ysR)], axis=1)
    np.testing.assert_array_equal(got, full)


def test_pf_exact_pipeline_on_mesh(pf_model_params_inputs):
    """warp_impl='pf' through enhance_clip_exact_pipeline on a 4-device
    mesh == the single-device PF scan, bitwise."""
    from jax.experimental.pallas import tpu as pltpu
    from jax.sharding import Mesh

    from pnp_vcve_tpu.parallel.seqpar import enhance_clip_exact_pipeline

    model, params, inp, full = pf_model_params_inputs
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    sample = {
        "lq": np.asarray(inp["lrs"][0]),
        "qps": np.asarray(inp["qps"][0]),
        "slices": np.asarray(inp["slices"][0]),
        "mvs": np.asarray(inp["mvs"][0]),
        "base_qps": np.asarray(inp["base_qps"][0]),
        "partitions": np.asarray(inp["par_map"][0]),
    }
    with pltpu.force_tpu_interpret_mode():
        got = enhance_clip_exact_pipeline(model, params, sample, mesh)
    np.testing.assert_array_equal(got, full[0])
