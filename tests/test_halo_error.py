"""Quantified halo-decay contract for the APPROXIMATE frame-parallel path
(VERDICT r2 weak #5): at flagship width (mid_channels=64) with
rasterizer-realistic block-constant MVs, the overlapped-window error must
decay monotonically in halo_t and satisfy a documented bound.

The EXACT path (parallel/seqpar.py) has zero error by construction; this
file pins down the accuracy contract of the cheaper windowed serving mode
(train/eval.py enhance_clip_frame_parallel).
"""

import numpy as np
import jax
import pytest

from pnp_vcve_tpu.models import PnPVCVE
from pnp_vcve_tpu.parallel.sharding import make_mesh
from pnp_vcve_tpu.train.eval import enhance_clip, enhance_clip_frame_parallel
from pnp_vcve_tpu.train.train_step import make_eval_step

T, H, W = 12, 32, 32


@pytest.fixture(scope="module")
def flagship_width_setup():
    rng = np.random.default_rng(0)
    # rasterizer-shaped priors: MVs constant per 8x8 block, |mv| <= 8 px,
    # I/P keyframes every 4 frames (bench.py make_inputs shape)
    mvs_blk = (rng.standard_normal((T, H // 8, W // 8, 4)) * 3).astype(np.float32)
    mvs = np.repeat(np.repeat(mvs_blk, 8, axis=1), 8, axis=2)
    slices = np.full((T,), 66.0, np.float32)
    slices[::4] = 80.0
    slices[0] = 73.0
    par_blk = (rng.random((T, H // 8, W // 8, 3)) > 0.5).astype(np.float32)
    sample = {
        "lq": rng.random((T, H, W, 3)).astype(np.float32),
        "qps": rng.random((T,)).astype(np.float32),
        "slices": slices,
        "mvs": mvs,
        "base_qps": np.full((T,), 15 / 255, np.float32),
        "partitions": np.repeat(np.repeat(par_blk, 8, axis=1), 8, axis=2) / 255,
    }
    # flagship channel width and block count; spatial size reduced (the
    # recurrence/halo structure is along t, not space)
    model = PnPVCVE(mid_channels=64, num_blocks=8, num_experts=6, remat=True)
    b1 = {k: v[None][:, :4] for k, v in sample.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        lrs=b1["lq"], qps=b1["qps"], slices=b1["slices"], mvs=b1["mvs"],
        base_qps=b1["base_qps"], par_map=b1["partitions"],
    )["params"]
    step = make_eval_step(model)
    full = enhance_clip(step, params, sample)
    return step, params, sample, full


def test_halo_error_decays_and_is_bounded(flagship_width_setup):
    step, params, sample, full = flagship_width_setup
    mesh = make_mesh(sp=1)
    scale = float(np.abs(full).mean())
    errs = {}
    for halo in (0, 1, 2, 3):
        par = enhance_clip_frame_parallel(
            step, params, sample, mesh, chunk_t=3, halo_t=halo
        )
        errs[halo] = float(np.abs(par - full).max())
    print("halo max-abs error @ mid=64:", errs, "output scale:", scale)

    # decay: each halo frame must cut the worst-case error (strictly until
    # it hits float noise)
    assert errs[1] <= errs[0]
    assert errs[2] <= errs[1]
    assert errs[3] <= errs[2]
    # documented serving contract (measured on a random-weight flagship —
    # PESSIMISTIC: random recurrences contract slower than trained ones):
    # halo_t=2 keeps worst-case error below 1% of signal scale, halo_t=3
    # below 0.75%
    assert errs[2] < 0.01 * max(scale, 1e-3)
    assert errs[3] < 0.0075 * max(scale, 1e-3)


def test_halo_error_translates_to_psnr(flagship_width_setup):
    """The windowed mode must stay within 0.05 dB of the exact output when
    scored like the eval protocol (uint8 PSNR against the exact frames)."""
    from pnp_vcve_tpu.metrics import tensor2img
    from pnp_vcve_tpu.metrics.quality import psnr

    step, params, sample, full = flagship_width_setup
    mesh = make_mesh(sp=1)
    par = enhance_clip_frame_parallel(
        step, params, sample, mesh, chunk_t=3, halo_t=2
    )
    vals = [
        psnr(tensor2img(par[i]), tensor2img(full[i]), crop_border=0)
        for i in range(T)
    ]
    worst = min(vals)
    print("windowed-vs-exact per-frame PSNR (dB): worst =", worst)
    assert worst > 55.0  # ~amplitude error < 0.18% of range on every frame
