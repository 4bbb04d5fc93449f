"""Protocol-scale eval harness (tools/protocol_eval.py): the reference's
100-frame-clip regression protocol (tools/test.py:175-182 +
basicvsr.py:155-233) driven through tools/dist_test.sh with per-clip
PSNR/SSIM, PNG dump, and the chunked-vs-exact-pipeline cross-check.

The full-scale run (4 clips x 100 frames x 720p, real chip + CPU mesh) is
recorded as PROTOCOL_r05.json by the same driver; these tests exercise the
identical code paths at CI scale."""

import importlib
import json
import sys
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))
sys.path.insert(0, str(REPO / "tools" / "data"))


def _args(**over):
    base = dict(
        root="", frames=12, height=64, width=96, clips="000,011,015,020",
        chunk_t=4, skip_chip=True, skip_cpu=False, cpu_mid=8, cpu_blocks=1,
        cpu_experts=2, cpu_clips=2, cpu_frames=None, stream_clips=2, out=None,
    )
    base.update(over)
    return SimpleNamespace(**base)


@pytest.mark.slow
def test_fixture_generator_layout_and_mvs(tmp_path):
    mpf = importlib.import_module("make_protocol_fixture")
    root = mpf.write_fixture(tmp_path, clips=("000",), frames=4,
                             height=32, width=48, quiet=True)
    assert (root / "crf15" / "png" / "000" / "00000003.png").exists()
    assert (root / "sharp" / "png" / "000" / "00000003.png").exists()
    side = json.loads((root / "qp.json").read_text())
    assert side["crf15"]["000"]["0"]["slice"] == "I"
    # MV records are true block motion: rasterized flow must predict the
    # next frame exactly away from the wrap seam (content is np.roll of a
    # periodic texture; MVs encode flow = -(dx, dy))
    from PIL import Image

    from pnp_vcve_tpu.data.mv_raster import rasterize_clip

    recs = [np.load(root / "crf15" / "mv" / "000" / f"{i:08d}.npy")
            for i in range(4)]
    sts = [side["crf15"]["000"][str(i)]["slice"] for i in range(4)]
    mvs, parts = rasterize_clip(recs, sts, 32, 48)
    assert mvs.shape == (4, 32, 48, 4)
    # frame 1 is a P frame with per-block forward MV = -(2, 1)
    assert np.allclose(mvs[1, 8:24, 8:40, 0], -2.0)
    assert np.allclose(mvs[1, 8:24, 8:40, 1], -1.0)
    g0 = np.asarray(Image.open(root / "sharp" / "png" / "000" / "00000000.png"),
                    np.float32)
    g1 = np.asarray(Image.open(root / "sharp" / "png" / "000" / "00000001.png"),
                    np.float32)
    # pull frame 0 by the flow -> frame 1 (integer motion: exact roll)
    pulled = np.roll(g0, (1, 2), axis=(0, 1))
    np.testing.assert_array_equal(pulled, g1)


@pytest.mark.slow
def test_protocol_cpu_legs_cross_check(tmp_path):
    """Whole-clip scan vs exact multi-chip pipeline through the actual
    dist_test.sh CLI: equal metrics, bitwise-equal PNGs. (The driver
    raises on any mismatch.)"""
    pe = importlib.import_module("protocol_eval")
    args = _args(root=str(tmp_path / "proto"), frames=12, height=64,
                 width=96, chunk_t=4)
    artifact = pe.run_protocol(args)
    leg = artifact["cpu_mesh_exactness"]
    assert leg["cross_check"]["max_uint8_diff"] == 0
    assert leg["cross_check"]["frames_compared"] == 24  # 2 clips x 12
    for clip, m in leg["whole_clip_scan"]["per_clip"].items():
        assert m == leg["exact_pipeline"]["per_clip"][clip] or (
            m["PSNR"] == leg["exact_pipeline"]["per_clip"][clip]["PSNR"]
        )
    assert artifact["input_psnr_frame0"] > 20  # degradation, not noise


@pytest.mark.tpu
def test_protocol_chip_leg_full_shape(tmp_path):
    """Full flagship shape + converted parity weights through the chip
    chunk-t protocol path at reduced frame count (the 4x100x720p run is
    recorded as PROTOCOL_r05.json by the same driver)."""
    import os

    if os.environ.get("PNP_TESTS_TPU") != "1":
        pytest.skip("real-chip tier (PNP_TESTS_TPU=1)")
    pe = importlib.import_module("protocol_eval")
    args = _args(root=str(tmp_path / "proto_tpu"), frames=8, height=64,
                 width=96, chunk_t=4, skip_chip=False, skip_cpu=True)
    artifact = pe.run_protocol(args)
    leg = artifact["chip_chunked_full_shape"]
    assert set(leg["per_clip"]) == {"000", "011", "015", "020"}
    for m in leg["per_clip"].values():
        assert m["frames"] == 8
        assert np.isfinite(m["PSNR"]) and 0 <= m["SSIM"] <= 1
