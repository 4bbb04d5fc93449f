"""Plug-and-play cascade e2e (reference README.md:86-106 + tools/test.py
--cascade): the enhancer cleans compressed LR frames, then the enhanced
frames feed a downstream *vanilla* BasicVSR++ (reference basicvsr_pp.py,
the standard x4 VSR) built straight from a reference-style config name.
Metrics are computed on the x4 output against x4 GT (--testdir_gt)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
T_FRAMES = 4
H, W = 64, 64


@pytest.fixture
def fixture_root(tmp_path):
    rng = np.random.default_rng(0)
    sidecar = {"crf15": {}}
    for clip in ("000",):
        png = tmp_path / "crf15" / "png" / clip
        mv = tmp_path / "crf15" / "mv" / clip
        gt4 = tmp_path / "X4" / "png" / clip
        png.mkdir(parents=True)
        mv.mkdir(parents=True)
        gt4.mkdir(parents=True)
        entries = {}
        for i in range(T_FRAMES):
            Image.fromarray(
                rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
            ).save(png / f"{i:08d}.png")
            Image.fromarray(
                rng.integers(0, 256, (4 * H, 4 * W, 3), dtype=np.uint8)
            ).save(gt4 / f"{i:08d}.png")
            np.save(mv / f"{i:08d}.npy", np.zeros((0, 10), np.float32))
            st = "I" if i == 0 else ("P" if i % 2 else "B")
            entries[str(i)] = {"QP": 22.0, "slice": st}
        sidecar["crf15"][clip] = entries
    (tmp_path / "qp.json").write_text(json.dumps(sidecar))
    return tmp_path


def _write_cfgs(tmp_path, root):
    enh = f"""
model = dict(
    type="BasicVSR",
    generator=dict(
        type="IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par",
        mid_channels=8, num_blocks=1, num_experts=2,
    ),
    pixel_loss=dict(type="CharbonnierLoss", loss_weight=1.0),
)
test_cfg = dict(metrics=["PSNR", "SSIM"], crop_border=0)
data = dict(
    test=dict(
        type="SRFolderMultipleGTDataset",
        lq_folder=r"{root}/crf15/png",
        gt_folder=r"{root}/crf15/png",
        num_input_frames={T_FRAMES},
        scale=1,
        pipeline=[dict(
            type="LoadImageFromFileList_ipb",
            qp_slice_file=r"{root}/qp.json",
        )],
    ),
)
"""
    # downstream vanilla BasicVSR++ by its reference type name
    casc = """
model = dict(
    type="BasicVSR",
    generator=dict(
        type="BasicVSRPlusPlus",
        mid_channels=8, num_blocks=1, deform_groups=2,
    ),
    pixel_loss=dict(type="CharbonnierLoss", loss_weight=1.0),
)
test_cfg = dict(metrics=["PSNR", "SSIM"], crop_border=0)
"""
    p_enh = tmp_path / "cascade_enh_cfg.py"
    p_enh.write_text(enh)
    p_casc = tmp_path / "cascade_vsr_cfg.py"
    p_casc.write_text(casc)
    return p_enh, p_casc


def test_cascade_cli_vanilla_bvpp(fixture_root, tmp_path, monkeypatch, capsys):
    sys.path.insert(0, str(REPO / "tools"))
    import test as test_cli

    p_enh, p_casc = _write_cfgs(tmp_path, fixture_root)
    out_pkl = tmp_path / "cascade_metrics.pkl"
    argv = [
        "test.py", str(p_enh), "-", "--cascade",
        "--cascade_config", str(p_casc),
        "--testdir_gt", str(fixture_root / "X4" / "png"),
        "--out", str(out_pkl),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    test_cli.main()
    captured = capsys.readouterr().out
    assert "PSNR" in captured
    import pickle

    metrics = pickle.loads(out_pkl.read_bytes())
    # x4 output vs x4 GT: PSNR of random-init models on random frames is
    # finite and small, but the pipeline must produce it end to end
    assert np.isfinite(metrics["PSNR"]) and metrics["PSNR"] > 0
    assert 0 <= metrics["SSIM"] <= 1
