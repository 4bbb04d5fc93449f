"""Deployment scoring path: export a tiny model, then tools/deploy_test.py
must score the SERIALIZED artifact over the synthetic dataset (reference
tools/deploy_test.py:181 analog)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
T_FRAMES, H, W = 4, 32, 32


@pytest.fixture
def fixture_root(tmp_path):
    rng = np.random.default_rng(0)
    sidecar = {"crf15": {}}
    for clip in ("000",):
        png = tmp_path / "crf15" / "png" / clip
        mv = tmp_path / "crf15" / "mv" / clip
        gt = tmp_path / "sharp" / "png" / clip
        for d in (png, mv, gt):
            d.mkdir(parents=True)
        entries = {}
        for i in range(T_FRAMES):
            Image.fromarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8)).save(
                png / f"{i:08d}.png")
            Image.fromarray(rng.integers(0, 256, (H, W, 3), dtype=np.uint8)).save(
                gt / f"{i:08d}.png")
            np.save(mv / f"{i:08d}.npy", np.zeros((0, 10), np.float32))
            entries[str(i)] = {"QP": 22.0, "slice": "I" if i == 0 else "P"}
        sidecar["crf15"][clip] = entries
    (tmp_path / "qp.json").write_text(json.dumps(sidecar))
    cfg = tmp_path / "cfg.py"
    cfg.write_text(f"""
model = dict(
    type="BasicVSR",
    generator=dict(
        type="IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par",
        mid_channels=8, num_blocks=1, num_experts=2),
    pixel_loss=dict(type="CharbonnierLoss", loss_weight=1.0),
)
test_cfg = dict(metrics=["PSNR", "SSIM"], crop_border=0)
data = dict(test=dict(
    type="SRFolderMultipleGTDataset",
    lq_folder=r"{tmp_path}/crf15/png",
    gt_folder=r"{tmp_path}/sharp/png",
    num_input_frames={T_FRAMES},
    scale=1,
    pipeline=[dict(type="LoadImageFromFileList_ipb",
                   qp_slice_file=r"{tmp_path}/qp.json")],
))
""")
    return tmp_path, cfg


def test_export_then_deploy_test(fixture_root, tmp_path, monkeypatch, capsys):
    root, cfg = fixture_root
    sys.path.insert(0, str(REPO / "tools"))
    import export_model

    blob = tmp_path / "model.stablehlo"
    monkeypatch.setattr(sys, "argv", [
        "export_model.py", str(cfg), "-", str(blob),
        "--shape", str(T_FRAMES), str(H), str(W),
    ])
    export_model.main()
    assert blob.exists()

    import deploy_test

    out_pkl = tmp_path / "deploy_metrics.pkl"
    monkeypatch.setattr(sys, "argv", [
        "deploy_test.py", str(cfg), str(blob), "--out", str(out_pkl),
    ])
    deploy_test.main()

    import pickle

    metrics = pickle.loads(out_pkl.read_bytes())
    assert set(metrics) == {"PSNR", "SSIM"}
    # random-vs-random frames: PSNR finite, SSIM in [-1, 1] (can go
    # negative on uncorrelated noise)
    assert np.isfinite(metrics["PSNR"]) and -1 <= metrics["SSIM"] <= 1
    assert "dataset mean" in capsys.readouterr().out
