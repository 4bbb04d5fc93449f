"""MFQE two-model joint protocol must run end-to-end from tools/test.py
(--joint-pqf-config/--joint-pqf-ckpt), producing per-clip metrics on the
synthetic fixture (reference protocol: mfqev2_restorer.py:14- + the MFQE
2.0 cascade)."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent
T_FRAMES = 6
H, W = 32, 48


@pytest.fixture
def fixture_root(tmp_path):
    rng = np.random.default_rng(0)
    sidecar = {"crf15": {}}
    for clip in ("000", "001"):
        png = tmp_path / "crf15" / "png" / clip
        mv = tmp_path / "crf15" / "mv" / clip
        gt = tmp_path / "sharp" / "png" / clip
        png.mkdir(parents=True)
        mv.mkdir(parents=True)
        gt.mkdir(parents=True)
        entries = {}
        for i in range(T_FRAMES):
            Image.fromarray(
                rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
            ).save(png / f"{i:08d}.png")
            Image.fromarray(
                rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
            ).save(gt / f"{i:08d}.png")
            np.save(mv / f"{i:08d}.npy", np.zeros((0, 10), np.float32))
            st = "I" if i == 0 else ("P" if i % 2 else "B")
            entries[str(i)] = {"QP": 22.0, "slice": st}
        sidecar["crf15"][clip] = entries
    (tmp_path / "qp.json").write_text(json.dumps(sidecar))
    return tmp_path


def _write_cfg(tmp_path, root):
    cfg = f"""
model = dict(
    type="MFQEv2Restorer",
    generator=dict(type="MFQEv2", in_channels=3, out_channels=3, nf=4),
    pixel_loss=dict(type="CharbonnierLoss", loss_weight=1.0),
)
test_cfg = dict(metrics=["PSNR", "SSIM"], crop_border=0)
data = dict(
    test=dict(
        type="SRFolderMultipleGTDataset",
        lq_folder=r"{root}/crf15/png",
        gt_folder=r"{root}/sharp/png",
        num_input_frames={T_FRAMES},
        scale=1,
        pipeline=[dict(
            type="LoadImageFromFileList_ipb",
            qp_slice_file=r"{root}/qp.json",
        )],
    ),
)
"""
    p = tmp_path / "mfqe_joint_test_cfg.py"
    p.write_text(cfg)
    return p


def test_mfqe_joint_cli(fixture_root, tmp_path, monkeypatch, capsys):
    sys.path.insert(0, str(REPO / "tools"))
    import test as test_cli

    cfg_path = _write_cfg(tmp_path, fixture_root)
    out_pkl = tmp_path / "joint_metrics.pkl"
    argv = [
        "test.py", str(cfg_path), "-",
        "--joint-pqf-config", str(cfg_path),
        "--joint-pqf-ckpt", "-",
        "--out", str(out_pkl),
    ]
    monkeypatch.setattr(sys, "argv", argv)
    test_cli.main()

    import pickle

    metrics = pickle.loads(out_pkl.read_bytes())
    assert set(metrics) >= {"PSNR", "SSIM"}
    assert np.isfinite(metrics["PSNR"]) and 0 < metrics["SSIM"] <= 1
    captured = capsys.readouterr().out
    assert "mfqe-joint" in captured
