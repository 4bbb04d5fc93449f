"""Vimeo-90k dataset registrations: the mix / BD-mix / test variants must
be buildable from reference-shaped config dicts (reference
sr_vimeo90k_multiple_gt_compress_dataset.py:9-225)."""

import json

import numpy as np
import pytest
from PIL import Image

from pnp_vcve_tpu.core.builder import build_dataset

H, W = 32, 48


def _fixture(tmp_path, bd=False):
    rng = np.random.default_rng(0)
    prefix = "BD_" if bd else ""
    sidecar = {}
    for crf in (15, 25, 35):
        root = tmp_path / f"{prefix}crf{crf}"
        png = root / "png" / "00001" / "0266"
        mv = root / "mv" / "00001" / "0266"
        png.mkdir(parents=True, exist_ok=True)
        mv.mkdir(parents=True, exist_ok=True)
        entries = {}
        for i in range(1, 8):
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            ).save(png / f"im{i}.png")
            np.save(mv / f"{i - 1:08d}.npy", np.zeros((0, 10), np.float32))
            entries[str(i - 1)] = {"QP": 30.0, "slice": "I" if i == 1 else "P"}
        sidecar[f"crf{crf}"] = {"00001": {"0266": entries}}
    # uncompressed lq lives under <lq_folder>/png/<key>
    lq = tmp_path / "lq" / "png" / "00001" / "0266"
    gtp = tmp_path / "sharp" / "00001" / "0266"
    lq.mkdir(parents=True, exist_ok=True)
    gtp.mkdir(parents=True, exist_ok=True)
    for i in range(1, 8):
        for d in (lq, gtp):
            Image.fromarray(
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            ).save(d / f"im{i}.png")
    (tmp_path / "qp.json").write_text(json.dumps(sidecar))
    (tmp_path / "keys.txt").write_text("00001/0266 (256,448,3)\n")
    return tmp_path


def _mix_cfg(root, ds_type):
    return dict(
        type=ds_type,
        cprs_all_folder=str(root),
        lq_folder=str(root / "lq"),
        gt_folder=str(root / "sharp"),
        ann_file=str(root / "keys.txt"),
        scale=1,
        num_input_frames=7,
        pipeline=[
            dict(
                type="LoadImageFromFileList_Mix_Compress_ipb",
                qp_slice_file=str(root / "qp.json"),
                data_ratio=[0.0, 1.0, 1.0, 1.0],  # always crf15
            ),
            dict(type="PairedRandomCrop_mv", gt_patch_size=16),
        ],
    )


@pytest.mark.parametrize("bd", [False, True])
def test_vimeo_mix_and_bd_registered(tmp_path, bd):
    root = _fixture(tmp_path, bd=bd)
    ds_type = (
        "SRVimeo90KMultipleGTMixCompressDataset_BD"
        if bd
        else "SRVimeo90KMultipleGTMixCompressDataset"
    )
    ds = build_dataset(_mix_cfg(root, ds_type))
    s = ds.sample(np.random.default_rng(1))
    assert s["lq"].shape == (7, 16, 16, 3)
    assert s["base_qps"][0] == pytest.approx(15 / 255)
    # BD fixture has no plain crf folders: success proves the BD_ routing
    assert s["slices"][0] == 73.0


def test_vimeo_test_dataset_registered(tmp_path):
    root = _fixture(tmp_path)
    ds = build_dataset(
        dict(
            type="SRVimeo90KMultipleGTCompressDataset",
            cprs_folder=str(root / "crf15" / "png"),
            gt_folder=str(root / "sharp"),
            ann_file=str(root / "keys.txt"),
            scale=1,
            num_input_frames=7,
            pipeline=[
                dict(
                    type="LoadImageFromFileList_ipb",
                    qp_slice_file=str(root / "qp.json"),
                )
            ],
        )
    )
    assert len(ds) == 1
    clips = list(ds)
    assert clips[0]["lq"].shape == (7, H, W, 3)
    assert clips[0]["base_qps"][0] == pytest.approx(15 / 255)
    assert clips[0]["clip_name"] == "00001_0266"
