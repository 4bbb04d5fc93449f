"""Matting fg-extension + sub-image/bgm/df2k prep tools (analogs of
tools/data/matting/* and tools/data/super-resolution/{reds,df2k_ost}/*)."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pnp_vcve_tpu.data.foreground import estimate_foreground_ml

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools", "data")


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(TOOLS, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod  # crop_sub_images is imported by df2k prep
    spec.loader.exec_module(mod)
    return mod


def _smooth_field(rng, h, w, lo=0.2, hi=0.8):
    coarse = rng.random((4, 4, 3))
    from PIL import Image

    img = np.stack([
        np.asarray(Image.fromarray(
            (coarse[..., c] * 255).astype(np.uint8)
        ).resize((w, h), Image.BILINEAR), np.float64) / 255.0
        for c in range(3)
    ], axis=-1)
    return lo + (hi - lo) * img


def test_estimate_foreground_ml_recovers_foreground():
    rng = np.random.default_rng(0)
    h = w = 64
    F = _smooth_field(rng, h, w, 0.6, 0.9)
    B = _smooth_field(rng, h, w, 0.05, 0.3)
    yy, xx = np.mgrid[0:h, 0:w]
    # soft disk alpha
    r = np.hypot(yy - h / 2, xx - w / 2)
    alpha = np.clip((20.0 - r) / 8.0, 0.0, 1.0)
    img = alpha[..., None] * F + (1 - alpha[..., None]) * B

    Fe = estimate_foreground_ml(img, alpha)
    assert Fe.shape == F.shape
    # where alpha is solid the fg must match the composite's fg
    solid = alpha > 0.95
    assert np.abs(Fe - F)[solid].mean() < 0.02
    # near the boundary the estimate must still composite back to the image
    Fe2, Be = estimate_foreground_ml(img, alpha, return_background=True)
    recon = alpha[..., None] * Fe2 + (1 - alpha[..., None]) * Be
    assert np.abs(recon - img).mean() < 0.02


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


def test_extend_fg_tool(tmp_path):
    rng = np.random.default_rng(1)
    root = str(tmp_path)
    for i in range(2):
        _write_png(os.path.join(root, "fg", f"{i}.png"),
                   rng.integers(0, 255, (40, 40, 3), np.uint8))
        _write_png(os.path.join(root, "alpha", f"{i}.png"),
                   rng.integers(0, 255, (40, 40), np.uint8))
    mod = _load("extend_fg")
    sys.argv = ["extend_fg", root, "--nproc", "1"]
    mod.main()
    assert os.path.isfile(os.path.join(root, "fg_extended", "0.png"))
    infos = json.loads(
        open(os.path.join(root, "training_list_fba.json")).read()
    )
    assert len(infos) == 2 and "fg_extended" in infos[0]["fg_path"]

    # check tool runs over the triple layout
    chk = _load("check_extended_fg")
    mx, avg = chk.check_one(__import__("pathlib").Path(root), "0.png")
    assert np.isfinite(mx) and np.isfinite(avg)


def test_filter_comp1k_anno(tmp_path):
    mod = _load("filter_comp1k_anno")
    records = [
        {"alpha_path": "a/cat.png"},
        {"alpha_path": "a/dog.png"},
        {"alpha_path": "b/cat.png"},
    ]
    kept = mod.filter_anno(records, ["cat.png"])
    assert len(kept) == 2


def test_crop_sub_images_windows_and_tool(tmp_path):
    mod = _load("crop_sub_images")
    # reference semantics: trailing window appended when remainder > thresh
    assert mod.crop_windows(10, 10, 4, 4, 0) == [
        (x, y) for x in (0, 4, 6) for y in (0, 4, 6)
    ]
    assert mod.crop_windows(8, 8, 4, 4, 999) == [
        (x, y) for x in (0, 4) for y in (0, 4)
    ]

    rng = np.random.default_rng(2)
    _write_png(os.path.join(str(tmp_path), "in", "clip0", "f0.png"),
               rng.integers(0, 255, (12, 12, 3), np.uint8))
    out = os.path.join(str(tmp_path), "out")
    sys.argv = ["crop_sub_images", "--input-folder",
                os.path.join(str(tmp_path), "in"), "--save-folder", out,
                "--crop-size", "8", "--step", "4", "--n-thread", "1"]
    mod.main()
    subs = sorted(os.listdir(out))
    assert subs == [f"clip0_s{i:03d}" for i in range(1, 5)]
    from PIL import Image

    assert Image.open(os.path.join(out, subs[0], "f0.png")).size == (8, 8)


def test_bgm_prep(tmp_path):
    rng = np.random.default_rng(3)
    root = str(tmp_path)
    for i in range(1, 84):  # 83 frames -> 3 effective after the -80 quirk
        _write_png(os.path.join(root, "fixed-camera", "train", "v0",
                                f"{i:04d}_img.png"),
                   rng.integers(0, 255, (8, 8, 3), np.uint8))
    _write_png(os.path.join(root, "background", "bg0", "0001.png"),
               rng.integers(0, 255, (8, 8, 3), np.uint8))
    mod = _load("preprocess_bgm_dataset")
    infos = mod.generate_json(root)
    assert len(infos) == 3
    assert infos[0]["merged_path"].endswith("0001_img.png")
    assert infos[0]["seg_path"].endswith("0001_masksDL.png")
    assert infos[0]["bg_path"].endswith("v0.png")
    infos_all = mod.generate_json(root, all_data=True)
    assert len(infos_all) == 83


def test_df2k_ost_prep(tmp_path):
    rng = np.random.default_rng(4)
    root = os.path.join(str(tmp_path), "DF2K")
    _write_png(os.path.join(root, "img1.png"),
               rng.integers(0, 255, (12, 12, 3), np.uint8))
    mod = _load("preprocess_df2k_ost_dataset")
    sys.argv = ["prep", "--data-root", root, "--crop-size", "8",
                "--step", "4", "--n-thread", "1"]
    mod.main()
    sub = os.path.join(str(tmp_path), "DF2K_sub")
    names = sorted(os.listdir(sub))
    assert "img1_s001.png" in names and "meta_info.txt" in names
    meta = open(os.path.join(sub, "meta_info.txt")).read().splitlines()
    assert meta[0].startswith("img1_s001")
    with pytest.raises(ImportError):
        mod.make_lmdb(__import__("pathlib").Path(sub),
                      __import__("pathlib").Path(str(tmp_path)) / "x.lmdb")
