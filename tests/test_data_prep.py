"""Data-prep tools (reference tools/data/** analogs) run end-to-end on
tiny synthetic inputs."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


def _run(script, *args):
    return subprocess.run(
        [sys.executable, str(REPO / "tools" / "data" / script), *map(str, args)],
        capture_output=True, text=True, timeout=300,
    )


def test_div2k_crop(tmp_path):
    rng = np.random.default_rng(0)
    src = tmp_path / "hr"
    src.mkdir()
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 256, (100, 130, 3), dtype=np.uint8)
        ).save(src / f"{i:04d}.png")
    out = tmp_path / "sub"
    r = _run("preprocess_div2k_dataset.py", src, out,
             "--crop-size", 64, "--step", 48, "--n-thread", 2)
    assert r.returncode == 0, r.stderr
    subs = list(out.glob("*.png"))
    assert len(subs) >= 8  # 2 images x >=4 crops
    assert Image.open(subs[0]).size == (64, 64)


def test_vimeo_keys(tmp_path):
    rng = np.random.default_rng(0)
    for key in ("00001/0266", "00001/0268"):
        d = tmp_path / "seq" / key
        d.mkdir(parents=True)
        for i in range(1, 8):
            Image.fromarray(
                rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
            ).save(d / f"im{i}.png")
    out = tmp_path / "keys.txt"
    r = _run("preprocess_vimeo90k_dataset.py", tmp_path / "seq", out)
    assert r.returncode == 0, r.stderr
    lines = out.read_text().splitlines()
    assert lines == ["00001/0266 (16,24,3)", "00001/0268 (16,24,3)"]


def test_comp1k_prep_composite(tmp_path):
    rng = np.random.default_rng(0)
    for sub in ("alpha", "fg", "bg"):
        (tmp_path / sub).mkdir()
    for i in range(2):
        Image.fromarray(
            (rng.random((20, 20)) * 255).astype(np.uint8)
        ).save(tmp_path / "alpha" / f"{i}.png")
        for sub in ("fg", "bg"):
            Image.fromarray(
                rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
            ).save(tmp_path / sub / f"{i}.png")
    r = _run("preprocess_comp1k_dataset.py", tmp_path, "--composite")
    assert r.returncode == 0, r.stderr
    infos = json.loads((tmp_path / "ann.json").read_text())
    assert len(infos) == 2 and "merged" in infos[0]
    assert (tmp_path / infos[0]["merged"]).exists()

    # the produced annotation drives AdobeComp1kDataset directly
    from pnp_vcve_tpu.data.matting_inpainting import AdobeComp1kDataset

    ds = AdobeComp1kDataset(
        ann_file=str(tmp_path / "ann.json"), data_prefix=str(tmp_path),
        crop_size=16,
    )
    s = ds.sample(np.random.default_rng(1))
    assert s["merged"].shape == (16, 16, 3)
