"""Aux subsystem tests: EMA, visualization, profiling, extra datasets."""

import numpy as np
import jax.numpy as jnp
import pytest


def test_ema_update():
    from pnp_vcve_tpu.utils.ema import EmaState, ema_update

    p0 = {"w": jnp.ones((4,))}
    p1 = {"w": jnp.zeros((4,))}
    e = ema_update(p0, p1, momentum=0.9)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.9)

    st = EmaState(p0, momentum=0.5, interval=2)
    st.update(1, p1)  # not at interval -> unchanged
    np.testing.assert_allclose(np.asarray(st.params["w"]), 1.0)
    st.update(2, p1)
    np.testing.assert_allclose(np.asarray(st.params["w"]), 0.5)


def test_save_visualization(tmp_path):
    from pnp_vcve_tpu.utils.visualization import save_visualization

    rng = np.random.default_rng(0)
    outs = {
        "lq": rng.random((2, 3, 8, 8, 3)).astype(np.float32),
        "output": rng.random((2, 8, 8, 3)).astype(np.float32),
        "gt": rng.random((2, 8, 8, 3)).astype(np.float32),
    }
    path = save_visualization(outs, tmp_path, 100)
    assert path.exists()
    from PIL import Image

    img = np.asarray(Image.open(path))
    assert img.shape == (16, 24, 3)  # 2 rows x 3 cols of 8x8


def test_kitti_dataset(tmp_path):
    import json
    from PIL import Image
    from pnp_vcve_tpu.data.extra_datasets import KittiPairDataset

    rng = np.random.default_rng(0)
    sidecar = {"crf15": {}}
    for seq in ("000000", "000001"):
        lq = tmp_path / "crf15" / "png" / seq
        gt = tmp_path / "clean" / seq
        lq.mkdir(parents=True)
        gt.mkdir(parents=True)
        entries = {}
        for i in (10, 11):
            Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(
                lq / f"{i:02d}.png"
            )
            Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(
                gt / f"{i:02d}.png"
            )
            entries[str(i)] = {"QP": 25.0, "slice": "I" if i == 10 else "P"}
        sidecar["crf15"][seq] = entries
    (tmp_path / "qp.json").write_text(json.dumps(sidecar))

    ds = KittiPairDataset(
        lq_folder=str(tmp_path / "crf15" / "png"),
        gt_folder=str(tmp_path / "clean"),
        qp_slice_file=str(tmp_path / "qp.json"),
    )
    assert len(ds) == 2 and ds.base_qp == 15
    s = ds.load_clip(0)
    assert s["lq"].shape == (2, 32, 48, 3)
    assert s["mvs"].shape == (2, 32, 48, 4)
    assert list(s["slices"]) == [73.0, 80.0]


def test_vimeo_dataset(tmp_path):
    import json
    from PIL import Image
    from pnp_vcve_tpu.data.extra_datasets import VimeoMixDataset

    rng = np.random.default_rng(0)
    sidecar = {}
    for crf in (15, 25, 35):
        root = tmp_path / f"crf{crf}"
        png = root / "png" / "00001" / "0266"
        mv = root / "mv" / "00001" / "0266"
        png.mkdir(parents=True)
        mv.mkdir(parents=True)
        entries = {}
        for i in range(1, 8):
            Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(
                png / f"im{i}.png"
            )
            np.save(mv / f"{i - 1:08d}.npy", np.zeros((0, 10), np.float32))
            entries[str(i - 1)] = {"QP": 30.0, "slice": "I" if i == 1 else "P"}
        sidecar[f"crf{crf}"] = {"00001": {"0266": entries}}
    gtp = tmp_path / "sharp" / "png" / "00001" / "0266"
    gtp.mkdir(parents=True)
    for i in range(1, 8):
        Image.fromarray(rng.integers(0, 255, (32, 48, 3), dtype=np.uint8)).save(
            gtp / f"im{i}.png"
        )
    (tmp_path / "qp.json").write_text(json.dumps(sidecar))

    ds = VimeoMixDataset(
        lq_folder=str(tmp_path / "crf15" / "png"),
        gt_folder=str(tmp_path / "sharp" / "png"),
        cprs15_folder=str(tmp_path / "crf15" / "png"),
        cprs25_folder=str(tmp_path / "crf25" / "png"),
        cprs35_folder=str(tmp_path / "crf35" / "png"),
        qp_slice_file=str(tmp_path / "qp.json"),
        clips=["00001/0266"],
        gt_patch_size=16,
    )
    s = ds.sample(np.random.default_rng(1))
    assert s["lq"].shape == (7, 16, 16, 3)
    assert s["slices"][0] == 73.0
