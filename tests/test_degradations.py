"""Degradation zoo tests (random_degradations.py / matlab_like_resize.py)."""

import os

import numpy as np
import pytest

from pnp_vcve_tpu.data.degradations import (
    DegradationsWithShuffle,
    RandomVideoCompression,
    anisotropic_gaussian_kernel2d,
    gaussian_kernel2d,
    has_av,
    jpeg_compression,
    matlab_like_resize,
    random_blur,
    random_noise,
    video_compression,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def img(rng):
    return rng.random((24, 32, 3)).astype(np.float32)


def test_gaussian_kernels_normalized():
    k = gaussian_kernel2d(7, 1.5)
    assert k.shape == (7, 7) and abs(k.sum() - 1) < 1e-6
    ka = anisotropic_gaussian_kernel2d(9, 2.0, 0.5, 0.7)
    assert ka.shape == (9, 9) and abs(ka.sum() - 1) < 1e-6
    # anisotropy: rotated kernel is not symmetric under transpose
    assert np.abs(ka - ka.T).max() > 1e-6


def test_random_blur_smooths(img, rng):
    out = random_blur(img, rng, kernel_size=(9,), sigma=(2.0, 2.0))
    assert out.shape == img.shape
    assert out.var() < img.var()


def test_matlab_resize_scales(img):
    down = matlab_like_resize(img, 0.5)
    assert down.shape == (12, 16, 3)
    up = matlab_like_resize(img, 2.0)
    assert up.shape == (48, 64, 3)
    assert abs(down.mean() - img.mean()) < 0.01
    # matches the NIQE half-size resize on 2D inputs
    from pnp_vcve_tpu.metrics.niqe import matlab_resize_half

    g = img[..., 0]
    np.testing.assert_allclose(
        matlab_like_resize(g[..., None], 0.5)[..., 0],
        matlab_resize_half(g.astype(np.float64)),
        atol=1e-5,
    )


def test_random_noise(img, rng):
    g = random_noise(img, rng, "gaussian", sigma=(10.0, 10.0))
    assert g.shape == img.shape and 0 <= g.min() and g.max() <= 1
    assert np.abs(g - img).mean() > 1e-3
    p = random_noise(img, rng, "poisson", sigma=(2.0, 2.0))
    assert p.shape == img.shape and np.isfinite(p).all()


def test_jpeg_roundtrip(img):
    lo = jpeg_compression(img, 10)
    hi = jpeg_compression(img, 95)
    assert lo.shape == img.shape
    # lower quality -> larger reconstruction error
    assert np.abs(lo - img).mean() > np.abs(hi - img).mean()


def test_degradations_with_shuffle(img, rng):
    pipe = DegradationsWithShuffle(
        [
            lambda im, r: random_blur(im, r, kernel_size=(7,)),
            lambda im, r: random_noise(im, r, "gaussian", sigma=(5.0, 5.0)),
        ],
        shuffle=True,
    )
    out = pipe(img, rng)
    assert out.shape == img.shape and np.isfinite(out).all()


# ---- SISR paired-image dataset modes ----------------------------------------


def _write_png(path, arr):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture
def sisr_root(tmp_path):
    rng = np.random.default_rng(0)
    root = str(tmp_path)
    for i in range(3):
        gt = rng.integers(0, 255, (32, 40, 3), np.uint8)
        lq = gt[::2, ::2]
        _write_png(os.path.join(root, "gt", f"{i:04d}.png"), gt)
        _write_png(os.path.join(root, "lq", f"{i:04d}_x2.png"), lq)
    with open(os.path.join(root, "ann.txt"), "w") as f:
        for i in range(3):
            f.write(f"{i:04d}.png (32,40,3)\n")
    return root


def test_sr_folder_dataset(sisr_root):
    from pnp_vcve_tpu.data.sisr_datasets import SRFolderDataset

    ds = SRFolderDataset(
        lq_folder=os.path.join(sisr_root, "lq"),
        gt_folder=os.path.join(sisr_root, "gt"),
        scale=2, filename_tmpl="{}_x2", gt_patch_size=16,
    )
    assert len(ds) == 3
    s = ds.sample(np.random.default_rng(1))
    assert s["lq"].shape == (8, 8, 3) or s["lq"].shape == (8, 8, 3)
    assert s["gt"].shape == (16, 16, 3)
    # test mode: whole frames, scale relationship holds
    ds_t = SRFolderDataset(
        lq_folder=os.path.join(sisr_root, "lq"),
        gt_folder=os.path.join(sisr_root, "gt"),
        scale=2, filename_tmpl="{}_x2", test_mode=True,
    )
    item = next(iter(ds_t))
    assert item["gt"].shape[0] == 2 * item["lq"].shape[0]


def test_sr_folder_dataset_missing_pair(sisr_root, tmp_path):
    from pnp_vcve_tpu.data.sisr_datasets import SRFolderDataset

    with pytest.raises((FileNotFoundError, ValueError)):
        SRFolderDataset(
            lq_folder=os.path.join(sisr_root, "lq"),
            gt_folder=os.path.join(sisr_root, "gt"),
            scale=2,  # default tmpl '{}' does not match the _x2 names
        )


def test_sr_annotation_dataset(sisr_root):
    from pnp_vcve_tpu.data.sisr_datasets import SRAnnotationDataset

    ds = SRAnnotationDataset(
        lq_folder=os.path.join(sisr_root, "lq"),
        gt_folder=os.path.join(sisr_root, "gt"),
        ann_file=os.path.join(sisr_root, "ann.txt"),
        scale=2, filename_tmpl="{}_x2", gt_patch_size=16,
    )
    assert len(ds) == 3
    s = ds.sample(np.random.default_rng(0))
    assert s["gt"].shape == (16, 16, 3)
    assert s["lq"].shape == (8, 8, 3)


def test_sr_folder_gt_dataset(sisr_root):
    from pnp_vcve_tpu.data.sisr_datasets import SRFolderGTDataset

    ds = SRFolderGTDataset(gt_folder=os.path.join(sisr_root, "gt"), gt_patch_size=24)
    s = ds.sample(np.random.default_rng(0))
    assert s["gt"].shape == (24, 24, 3)
    assert 0.0 <= s["gt"].min() and s["gt"].max() <= 1.0


def test_sisr_dataset_builders(sisr_root):
    from pnp_vcve_tpu.core.builder import build_dataset

    ds = build_dataset(dict(
        type="SRFolderDataset",
        lq_folder=os.path.join(sisr_root, "lq"),
        gt_folder=os.path.join(sisr_root, "gt"),
        scale=2, filename_tmpl="{}_x2",
        pipeline=[dict(type="PairedRandomCrop", gt_patch_size=16)],
    ))
    assert ds.gt_patch_size == 16
    ds2 = build_dataset(dict(
        type="SRAnnotationDataset",
        lq_folder=os.path.join(sisr_root, "lq"),
        gt_folder=os.path.join(sisr_root, "gt"),
        ann_file=os.path.join(sisr_root, "ann.txt"),
        scale=2, filename_tmpl="{}_x2",
    ))
    assert len(ds2) == 3


# ---- dataset prep tool (pure parsers) ---------------------------------------


def test_prepare_x264_log_parser():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "prep", os.path.join(os.path.dirname(__file__), "..", "tools",
                             "data", "prepare_compressed_dataset.py"))
    prep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prep)

    log = """
[libx264 @ 0x55] frame=   0 QP=20.85 NAL=3 Slice:I Poc:0   I:3600 P:0
[libx264 @ 0x55] frame=   1 QP=23.51 NAL=2 Slice:P Poc:2   I:12   P:3000
[libx264 @ 0x55] frame=   2 QP=24.00 NAL=2 Slice:B Poc:4   I:0    P:10
junk line
"""
    frames = prep.parse_x264_frame_log(log)
    assert frames == {0: (20.85, "I"), 1: (23.51, "P"), 2: (24.0, "B")}


def test_prepare_mv_record_layout():
    import importlib.util
    from types import SimpleNamespace

    spec = importlib.util.spec_from_file_location(
        "prep", os.path.join(os.path.dirname(__file__), "..", "tools",
                             "data", "prepare_compressed_dataset.py"))
    prep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prep)

    mv = SimpleNamespace(source=-1, w=16, h=8, src_x=24, src_y=12,
                         dst_x=40, dst_y=20, motion_x=-64, motion_y=32,
                         motion_scale=4)
    rec = prep.mv_records_from_sidedata([mv], "P")
    assert rec.shape == (1, 10)
    direction, w, h, x_w, y_w, x, y, mx, my, scale = rec[0]
    assert (direction, w, h) == (-1, 16, 8)
    assert (x_w, y_w) == (24 - 8, 12 - 4)  # center -> top-left corner
    assert (x, y) == (40 - 8, 20 - 4)
    assert (mx, my, scale) == (-64, 32, 4)
    # rasterizer accepts the rows directly
    from pnp_vcve_tpu.data.mv_raster import rasterize_clip

    mvs, par = rasterize_clip([rec], ["P"], 32, 64)
    assert mvs.shape == (1, 32, 64, 4)
    assert prep.mv_records_from_sidedata([], "I").shape == (0, 10)


def test_generation_unpaired_dataset(tmp_path):
    from pnp_vcve_tpu.core.builder import build_dataset

    rng = np.random.default_rng(0)
    for phase, n in (("trainA", 3), ("trainB", 2), ("testA", 2), ("testB", 2)):
        for i in range(n):
            _write_png(
                os.path.join(str(tmp_path), phase, f"{i}.png"),
                rng.integers(0, 255, (40, 40, 3), np.uint8),
            )
    ds = build_dataset(dict(
        type="GenerationUnpairedDataset", dataroot=str(tmp_path),
        crop_size=16,
    ))
    assert len(ds) == 3
    s = ds.sample(np.random.default_rng(1))
    assert s["img_a"].shape == (16, 16, 3)
    assert -1.0 <= s["img_a"].min() and s["img_a"].max() <= 1.0
    ds_t = build_dataset(dict(
        type="GenerationUnpairedDataset", dataroot=str(tmp_path),
        test_mode=True,
    ))
    items = list(ds_t)
    assert len(items) == 2 and items[0]["img_b"].shape == (40, 40, 3)


def test_video_compression_gate():
    """Without PyAV both entry points fail loudly at construction/call time
    (the reference asserts has_av the same way,
    random_degradations.py:420); with PyAV the round-trip must preserve
    shape and stay in [0, 1]."""
    clip = [np.random.default_rng(i).random((32, 48, 3), np.float32)
            for i in range(3)]
    if not has_av:
        with pytest.raises(RuntimeError):
            video_compression(clip, "libx264", 10000)
        with pytest.raises(RuntimeError):
            RandomVideoCompression(dict(codec=["libx264"], bitrate=[1e4, 1e5]))
        return
    out = RandomVideoCompression(dict(
        codec=["libx264"], codec_prob=[1.0], bitrate=[int(1e4), int(1e5)],
    ))(clip, np.random.default_rng(0))
    assert len(out) == len(clip)
    assert out[0].shape == clip[0].shape
    assert 0.0 <= min(o.min() for o in out) <= max(o.max() for o in out) <= 1.0
