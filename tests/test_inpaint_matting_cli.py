"""End-to-end CLI training for the inpaintor and mattor families
(VERDICT r2 missing #8: models existed but could not be driven from a
config): tiny synthetic fixtures -> tools/train.py -> checkpoints."""

import json
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def inpaint_root(tmp_path):
    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    names = []
    for i in range(3):
        name = f"{i}.png"
        Image.fromarray(
            rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
        ).save(img_dir / name)
        names.append(name)
    (tmp_path / "ann.txt").write_text("\n".join(names) + "\n")
    return tmp_path


@pytest.fixture
def comp1k_root(tmp_path):
    rng = np.random.default_rng(1)
    for sub in ("alpha", "fg", "bg"):
        (tmp_path / sub).mkdir()
    infos = []
    for i in range(2):
        a = np.zeros((48, 48), np.uint8)
        a[12:36, 12:36] = 255
        Image.fromarray(a).save(tmp_path / "alpha" / f"{i}.png")
        for sub in ("fg", "bg"):
            Image.fromarray(
                rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
            ).save(tmp_path / sub / f"{i}.png")
        infos.append(
            {"alpha": f"alpha/{i}.png", "fg": f"fg/{i}.png", "bg": f"bg/{i}.png"}
        )
    (tmp_path / "ann.json").write_text(json.dumps(infos))
    return tmp_path


def _write_cfg(tmp_path, body, name):
    p = tmp_path / name
    p.write_text(body)
    return p


def _run_train(monkeypatch, cfg_path, work):
    sys.path.insert(0, str(REPO / "tools"))
    import importlib

    import train as train_cli
    importlib.reload(train_cli)
    monkeypatch.setattr(
        sys, "argv",
        ["train.py", str(cfg_path), "--work-dir", str(work),
         "--total-iters", "2", "--seed", "0"],
    )
    train_cli.main()


def test_gl_inpaintor_trains_from_cli(inpaint_root, tmp_path, monkeypatch):
    cfg = _write_cfg(tmp_path, f"""
model = dict(
    type="GLInpaintor",
    encdec=dict(type="GLEncoderDecoder"),
    disc=dict(type="MultiLayerDiscriminator", in_channels=3, max_channels=32,
              num_convs=2, with_input_norm=False, with_out_convs=True),
    loss_gan=dict(type="GANLoss", gan_type="vanilla", loss_weight=0.001),
    loss_l1_hole=dict(type="L1Loss", loss_weight=1.0),
    loss_l1_valid=dict(type="L1Loss", loss_weight=1.0),
)
data = dict(
    train_dataloader=dict(samples_per_gpu=1),
    train=dict(
        type="ImgInpaintingDataset",
        ann_file=r"{inpaint_root}/ann.txt",
        data_prefix=r"{inpaint_root}/imgs",
        pipeline=[dict(type="LoadMask", mask_mode="bbox",
                       mask_config=dict(max_bbox_shape=8, max_bbox_delta=2,
                                        min_margin=2)),
                  dict(type="RandomResizedCrop", crop_size=32)],
    ),
)
optimizers = dict(generator=dict(type="Adam", lr=1e-4))
lr_config = None
total_iters = 2
checkpoint_config = dict(interval=2)
log_config = dict(interval=1)
""", "gl_cfg.py")
    work = tmp_path / "work_gl"
    _run_train(monkeypatch, cfg, work)

    from pnp_vcve_tpu.core.checkpoint import CheckpointManager

    ckpt = CheckpointManager(work)
    assert ckpt.latest_step() == 2
    payload = ckpt.restore(2)
    assert "generator" in payload and "disc" in payload
    ckpt.close()


def test_dim_mattor_trains_from_cli(comp1k_root, tmp_path, monkeypatch):
    cfg = _write_cfg(tmp_path, f"""
model = dict(
    type="DIM",
    backbone=dict(type="DIMMattor", in_channels=4),
    loss_alpha=dict(type="CharbonnierLoss", loss_weight=1.0),
    loss_comp=dict(type="CharbonnierCompLoss", loss_weight=0.5),
)
data = dict(
    train_dataloader=dict(samples_per_gpu=1),
    train=dict(
        type="AdobeComp1kDataset",
        ann_file=r"{comp1k_root}/ann.json",
        data_prefix=r"{comp1k_root}",
        pipeline=[dict(type="CropAroundUnknown", crop_size=32)],
    ),
)
optimizers = dict(generator=dict(type="Adam", lr=1e-4))
lr_config = None
total_iters = 2
checkpoint_config = dict(interval=2)
log_config = dict(interval=1)
""", "dim_cfg.py")
    work = tmp_path / "work_dim"
    _run_train(monkeypatch, cfg, work)

    from pnp_vcve_tpu.core.checkpoint import CheckpointManager

    ckpt = CheckpointManager(work)
    assert ckpt.latest_step() == 2
    assert "params" in ckpt.restore(2)
    ckpt.close()


def test_aot_inpaintor_trains_from_cli(inpaint_root, tmp_path, monkeypatch):
    cfg = _write_cfg(tmp_path, f"""
model = dict(
    type="AOTInpaintor",
    encdec=dict(type="AOTEncoderDecoder", mid_channels=8, neck_channels=16,
                num_aotblock=1),
    disc=None,
    loss_l1_hole=dict(type="L1Loss", loss_weight=1.0),
    loss_l1_valid=dict(type="L1Loss", loss_weight=1.0),
)
data = dict(
    train_dataloader=dict(samples_per_gpu=1),
    train=dict(
        type="ImgInpaintingDataset",
        ann_file=r"{inpaint_root}/ann.txt",
        data_prefix=r"{inpaint_root}/imgs",
        pipeline=[dict(type="LoadMask", mask_mode="ff",
                       mask_config=dict(brush_width=(4, 8))),
                  dict(type="RandomResizedCrop", crop_size=32)],
    ),
)
optimizers = dict(generator=dict(type="Adam", lr=1e-4))
lr_config = None
total_iters = 2
checkpoint_config = dict(interval=2)
log_config = dict(interval=1)
""", "aot_cfg.py")
    work = tmp_path / "work_aot"
    _run_train(monkeypatch, cfg, work)

    from pnp_vcve_tpu.core.checkpoint import CheckpointManager

    ckpt = CheckpointManager(work)
    assert ckpt.latest_step() == 2
    ckpt.close()


def test_datasets_sample_shapes(inpaint_root, comp1k_root):
    from pnp_vcve_tpu.core.builder import build_dataset

    rng = np.random.default_rng(0)
    ds = build_dataset(dict(
        type="ImgInpaintingDataset", ann_file=str(inpaint_root / "ann.txt"),
        data_prefix=str(inpaint_root / "imgs"),
        pipeline=[dict(type="LoadMask", mask_mode="irregular",
                       mask_config=dict()),
                  dict(type="RandomResizedCrop", crop_size=32)],
    ))
    s = ds.sample(rng)
    assert s["gt_img"].shape == (32, 32, 3)
    assert s["mask"].shape == (32, 32, 1)
    assert set(np.unique(s["mask"])) <= {0.0, 1.0}
    # masked region is zeroed in [-1,1] space
    np.testing.assert_allclose(
        s["masked_img"] * s["mask"], 0.0, atol=1e-6
    )

    ds2 = build_dataset(dict(
        type="AdobeComp1kDataset", ann_file=str(comp1k_root / "ann.json"),
        data_prefix=str(comp1k_root),
        pipeline=[dict(type="CropAroundUnknown", crop_size=32)],
    ))
    m = ds2.sample(rng)
    assert m["merged"].shape == (32, 32, 3)
    assert m["trimap_onehot"].shape == (32, 32, 3)
    assert m["alpha"].shape == (32, 32, 1)
    # online composite: merged == alpha*fg + (1-alpha)*bg
    np.testing.assert_allclose(
        m["merged"], m["alpha"] * m["fg"] + (1 - m["alpha"]) * m["bg"],
        atol=1e-5,
    )
