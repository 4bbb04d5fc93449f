"""CycleGAN must train end-to-end from the CLI config path (VERDICT r2
weak #3: `type=CycleGAN` used to crash on `restorer.generator` before
reaching the dedicated train step)."""

import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture
def unpaired_root(tmp_path):
    rng = np.random.default_rng(0)
    for domain in ("trainA", "trainB"):
        d = tmp_path / "horse2zebra" / domain
        d.mkdir(parents=True)
        for i in range(3):
            img = rng.integers(0, 256, (20, 24, 3), dtype=np.uint8)
            Image.fromarray(img).save(d / f"{i}.png")
    return tmp_path / "horse2zebra"


def test_cyclegan_trains_from_cli(unpaired_root, tmp_path, monkeypatch):
    sys.path.insert(0, str(REPO / "tools"))
    import train as train_cli

    work = tmp_path / "work"
    argv = [
        "train.py",
        str(REPO / "configs" / "baselines" / "cyclegan_lsgan_resnet.py"),
        "--work-dir", str(work),
        "--total-iters", "2",
        "--seed", "0",
        "--cfg-options",
        f"data.train.dataroot={unpaired_root}",
        "data.train.crop_size=16",
        "model.generator.base_channels=8",
        "model.generator.num_blocks=1",
        "model.discriminator.base_channels=8",
        "model.discriminator.num_conv=1",
        "checkpoint_config.interval=2",
        "log_config.interval=1",
    ]
    monkeypatch.setattr(sys, "argv", argv)
    train_cli.main()

    # 4-network checkpoint written
    from pnp_vcve_tpu.core.checkpoint import CheckpointManager

    ckpt = CheckpointManager(work)
    assert ckpt.latest_step() == 2
    payload = ckpt.restore(2)
    assert set(payload) == {"generator_a", "generator_b", "disc_a", "disc_b"}
    leaves = [np.asarray(x) for x in __import__("jax").tree_util.tree_leaves(payload)]
    assert all(np.isfinite(v).all() for v in leaves)
    ckpt.close()
