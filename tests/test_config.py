"""Config system + builder tests."""

import numpy as np
import pytest

from pnp_vcve_tpu.core.config import Config
from pnp_vcve_tpu.core.builder import build_restorer
from pnp_vcve_tpu.models import PnPVCVE
from pnp_vcve_tpu.models.restorer import Restorer


def test_fromfile_flagship_config():
    cfg = Config.fromfile("configs/HR_davis_LR_128x128.py")
    assert cfg.model["type"] == "BasicVSR"
    assert cfg.model["generator"]["num_experts"] == 6
    assert cfg.total_iters == 300000
    assert cfg.data["train_dataloader"]["weights"] == [1, 2, 1]
    assert len(cfg.data["train"]) == 3


def test_ipb_config_variants():
    cfg = Config.fromfile("configs/HR_davis_LR_128x128_IPB.py")
    assert cfg.exp_name == "HR_davis_LR_128x128_IPB"
    # inherited from base
    assert cfg.total_iters == 300000
    for ds in cfg.data["train"]:
        for stage in ds["dataset"]["pipeline"]:
            if stage["type"].startswith("LoadImageFromFileList_Mix"):
                assert stage["replace_qp_withIPB"] is True

    cfg_lr = Config.fromfile("configs/HR_davis_LR_128x128_IPB_LR_test.py")
    assert "REDS_test_LR" in cfg_lr.data["test"]["lq_folder"]
    base = Config.fromfile("configs/HR_davis_LR_128x128.py")
    for ds in base.data["train"]:
        for stage in ds["dataset"]["pipeline"]:
            if stage["type"].startswith("LoadImageFromFileList_Mix"):
                assert stage["replace_qp_withIPB"] is False


def test_cfg_options_merge():
    cfg = Config.fromfile("configs/HR_davis_LR_128x128.py")
    cfg.merge_from_options(
        {"model.generator.num_blocks": "4", "total_iters": "100", "lr_config.min_lr": "1e-6"}
    )
    assert cfg.model["generator"]["num_blocks"] == 4
    assert cfg.total_iters == 100
    assert cfg.lr_config["min_lr"] == pytest.approx(1e-6)


def test_base_inheritance(tmp_path):
    (tmp_path / "base.py").write_text("a = dict(x=1, y=2)\nb = 3\n")
    (tmp_path / "child.py").write_text("_base_ = ['base.py']\na = dict(y=5)\nc = 7\n")
    cfg = Config.fromfile(tmp_path / "child.py")
    assert cfg.a["x"] == 1 and cfg.a["y"] == 5
    assert cfg.b == 3 and cfg.c == 7


def test_build_restorer_from_reference_names():
    cfg = Config.fromfile("configs/HR_davis_LR_128x128.py")
    restorer = build_restorer(cfg.model, cfg.get("test_cfg"))
    assert isinstance(restorer, Restorer)
    gen = restorer.generator
    assert isinstance(gen, PnPVCVE)
    assert gen.num_blocks == 8 and gen.num_experts == 6
    assert gen.align_key and not gen.vsr
    assert restorer.pixel_loss == "CharbonnierLoss"
    assert restorer.test_cfg["metrics"] == ["PSNR", "SSIM"]


def test_evaluate_clip_protocol():
    r = Restorer(generator=None)
    rng = np.random.default_rng(0)
    gt = rng.random((3, 24, 24, 3)).astype(np.float32)
    out = np.clip(gt + rng.normal(0, 0.05, gt.shape).astype(np.float32), 0, 1)
    m = r.evaluate_clip(out, gt)
    assert set(m) == {"PSNR", "SSIM"}
    assert 15 < m["PSNR"] < 40
    assert 0.5 < m["SSIM"] <= 1.0
    perfect = r.evaluate_clip(gt, gt)
    assert perfect["PSNR"] == float("inf")
    assert perfect["SSIM"] == pytest.approx(1.0)


def test_builder_accepts_all_deform_types():
    """deform='vos'/'basic'/'fvc' all build (reference iconvsr_ipb.py:19-28);
    'stdf' raises like the reference."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import pytest

    from pnp_vcve_tpu.core.builder import BACKBONES

    rng = np.random.default_rng(0)
    b, t, h, w = 1, 2, 16, 16
    args = (
        jnp.asarray(rng.random((b, t, h, w, 3), np.float32)),
        jnp.asarray(rng.random((b, t), np.float32)),
        jnp.full((b, t), 73.0),
        jnp.asarray(rng.standard_normal((b, t, h, w, 4)).astype(np.float32)),
        jnp.full((b, t), 15.0 / 255.0),
        jnp.zeros((b, t, h, w, 3)),
    )
    for deform in ("vos", "basic", "fvc"):
        model = BACKBONES.build(
            dict(
                type="IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par",
                mid_channels=8, num_blocks=1, num_experts=2, deform=deform,
                deform_groups=2,
            )
        )
        params = model.init(jax.random.PRNGKey(0), *args)
        out = model.apply(params, *args)
        assert out.shape == (b, t, h, w, 3)
        assert np.isfinite(np.asarray(out)).all()
        if deform != "vos":
            flat = jax.tree_util.tree_flatten_with_path(params)[0]
            assert any("deform_align" in jax.tree_util.keystr(kp) for kp, _ in flat)

    with pytest.raises(NotImplementedError):
        BACKBONES.build(
            dict(
                type="IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par",
                deform="stdf",
            )
        )


def test_builder_tdan():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from pnp_vcve_tpu.core.builder import BACKBONES

    model = BACKBONES.build(dict(type="TDANNet", mid_channels=8,
                                 num_blocks_before_align=1, num_blocks_after_align=1))
    lrs = jnp.asarray(np.random.default_rng(0).random((1, 5, 16, 16, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), lrs)
    out = model.apply(params, lrs)
    assert out[0].shape if isinstance(out, tuple) else out.shape
