"""Servable packaging + serving-handler drive (the analogs of the
reference's tools/deployment/{mmedit2torchserve,mmedit_handler,
test_torchserver}.py): package a tiny flagship, start the HTTP server,
POST an image, get the enhanced PNG back."""

import io
import json
import os
import sys
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.deployment.pnp2servable import pnp2servable
from tools.deployment.serving_handler import PnPServingHandler, serve_background

TINY_CFG = """
model = dict(
    type='BasicVSR',
    generator=dict(
        type='IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par',
        mid_channels=16, num_blocks=2, num_experts=3,
    ),
    pixel_loss=dict(type='CharbonnierLoss', loss_weight=1.0, reduction='mean'),
)
test_cfg = dict(metrics=['PSNR'])
data = dict(test=dict(type='SRFolderDataset', lq_folder='.', gt_folder='.',
                      scale=1))
"""


@pytest.fixture(scope="module")
def servable(tmp_path_factory):
    root = tmp_path_factory.mktemp("deploy")
    cfg = root / "tiny_cfg.py"
    cfg.write_text(TINY_CFG)
    return pnp2servable(str(cfg), "-", str(root / "store"),
                        model_name="tiny_pnp")


def test_packager_layout(servable):
    man = json.loads((servable / "MANIFEST.json").read_text())
    assert man["model"]["modelName"] == "tiny_pnp"
    assert man["model"]["serializedFile"] is None  # '-' = random init
    assert (servable / "config.py").is_file()


def test_packager_refuses_overwrite(tmp_path):
    cfg = tmp_path / "cfg.py"
    cfg.write_text(TINY_CFG)
    pnp2servable(str(cfg), "-", str(tmp_path / "store"), model_name="m")
    with pytest.raises(FileExistsError):
        pnp2servable(str(cfg), "-", str(tmp_path / "store"), model_name="m")
    out = pnp2servable(str(cfg), "-", str(tmp_path / "store"),
                       model_name="m", force=True)
    assert (out / "MANIFEST.json").is_file()


def test_handler_roundtrip(servable):
    from PIL import Image

    h = PnPServingHandler()
    h.initialize(servable)
    assert h.initialized and h.model_name == "tiny_pnp"

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (30, 46, 3), np.uint8)  # non-/4 sizes
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    png = h.handle(buf.getvalue())

    out = np.asarray(Image.open(io.BytesIO(png)))
    assert out.shape == img.shape and out.dtype == np.uint8

    srv, port = serve_background(h)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predictions/tiny_pnp",
            data=buf.getvalue(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.status == 200
            served = np.asarray(Image.open(io.BytesIO(r.read())))
        np.testing.assert_array_equal(served, out)

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/ping", timeout=10
        ) as r:
            assert json.loads(r.read())["status"] == "Healthy"

        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/predictions/nope",
                data=b"x", method="POST",
            ), timeout=10)
    finally:
        srv.shutdown()


def test_handler_loads_packaged_weights(tmp_path):
    """A servable with a real checkpoint restores those exact weights."""
    import jax
    import jax.numpy as jnp

    from pnp_vcve_tpu.core.builder import build_restorer
    from pnp_vcve_tpu.core.checkpoint import save_params
    from pnp_vcve_tpu.core.config import Config

    cfg_f = tmp_path / "cfg.py"
    cfg_f.write_text(TINY_CFG)
    cfg = Config.fromfile(str(cfg_f))
    gen = build_restorer(cfg.model, cfg.get("test_cfg")).generator
    dummy = PnPServingHandler._clip_inputs(jnp.zeros((1, 1, 64, 64, 3)))
    params = gen.init(jax.random.PRNGKey(7), **dummy)["params"]
    # perturb so the restore is distinguishable from random init
    params = jax.tree_util.tree_map(lambda x: x * 0 + 0.25, params)
    save_params(tmp_path / "ckpt", params)

    out = pnp2servable(str(cfg_f), str(tmp_path / "ckpt"),
                       str(tmp_path / "store"), model_name="w")
    h = PnPServingHandler()
    h.initialize(out)
    leaf = jax.tree_util.tree_leaves(h.variables["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf), 0.25)
