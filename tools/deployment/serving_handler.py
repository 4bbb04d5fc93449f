#!/usr/bin/env python
"""Serving handler + minimal inference server — the TPU-native analog of
the reference's tools/deployment/mmedit_handler.py:16-59 (a torchserve
BaseHandler) and its inference REST surface.

The handler loads a servable directory produced by
tools/deployment/pnp2servable.py, builds the generator from the packaged
config, restores the packaged weights, and serves the torchserve-shaped
endpoint:

    POST /predictions/<model-name>     body = PNG/JPEG image bytes
    -> 200, body = PNG image bytes (the enhanced frame)

Protocol: one image per request, matching the reference handler (its
``restoration_inference`` call is single-image, mmedit_handler.py:40-50).
Video models run the frame as a t=1 clip with neutral bitstream priors
(zero MVs, I-slice, mid QP) — the single-image serving contract; clip
serving goes through tools/test.py / deploy_test.py instead.

Usage:
    python tools/deployment/serving_handler.py SERVABLE_DIR [--port 8080]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from pnp_vcve_tpu.utils import apply_platform_override


class PnPServingHandler:
    """initialize/preprocess/inference/postprocess, shaped like the
    reference's MMEditHandler (mmedit_handler.py:16-59)."""

    def __init__(self):
        self.initialized = False

    def initialize(self, servable_dir: str | Path):
        import jax
        import jax.numpy as jnp

        from pnp_vcve_tpu.core.builder import build_restorer
        from pnp_vcve_tpu.core.checkpoint import load_params
        from pnp_vcve_tpu.core.config import Config

        root = Path(servable_dir)
        self.manifest = json.loads((root / "MANIFEST.json").read_text())
        self.model_name = self.manifest["model"]["modelName"]
        cfg = Config.fromfile(str(root / self.manifest["model"]["configFile"]))
        restorer = build_restorer(cfg.model, cfg.get("test_cfg"))
        self.generator = restorer.generator

        t, h, w = 1, 64, 64
        dummy = self._clip_inputs(jnp.zeros((1, t, h, w, 3)))
        try:
            variables = dict(
                self.generator.init(jax.random.PRNGKey(0), **dummy)
            )
            self._prior_protocol = True
        except TypeError:
            variables = dict(
                self.generator.init(jax.random.PRNGKey(0), dummy["lrs"])
            )
            self._prior_protocol = False
        params = variables["params"]
        serialized = self.manifest["model"].get("serializedFile")
        if serialized:
            params = load_params(
                root / serialized, template=jax.device_get(params)
            )
        variables["params"] = params
        self.variables = variables

        if self._prior_protocol:
            self._fwd = jax.jit(
                lambda v, i: self.generator.apply(v, **i)
            )
        else:
            self._fwd = jax.jit(
                lambda v, i: self.generator.apply(v, i["lrs"])
            )
        self.initialized = True

    @staticmethod
    def _clip_inputs(lrs):
        """Neutral bitstream priors for a decoded clip (I-slices, zero MVs,
        mid QP): the single-image serving contract."""
        import jax.numpy as jnp

        b, t, h, w, _ = lrs.shape
        return dict(
            lrs=lrs,
            qps=jnp.full((b, t), 30.0 / 51.0),
            slices=jnp.full((b, t), 73.0),  # ord('I')
            mvs=jnp.zeros((b, t, h, w, 4)),
            base_qps=jnp.full((b, t), 15.0 / 255.0),
            par_map=jnp.zeros((b, t, h, w, 3)),
        )

    def preprocess(self, body: bytes):
        import numpy as np
        from PIL import Image

        img = np.asarray(
            Image.open(io.BytesIO(body)).convert("RGB"), np.float32
        ) / 255.0
        return img[None, None]  # (1, 1, h, w, 3)

    def inference(self, lrs_np):
        import jax.numpy as jnp

        # models need /4-divisible input; pad reflectively and crop back
        b, t, h, w, _ = lrs_np.shape
        ph, pw = (4 - h % 4) % 4, (4 - w % 4) % 4
        lrs = jnp.asarray(lrs_np)
        if ph or pw:
            lrs = jnp.pad(
                lrs, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)),
                mode="reflect",
            )
        out = self._fwd(self.variables, self._clip_inputs(lrs))
        if out.ndim == 4:  # some restorers emit (b, h, w, 3) at t=1
            out = out[:, None]
        return out[:, :, : out.shape[2] - ph or None,
                   : out.shape[3] - pw or None]

    def postprocess(self, out) -> bytes:
        import numpy as np
        from PIL import Image

        from pnp_vcve_tpu.metrics import tensor2img

        u8 = tensor2img(np.asarray(out[0, 0], np.float32))
        buf = io.BytesIO()
        Image.fromarray(u8).save(buf, format="PNG")
        return buf.getvalue()

    def handle(self, body: bytes) -> bytes:
        return self.postprocess(self.inference(self.preprocess(body)))


def make_server(handler: PnPServingHandler, port: int = 8080):
    """torchserve-shaped inference API on stdlib http.server (the
    reference's test curl hits POST /predictions/<name>,
    tools/deployment/test_torchserver.py:20-27)."""

    class _H(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/ping":  # torchserve health endpoint
                payload = json.dumps({"status": "Healthy"}).encode()
                self.send_response(200)
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
            else:
                self.send_error(404)

        def do_POST(self):
            if self.path != f"/predictions/{handler.model_name}":
                self.send_error(404, "unknown model")
                return
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            try:
                png = handler.handle(body)
            except Exception as e:  # surface as a 500, keep serving
                self.send_error(500, str(e))
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(png)))
            self.end_headers()
            self.wfile.write(png)

        def log_message(self, *a):  # quiet
            pass

    return ThreadingHTTPServer(("127.0.0.1", port), _H)


def serve_background(handler: PnPServingHandler, port: int = 0):
    """Start the server on a daemon thread; returns (server, port)."""
    srv = make_server(handler, port)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("servable_dir")
    p.add_argument("--port", type=int, default=8080)
    args = p.parse_args()
    apply_platform_override()
    h = PnPServingHandler()
    h.initialize(args.servable_dir)
    srv = make_server(h, args.port)
    print(f"serving {h.model_name} on :{args.port} "
          f"(POST /predictions/{h.model_name})")
    srv.serve_forever()


if __name__ == "__main__":
    main()
