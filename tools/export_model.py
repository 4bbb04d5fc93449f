#!/usr/bin/env python
"""Export the eval forward as StableHLO (deployment parity with the
reference's pytorch2onnx.py / onnx2tensorrt.py chain — tools/pytorch2onnx.py,
mmedit/core/export/wrappers.py; the TPU-native serving format is a
serialized jax.export artifact that any PJRT runtime can load).

Usage:
    python tools/export_model.py CONFIG CKPT out.stablehlo --shape T H W
    # '-' as CKPT exports with random init (graph-only export)

The exported artifact is verified by round-tripping: deserialize, run, and
compare against the eager forward (the reference's --verify flag).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint")
    p.add_argument("out", help="output file for the serialized export")
    p.add_argument("--shape", type=int, nargs=3, default=[3, 128, 128],
                   metavar=("T", "H", "W"))
    p.add_argument("--verify", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from pnp_vcve_tpu.core.config import Config
    from pnp_vcve_tpu.core.builder import build_restorer
    from pnp_vcve_tpu.core.checkpoint import load_params

    cfg = Config.fromfile(args.config)
    restorer = build_restorer(cfg.model, cfg.get("test_cfg"))
    model = restorer.generator

    t, h, w = args.shape
    example = dict(
        lrs=jnp.zeros((1, t, h, w, 3)),
        qps=jnp.zeros((1, t)),
        slices=jnp.full((1, t), 73.0),
        mvs=jnp.zeros((1, t, h, w, 4)),
        base_qps=jnp.zeros((1, t)),
        par_map=jnp.zeros((1, t, h, w, 3)),
    )
    params = model.init(jax.random.PRNGKey(0), **example)["params"]
    if args.checkpoint != "-":
        params = load_params(args.checkpoint, template=jax.device_get(params))

    def fwd(lrs, qps, slices, mvs, base_qps, par_map):
        return model.apply({"params": params}, lrs, qps, slices, mvs,
                           base_qps, par_map)

    args_flat = tuple(example.values())
    exported = jexport.export(jax.jit(fwd))(*args_flat)
    blob = exported.serialize()
    Path(args.out).write_bytes(blob)
    print(f"exported {len(blob) / 1e6:.2f} MB StableHLO -> {args.out}")

    if args.verify:
        rehydrated = jexport.deserialize(Path(args.out).read_bytes())
        rng = np.random.default_rng(0)
        test = dict(example)
        test["lrs"] = jnp.asarray(rng.random((1, t, h, w, 3), np.float32))
        got = rehydrated.call(*tuple(test.values()))
        want = fwd(*tuple(test.values()))
        err = float(jnp.max(jnp.abs(got - want)))
        print(f"verify: max abs diff vs eager = {err:.2e}")
        assert err < 1e-4, "export verification failed"


if __name__ == "__main__":
    main()
