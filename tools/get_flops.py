#!/usr/bin/env python
"""Parameter / FLOP counter (reference tools/get_flops.py:23-60).

Uses XLA's own cost analysis of the compiled forward — exact for the whole
jitted graph, not a per-module estimate.

Usage: python tools/get_flops.py CONFIG [--shape T H W]
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
    p.add_argument("--shape", type=int, nargs=3, default=[3, 256, 256],
                   metavar=("T", "H", "W"))
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnp_vcve_tpu.core.config import Config
    from pnp_vcve_tpu.core.builder import build_restorer

    cfg = Config.fromfile(args.config)
    restorer = build_restorer(cfg.model, cfg.get("test_cfg"))
    model = restorer.generator

    t, h, w = args.shape
    inp = dict(
        lrs=jnp.zeros((1, t, h, w, 3)),
        qps=jnp.zeros((1, t)),
        slices=jnp.full((1, t), 73.0),
        mvs=jnp.zeros((1, t, h, w, 4)),
        base_qps=jnp.zeros((1, t)),
        par_map=jnp.zeros((1, t, h, w, 3)),
    )
    params = model.init(jax.random.PRNGKey(0), **inp)
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))

    lowered = jax.jit(lambda p, i: model.apply(p, **i)).lower(params, inp)
    compiled = lowered.compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    flops = analysis.get("flops", float("nan"))

    print(f"Input shape: (1, {t}, {h}, {w}, 3)")
    print(f"Params: {n_params / 1e6:.3f} M")
    print(f"FLOPs (XLA cost analysis, whole clip): {flops / 1e9:.2f} G")
    print(f"FLOPs per frame: {flops / t / 1e9:.2f} G")


if __name__ == "__main__":
    main()
