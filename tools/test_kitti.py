#!/usr/bin/env python
"""KITTI evaluation entrypoint (CLI contract of reference tools/test_kitti.py,
a copy of test.py pointed at the 2-frame KITTI pairs; enhanced pairs feed a
downstream optical-flow model).

Usage:
    python tools/test_kitti.py CONFIG CKPT --testdir_lr KITTI/crf15/png \
        --testdir_gt KITTI/clean --save-path out/
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def parse_args():
    p = argparse.ArgumentParser(description="Test on KITTI frame pairs")
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax checkpoint dir or '-' for random init")
    p.add_argument("--testdir_lr", required=True)
    p.add_argument("--testdir_gt", required=True)
    p.add_argument("--qp-slice-file", default=None)
    p.add_argument("--save-path", default=None)
    p.add_argument("--save-image", action="store_true")
    p.add_argument("--cfg-options", nargs="+", default=[])
    p.add_argument("--launcher", default="none")
    p.add_argument("--local_rank", type=int, default=0)
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    from pnp_vcve_tpu.core.config import Config
    from pnp_vcve_tpu.core.builder import build_restorer
    from pnp_vcve_tpu.core.checkpoint import load_params
    from pnp_vcve_tpu.data.extra_datasets import KittiPairDataset
    from pnp_vcve_tpu.train.eval import evaluate_dataset

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))

    restorer = build_restorer(cfg.model, cfg.get("test_cfg"))
    dataset = KittiPairDataset(
        lq_folder=args.testdir_lr,
        gt_folder=args.testdir_gt,
        qp_slice_file=args.qp_slice_file,
    )

    import jax.numpy as jnp

    t = 2
    dummy = dict(
        lrs=jnp.zeros((1, t, 64, 64, 3)),
        qps=jnp.zeros((1, t)),
        slices=jnp.full((1, t), 73.0),
        mvs=jnp.zeros((1, t, 64, 64, 4)),
        base_qps=jnp.zeros((1, t)),
        par_map=jnp.zeros((1, t, 64, 64, 3)),
    )
    params = restorer.generator.init(jax.random.PRNGKey(0), **dummy)["params"]
    if args.checkpoint != "-":
        params = load_params(args.checkpoint, template=jax.device_get(params))

    metrics = evaluate_dataset(
        restorer, params, dataset,
        save_path=args.save_path, save_image=args.save_image,
    )
    if metrics:
        print(", ".join(f"{k}: {v:.4f}" for k, v in metrics.items()))


if __name__ == "__main__":
    main()
