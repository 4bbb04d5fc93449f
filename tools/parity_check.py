#!/usr/bin/env python
"""Checkpoint-parity gate vs the released reference weights.

Takes a reference ``.pth`` checkpoint and a compressed-clip folder layout,
converts the weights (tools/convert_checkpoint.py machinery), runs the
enhancement eval, and asserts PSNR/SSIM against expected values (recorded
reference outputs) within a tolerance — the BASELINE.md bit-comparability
gate. When the assets are absent the gate SKIPS with a reason (exit 0,
message on stderr) so it can run unconditionally in CI and arms itself the
moment assets exist.

Usage:
  python tools/parity_check.py CONFIG CKPT_PTH \
      --testdir_lr D --testdir_gt D \
      [--expect-psnr X --expect-ssim Y --tol-psnr 0.05 --tol-ssim 0.001] \
      [--num-blocks 8] [--chunk-t N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def skip(reason: str):
    print(f"PARITY GATE SKIPPED: {reason}", file=sys.stderr)
    sys.exit(0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config")
    p.add_argument("checkpoint", help="reference .pth path")
    p.add_argument("--testdir_lr", required=True)
    p.add_argument("--testdir_gt", required=True)
    p.add_argument("--expect-psnr", type=float, default=None)
    p.add_argument("--expect-ssim", type=float, default=None)
    p.add_argument("--tol-psnr", type=float, default=0.05)
    p.add_argument("--tol-ssim", type=float, default=0.001)
    p.add_argument("--num-blocks", type=int, default=8)
    p.add_argument("--chunk-t", type=int, default=None)
    args = p.parse_args()

    if not Path(args.checkpoint).exists():
        skip(f"reference checkpoint not found: {args.checkpoint}")
    if not Path(args.testdir_lr).exists() or not Path(args.testdir_gt).exists():
        skip(f"test data not found: {args.testdir_lr} / {args.testdir_gt}")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from pnp_vcve_tpu.core.config import Config
    from pnp_vcve_tpu.core.builder import build_dataset, build_restorer
    from pnp_vcve_tpu.core.convert import convert_generator_state_dict
    from pnp_vcve_tpu.train.eval import evaluate_dataset

    cfg = Config.fromfile(args.config)
    test_cfg = dict(cfg.data["test"])
    test_cfg["lq_folder"] = args.testdir_lr
    test_cfg["gt_folder"] = args.testdir_gt

    restorer = build_restorer(cfg.model, cfg.get("test_cfg"))
    dataset = build_dataset(test_cfg)

    ckpt = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = convert_generator_state_dict(
        sd, num_blocks=args.num_blocks,
        vsr=bool(cfg.model.get("generator", {}).get("vsr", False)),
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)

    metrics = evaluate_dataset(
        restorer, params, dataset, chunk_t=args.chunk_t, verbose=True
    )
    print(", ".join(f"{k}: {v:.4f}" for k, v in metrics.items()))

    failures = []
    if args.expect_psnr is not None:
        d = abs(metrics["PSNR"] - args.expect_psnr)
        if d > args.tol_psnr:
            failures.append(f"PSNR {metrics['PSNR']:.4f} vs {args.expect_psnr} (|d|={d:.4f})")
    if args.expect_ssim is not None:
        d = abs(metrics["SSIM"] - args.expect_ssim)
        if d > args.tol_ssim:
            failures.append(f"SSIM {metrics['SSIM']:.4f} vs {args.expect_ssim} (|d|={d:.4f})")
    if failures:
        print("PARITY GATE FAILED: " + "; ".join(failures), file=sys.stderr)
        sys.exit(1)
    print("PARITY GATE PASSED" + (
        "" if args.expect_psnr is not None else " (no expected values given; metrics recorded above)"
    ))


if __name__ == "__main__":
    main()
