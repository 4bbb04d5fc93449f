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

Fixture mode (the ARMED gate — assert path runs in CI with no external
assets, tests/test_parity_gate.py):

  python tools/parity_check.py --fixture [tests/fixtures/parity] \
      [--clips-limit N]

Recorded by tools/record_parity_fixture.py: full-flagship-shape
(mid=64, 8 blocks, K=6) torch-oracle outputs + PSNR/SSIM on the
deterministic synthetic compressed-clip dataset. This mode regenerates
the dataset from spec.json, converts the recorded state_dict through
core/convert.py, evaluates with the JAX model, and asserts per-clip
max|output diff|, PSNR and SSIM against the recording.
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


def run_fixture_gate(fixture_dir: str, clips_limit: int = 0,
                     tol_out: float = 2e-3, tol_psnr: float = 0.05,
                     tol_ssim: float = 0.001, tamper: bool = False) -> int:
    """The ARMED gate: assert converted-model outputs + metrics against the
    recorded full-flagship-shape torch-oracle fixture. Returns 0/1 (also
    usable in-process from tests). ``tamper`` perturbs one weight to prove
    the assert path fires."""
    import json as _json
    import tempfile

    import numpy as np

    fdir = Path(fixture_dir)
    for need in ("spec.json", "state_dict.npz", "expected.npz"):
        if not (fdir / need).exists():
            skip(f"fixture incomplete: {fdir / need} missing "
                 "(run tools/record_parity_fixture.py)")
    meta = _json.loads((fdir / "spec.json").read_text())
    spec = meta["spec"]

    import jax
    import jax.numpy as jnp

    from pnp_vcve_tpu.core.convert import convert_generator_state_dict
    from pnp_vcve_tpu.models import PnPVCVE
    from pnp_vcve_tpu.models.restorer import Restorer
    from pnp_vcve_tpu.train.eval import enhance_clip
    from pnp_vcve_tpu.train.train_step import make_eval_step
    from tools.record_parity_fixture import (
        build_dataset_from_spec, load_test_clips,
    )

    with np.load(fdir / "state_dict.npz") as z:
        sd = {k: z[k].astype(np.float32) for k in z.files}
    if tamper:
        # conv_last feeds the output directly — any converter/numerics
        # regression of this magnitude must trip the gate
        sd["conv_last.weight"] = sd["conv_last.weight"] + 0.05
    params = convert_generator_state_dict(sd, num_blocks=spec["num_blocks"])
    params = jax.tree_util.tree_map(jnp.asarray, params)

    model = PnPVCVE(
        mid_channels=spec["mid_channels"], num_blocks=spec["num_blocks"],
        num_experts=spec["num_experts"], remat=False,
    )
    restorer = Restorer(
        generator=model,
        test_cfg={"metrics": ["PSNR", "SSIM"], "crop_border": 0},
    )
    eval_step = make_eval_step(model)

    with tempfile.TemporaryDirectory() as root:
        build_dataset_from_spec(spec, root)
        samples = load_test_clips(spec, root)
    if clips_limit:
        samples = samples[:clips_limit]

    expected = np.load(fdir / "expected.npz")
    failures = []
    for sample in samples:
        name = sample["clip_name"]
        out = enhance_clip(eval_step, params, sample)
        want = expected[name].astype(np.float32)
        d = float(np.abs(out - want).max())
        m = restorer.evaluate_clip(out, sample["gt"])
        rm = meta["per_clip_metrics"][name]
        line = (f"{name}: max|out diff|={d:.2e} PSNR={m['PSNR']:.4f} "
                f"(rec {rm['PSNR']:.4f}) SSIM={m['SSIM']:.6f} "
                f"(rec {rm['SSIM']:.6f})")
        print(line)
        if d > tol_out:
            failures.append(f"{name}: output diff {d:.2e} > {tol_out}")
        if abs(m["PSNR"] - rm["PSNR"]) > tol_psnr:
            failures.append(f"{name}: PSNR |d|={abs(m['PSNR']-rm['PSNR']):.4f}")
        if abs(m["SSIM"] - rm["SSIM"]) > tol_ssim:
            failures.append(f"{name}: SSIM |d|={abs(m['SSIM']-rm['SSIM']):.6f}")
    if failures:
        print("PARITY GATE FAILED: " + "; ".join(failures), file=sys.stderr)
        return 1
    print(f"PARITY GATE PASSED (fixture: {len(samples)} clips, full "
          f"flagship shape mid={spec['mid_channels']} "
          f"nb={spec['num_blocks']} K={spec['num_experts']})")
    return 0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", nargs="?", default=None)
    p.add_argument("checkpoint", nargs="?", default=None,
                   help="reference .pth path")
    p.add_argument("--fixture", nargs="?", default=None,
                   const="tests/fixtures/parity",
                   help="run the armed fixture gate against this dir")
    p.add_argument("--clips-limit", type=int, default=0)
    p.add_argument("--tamper", action="store_true",
                   help="perturb one weight (gate must FAIL; self-test)")
    p.add_argument("--testdir_lr", default=None)
    p.add_argument("--testdir_gt", default=None)
    p.add_argument("--expect-psnr", type=float, default=None)
    p.add_argument("--expect-ssim", type=float, default=None)
    p.add_argument("--tol-psnr", type=float, default=0.05)
    p.add_argument("--tol-ssim", type=float, default=0.001)
    p.add_argument("--num-blocks", type=int, default=8)
    p.add_argument("--chunk-t", type=int, default=None)
    args = p.parse_args()

    if args.fixture:
        sys.exit(run_fixture_gate(
            args.fixture, clips_limit=args.clips_limit,
            tol_psnr=args.tol_psnr, tol_ssim=args.tol_ssim,
            tamper=args.tamper,
        ))
    if not args.config or not args.checkpoint:
        p.error("CONFIG and CKPT_PTH required (or use --fixture)")
    if not args.testdir_lr or not args.testdir_gt:
        p.error("--testdir_lr/--testdir_gt required (or use --fixture)")
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
