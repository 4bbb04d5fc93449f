#!/usr/bin/env python
"""Evaluate a SERIALIZED export over a test dataset (the analog of the
reference's tools/deploy_test.py:181, which scores ONNXRuntime/TensorRT
engines): metrics must come from the deployed artifact, not the live
model, so deployment regressions surface in PSNR/SSIM.

    python tools/deploy_test.py CONFIG model.stablehlo \\
        [--testdir_lr D] [--testdir_gt D] [--out out.pkl]

Clips are processed in windows matching the export's fixed (t, h, w);
spatially larger clips are center-cropped (the export protocol fixes the
serving resolution, like a TensorRT engine's static shapes).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("exported", help="serialized export from tools/export_model.py")
    p.add_argument("--testdir_lr", default=None)
    p.add_argument("--testdir_gt", default=None)
    p.add_argument("--out", default=None, help="metrics pickle")
    p.add_argument("--cfg-options", nargs="+", default=[])
    return p.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import export as jexport

    from pnp_vcve_tpu.core.builder import build_dataset
    from pnp_vcve_tpu.core.config import Config
    from pnp_vcve_tpu.metrics import tensor2img
    from pnp_vcve_tpu.metrics.quality import psnr, ssim
    from pnp_vcve_tpu.models.restorer import average_clip_metrics

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    test_cfg = dict(cfg.data["test"])
    if args.testdir_lr:
        test_cfg["lq_folder"] = args.testdir_lr
    if args.testdir_gt:
        test_cfg["gt_folder"] = args.testdir_gt
    dataset = build_dataset(test_cfg)

    exported = jexport.deserialize(Path(args.exported).read_bytes())
    # export input signature: lrs(1,t,h,w,3) qps slices mvs base_qps par_map
    t_e, h_e, w_e = (
        exported.in_avals[0].shape[1],
        exported.in_avals[0].shape[2],
        exported.in_avals[0].shape[3],
    )
    call = exported.call
    print(f"deployed artifact expects windows of (t={t_e}, h={h_e}, w={w_e})")

    per_clip = []
    for sample in dataset:
        t, h, w = sample["lq"].shape[:3]
        top = max(0, (h - h_e) // 2)
        left = max(0, (w - w_e) // 2)
        sl = np.s_[top : top + h_e, left : left + w_e]
        outs = []
        gts = []
        for s in range(0, t - t_e + 1, t_e):
            win = slice(s, s + t_e)
            out = call(
                jnp.asarray(sample["lq"][win][None][:, :, sl[0], sl[1]]),
                jnp.asarray(sample["qps"][win][None]),
                jnp.asarray(sample["slices"][win][None]),
                jnp.asarray(sample["mvs"][win][None][:, :, sl[0], sl[1]]),
                jnp.asarray(sample["base_qps"][win][None]),
                jnp.asarray(sample["partitions"][win][None][:, :, sl[0], sl[1]]),
            )
            outs.append(np.asarray(out[0]))
            gts.append(sample["gt"][win][:, sl[0], sl[1]])
        if not outs:
            continue
        out_clip = np.concatenate(outs, axis=0)
        gt_clip = np.concatenate(gts, axis=0)
        vals_p, vals_s = [], []
        for i in range(out_clip.shape[0]):
            a, b = tensor2img(out_clip[i]), tensor2img(gt_clip[i])
            vals_p.append(psnr(a, b, crop_border=0))
            vals_s.append(ssim(a, b, crop_border=0))
        metrics = {"PSNR": float(np.mean(vals_p)), "SSIM": float(np.mean(vals_s))}
        per_clip.append(metrics)
        name = sample.get("clip_name", f"clip{len(per_clip):03d}")
        print(f"[deploy-test] {name}: " +
              " ".join(f"{k}={v:.4f}" for k, v in metrics.items()))

    agg = average_clip_metrics(per_clip)
    if agg:
        print("[deploy-test] dataset mean: " +
              ", ".join(f"{k}: {v:.4f}" for k, v in agg.items()))
    if args.out:
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(agg, f)


if __name__ == "__main__":
    main()
