#!/usr/bin/env python
"""Evaluation entrypoint (CLI contract of reference tools/test.py:18-61).

The plug-and-play switch is ``--testdir_lr/--testdir_gt``: the same
checkpoint is pointed at different compressed folders (README.md:78-106).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def parse_args():
    p = argparse.ArgumentParser(description="Test a PnP-VCVE model (TPU)")
    p.add_argument("config", help="test config file path")
    p.add_argument("checkpoint", help="checkpoint dir (orbax) or '-' for random init")
    p.add_argument("--testdir_lr", type=str, default=None, help="override lq folder")
    p.add_argument("--testdir_gt", type=str, default=None, help="override gt folder")
    p.add_argument("--save-path", default=None, help="path to store enhanced frames")
    p.add_argument("--save-image", action="store_true", help="save enhanced frames")
    p.add_argument("--chunk-t", type=int, default=None, help="split clips into windows of N frames")
    p.add_argument(
        "--frame-parallel", choices=["exact"], default=None,
        help="'exact': chunked two-sweep pipeline over all local devices "
        "(numerically identical to the single-device scan)",
    )
    p.add_argument(
        "--stream-clips", type=int, default=1,
        help="with --frame-parallel exact: stream N same-shape clips "
        "through the pipeline at B/(B+D-1) utilization instead of paying "
        "the fill/drain bubble per clip (N bounds HBM: each device holds "
        "backward features for N in-flight clips)",
    )
    p.add_argument("--out", default=None, help="output result pickle")
    p.add_argument("--cfg-options", nargs="+", default=[])
    # cascade mode (reference tools/test.py:121-134): enhance, then feed the
    # enhanced frames to a second (VSR) model
    p.add_argument(
        "--joint-pqf-config", default=None,
        help="PQF model config: run the MFQE two-model joint protocol "
        "(PQFs enhanced first, non-PQFs reference the enhanced PQFs)",
    )
    p.add_argument("--joint-pqf-ckpt", default=None, help="PQF model checkpoint")
    p.add_argument("--cascade", action="store_true")
    p.add_argument("--cascade_config", default=None, help="config of the downstream VSR model")
    p.add_argument("--cascade_ckpt", default=None)
    p.add_argument("--launcher", default="none")
    p.add_argument("--local_rank", type=int, default=0)
    p.add_argument("--multihost", action="store_true", help="init jax.distributed; clips shard across processes")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.multihost:
        jax.distributed.initialize()

    from pnp_vcve_tpu.core.config import Config
    from pnp_vcve_tpu.core.builder import build_dataset, build_restorer
    from pnp_vcve_tpu.core.checkpoint import load_params
    from pnp_vcve_tpu.train.eval import evaluate_dataset

    cfg = Config.fromfile(args.config)
    if args.cfg_options:
        cfg.merge_from_options(dict(kv.split("=", 1) for kv in args.cfg_options))
    test_cfg = dict(cfg.data["test"])
    if args.testdir_lr:
        test_cfg["lq_folder"] = args.testdir_lr
    if args.testdir_gt:
        test_cfg["gt_folder"] = args.testdir_gt

    restorer = build_restorer(cfg.model, cfg.get("test_cfg"))
    dataset = build_dataset(test_cfg)

    import jax.numpy as jnp

    t = min(4, dataset.num_input_frames)
    dummy = dict(
        lrs=jnp.zeros((1, t, 64, 64, 3)),
        qps=jnp.zeros((1, t)),
        slices=jnp.full((1, t), 73.0),
        mvs=jnp.zeros((1, t, 64, 64, 4)),
        base_qps=jnp.zeros((1, t)),
        par_map=jnp.zeros((1, t, 64, 64, 3)),
    )
    variables = dict(restorer.generator.init(jax.random.PRNGKey(0), **dummy))
    params = variables["params"]
    if args.checkpoint != "-":
        params = load_params(args.checkpoint, template=jax.device_get(params))

    if args.joint_pqf_config:
        # MFQE two-model joint protocol (reference mfqev2_restorer.py:14-):
        # the main config/checkpoint is the NON-PQF model, --joint-pqf-*
        # the PQF model; PQFs are enhanced first from the decoded frames,
        # then non-PQFs reference the enhanced PQFs.
        from pnp_vcve_tpu.train.eval import evaluate_dataset_mfqe_joint

        pqf_cfg = Config.fromfile(args.joint_pqf_config)
        pqf_restorer = build_restorer(pqf_cfg.model, pqf_cfg.get("test_cfg"))
        pqf_vars = dict(
            pqf_restorer.generator.init(
                jax.random.PRNGKey(0), jnp.zeros((1, 3, 64, 64, 3))
            )
        )
        if args.joint_pqf_ckpt and args.joint_pqf_ckpt != "-":
            pqf_vars["params"] = load_params(
                args.joint_pqf_ckpt, template=jax.device_get(pqf_vars["params"])
            )
        metrics = evaluate_dataset_mfqe_joint(
            pqf_restorer.generator,
            pqf_vars,
            restorer.generator,
            {**variables, "params": params},
            dataset,
            restorer,
            save_path=args.save_path,
            save_image=args.save_image,
        )
        if metrics:
            print(", ".join(f"{k}: {v:.4f}" for k, v in metrics.items()))
        if args.out:
            import pickle

            with open(args.out, "wb") as f:
                pickle.dump(metrics, f)
        return

    cascade = None
    if args.cascade:
        from pnp_vcve_tpu.train.train_step import make_eval_step

        casc_cfg = Config.fromfile(args.cascade_config or args.config)
        casc_restorer = build_restorer(casc_cfg.model, casc_cfg.get("test_cfg"))
        tc = min(4, dataset.num_input_frames)
        casc_params = casc_restorer.generator.init(
            jax.random.PRNGKey(0), jnp.zeros((1, tc, 64, 64, 3))
        )["params"]
        if args.cascade_ckpt:
            from pnp_vcve_tpu.core.checkpoint import load_params as _lp

            casc_params = _lp(args.cascade_ckpt, template=jax.device_get(casc_params))
        casc_step = jax.jit(
            lambda p, lrs: casc_restorer.generator.apply({"params": p}, lrs)
        )
        cascade = (casc_step, casc_params, casc_restorer)

    metrics = evaluate_dataset(
        restorer,
        params,
        dataset,
        save_path=args.save_path,
        save_image=args.save_image,
        chunk_t=args.chunk_t,
        cascade=cascade,
        distributed=args.multihost,
        frame_parallel=args.frame_parallel,
        stream_clips=args.stream_clips,
    )
    if metrics:
        print(", ".join(f"{k}: {v:.4f}" for k, v in metrics.items()))
    if args.out:
        import pickle

        with open(args.out, "wb") as f:
            pickle.dump(metrics, f)


if __name__ == "__main__":
    main()
