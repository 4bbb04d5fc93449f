#!/usr/bin/env python
"""MEASURED same-hardware comparison: the reference's actual torch code
vs this framework, both on CPU.

The A100 denominator in bench.py is an anchored estimate (no A100 here);
this tool produces a real measurement on identical hardware instead: the
reference's flagship generator (run through the tests/oracle mmcv shim —
its genuine Python-loop forward, iconvsr_ipb_par.py:44-149) against our
jitted JAX forward, same shapes, same CPU.

    python tools/bench_reference_cpu.py [--t 5] [--hw 256 448] [--iters 3]

Prints one JSON line with both frame rates and the ratio. This measures
IMPLEMENTATION efficiency (graph compilation + loop hoisting + fused
kernels vs eager torch with per-(batch,step) Python control flow); the
absolute numbers are CPU-bound and NOT comparable to the TPU bench.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force true CPU for jax BEFORE import (the host pins JAX_PLATFORMS=axon)
os.environ.setdefault("PNP_PLATFORM", "cpu")
from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=1, help="batch size; b>1 "
                   "amortizes the reference's per-(batch,step) Python loop "
                   "(iconvsr_ipb_par.py:71-147) differently than b=1")
    p.add_argument("--t", type=int, default=5)
    p.add_argument("--hw", type=int, nargs=2, default=(256, 448))
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--train", action="store_true",
                   help="time a full TRAIN step (forward + Charbonnier + "
                   "backward + Adam) instead of inference, reference "
                   "basicvsr.py:84-117 train_step vs our jitted "
                   "make_train_step — the reference-anchored training "
                   "throughput denominator")
    p.add_argument("--side", choices=["both", "ref", "ours"], default="both",
                   help="run only one side (each half of the --train "
                   "comparison can exceed a single-core wall budget; run "
                   "the sides as separate bounded invocations and combine "
                   "the printed fps)")
    args = p.parse_args()

    import numpy as np
    import torch

    from tests.oracle.loader import load_ref

    torch.manual_seed(0)
    b, t, (h, w) = args.b, args.t, args.hw
    rng = np.random.default_rng(0)

    mod = load_ref("mmedit.models.backbones.sr_backbones.iconvsr_ipb_par")
    ref = mod.IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par(
        mid_channels=64, num_blocks=8, num_experts=6, padding=3,
        with_cat=True, use_base_qp=True, expert_softmax=True,
        init_weight=True, with_bias=True, with_se=True, with_par=True,
        one_layer=True, blocktype="drt", channel_first=True,
        sparse_val=False, align_key=True, vsr=False,
    ).eval()

    lrs = torch.rand(b, t, 3, h, w)
    qps = torch.rand(b, t, 1, 1, 1)
    slices = torch.tensor([73.0] + [66.0, 80.0] * ((t - 1) // 2 + 1))[:t]
    slices = slices.view(1, t, 1, 1, 1).expand(b, t, 1, 1, 1).contiguous()
    mvs = torch.randn(b, t, 4, h, w) * 3
    base_qps = torch.rand(b, t, 1, 1, 1)
    par = torch.rand(b, t, 3, h, w)

    ref_fps = None
    gt = torch.rand(b, t, 3, h, w)
    if args.side == "ours":
        pass
    elif args.train:
        # reference train_step semantics (basicvsr.py:84-117): Charbonnier
        # pixel loss, Adam(2e-4) — one optimizer step per iteration
        ref = ref.train()
        opt = torch.optim.Adam(ref.parameters(), lr=2e-4)

        def ref_step():
            out = ref(lrs, qps, slices, mvs, base_qps, par)
            loss = torch.sqrt((out - gt) ** 2 + 1e-12).mean()
            opt.zero_grad(set_to_none=True)
            loss.backward()
            opt.step()

        ref_step()  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            ref_step()
        ref_fps = args.iters * b * t / (time.perf_counter() - t0)
    else:
        with torch.no_grad():
            ref(lrs, qps, slices, mvs, base_qps, par)  # warm
            t0 = time.perf_counter()
            for _ in range(args.iters):
                ref(lrs, qps, slices, mvs, base_qps, par)
            ref_fps = args.iters * b * t / (time.perf_counter() - t0)

    ours_fps = None
    metric = (
        "cpu_same_hardware_TRAIN_frames_per_sec"
        if args.train
        else "cpu_same_hardware_frames_per_sec"
    )
    if args.side == "ref":
        print(json.dumps({
            "metric": metric, "shape": [b, t, h, w],
            "reference_torch_fps": round(ref_fps, 4),
        }))
        return

    import jax
    import jax.numpy as jnp

    from pnp_vcve_tpu.models import PnPVCVE

    # padgather warp either way; remat=False for BOTH comparisons: the
    # reference does no activation checkpointing (basicvsr.py:84-117), so
    # the apples-to-apples train step is unremat too (remat is our
    # TPU-HBM capacity tradeoff, and its CPU-backend compile alone
    # exceeds a 29-minute wall budget on this host)
    model = PnPVCVE(remat=False)
    nhwc = lambda x: jnp.asarray(np.moveaxis(x.numpy(), 2, -1))  # noqa: E731
    flat = lambda x: jnp.asarray(x.numpy()[:, :, 0, 0, 0])  # noqa: E731
    inp = dict(
        lrs=nhwc(lrs), qps=flat(qps), slices=flat(slices), mvs=nhwc(mvs),
        base_qps=flat(base_qps), par_map=nhwc(par),
    )
    if args.train:
        import optax

        from pnp_vcve_tpu.train import create_train_state, make_train_step

        batch = dict(
            lq=inp["lrs"], gt=jnp.asarray(np.moveaxis(gt.numpy(), 2, -1)),
            qps=inp["qps"], slices=inp["slices"], mvs=inp["mvs"],
            base_qps=inp["base_qps"], partitions=inp["par_map"],
        )
        params = model.init(jax.random.PRNGKey(0), **inp)["params"]
        state = create_train_state(params, optax.adam(2e-4))
        step = make_train_step(model, donate=False)
        state, _ = step(state, batch)  # compile + warm
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, _ = step(state, batch)
        jax.block_until_ready(state.params)
        ours_fps = args.iters * b * t / (time.perf_counter() - t0)
    else:
        params = model.init(jax.random.PRNGKey(0), **inp)
        fwd = jax.jit(lambda p_, i_: model.apply(p_, **i_))
        jax.block_until_ready(fwd(params, inp))  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, inp)
        jax.block_until_ready(out)
        ours_fps = args.iters * b * t / (time.perf_counter() - t0)

    out = {"metric": metric, "shape": [b, t, h, w],
           "ours_jax_fps": round(ours_fps, 4)}
    if ref_fps is not None:
        out["reference_torch_fps"] = round(ref_fps, 4)
        out["speedup_same_hardware"] = round(ours_fps / ref_fps, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
