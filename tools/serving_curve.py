#!/usr/bin/env python
"""Latency/throughput curve for batched serving (docs/serving_contract.md).

For b = 1..B, time the PF-resident serving forward on b concurrent
720p clips (the batch the StreamScheduler dispatches,
pnp_vcve_tpu/serving.py): per-dispatch latency (= per-clip latency at
that batch) and aggregate frames/sec. Timing chains K forwards inside one
jit (bench.py methodology — per-call wall probes through the tunnel are
untrustworthy).

    python tools/serving_curve.py [--max-b 4] [--t 12] [--iters 4]

Prints one JSON line per batch size + a markdown table for the doc.
OOM at some b is reported as the HBM bound rather than crashing the
sweep.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--max-b", type=int, default=4)
    p.add_argument("--t", type=int, default=12)
    p.add_argument("--hw", type=int, nargs=2, default=(720, 1280))
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--warp", default="pf")
    args = p.parse_args()

    sys.path.insert(0, str(REPO))
    import bench  # reuse make_inputs

    from pnp_vcve_tpu.models import PnPVCVE

    t, (h, w) = args.t, args.hw
    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        t, (h, w) = 4, (64, 96)

    model = PnPVCVE(
        remat=False, feature_dtype=jnp.bfloat16,
        use_pallas_kernels=on_tpu, warp_impl=args.warp if on_tpu else "block8",
    )
    rows = []
    params = None
    for b in range(1, args.max_b + 1):
        inputs = bench.make_inputs(b, t, h, w, dtype=jnp.bfloat16)
        try:
            if params is None:
                params = model.init(jax.random.PRNGKey(0), **inputs)
            k = args.iters

            def chained(p_, i_):
                def body(_, lrs):
                    out = model.apply(p_, **{**i_, "lrs": lrs})
                    # feed outputs back as next inputs: keeps all K
                    # forwards on-device with no host round trip
                    return jnp.clip(out, 0.0, 1.0).astype(i_["lrs"].dtype)

                final = jax.lax.fori_loop(0, k, body, i_["lrs"])
                return jnp.sum(final.astype(jnp.float32))

            fwd = jax.jit(chained)
            float(fwd(params, inputs))  # compile + warm
            t0 = time.perf_counter()
            float(fwd(params, inputs))
            per_dispatch = (time.perf_counter() - t0) / k
            row = dict(
                b=b, t=t, h=h, w=w,
                dispatch_latency_s=round(per_dispatch, 4),
                per_clip_latency_s=round(per_dispatch, 4),
                latency_ms_per_frame=round(per_dispatch / t * 1e3, 2),
                aggregate_fps=round(b * t / per_dispatch, 2),
            )
        except Exception as e:  # OOM etc: record the bound
            msg = str(e)
            row = dict(b=b, error=(msg[:200] + "...") if len(msg) > 200
                       else msg)
            if "RESOURCE_EXHAUSTED" not in msg and "memory" not in msg.lower():
                raise
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| b | dispatch latency (s) | ms/frame | aggregate f/s |")
    print("|---|---|---|---|")
    for r in rows:
        if "error" in r:
            print(f"| {r['b']} | OOM (HBM bound) | — | — |")
        else:
            print(f"| {r['b']} | {r['dispatch_latency_s']} | "
                  f"{r['latency_ms_per_frame']} | {r['aggregate_fps']} |")


if __name__ == "__main__":
    main()
