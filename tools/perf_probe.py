#!/usr/bin/env python
"""Capture an xplane trace of the flagship bench loop and print a per-op
time breakdown (the reference's only probe is a wall-clock print,
mmedit/models/restorers/basicvsr.py:176-182; this is the TPU-native
replacement for finding where a frame's millisecond budget actually goes).

Usage:
  python tools/perf_probe.py [--pallas] [--blocks N] [--t N] [--iters N]
  python tools/perf_probe.py --parse <logdir>   # re-parse an existing trace
"""

import argparse
import collections
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xspace(logdir):
    """Print self-time per HLO op category from the TPU plane of an xspace."""
    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:  # TF >= 2.16 moved it under tsl
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        print(f"no xplane.pb under {logdir}")
        return
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        stats_meta = {k: v.name for k, v in plane.stat_metadata.items()}
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        per_op = collections.Counter()
        per_op_count = collections.Counter()
        total_ps = 0
        for line in plane.lines:
            lname = line.name
            # XLA op lines carry per-HLO events; step lines / async are skipped
            if "XLA Op" not in lname and "xla" not in lname.lower() and "Ops" not in lname:
                continue
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps
                per_op_count[name] += 1
                total_ps += ev.duration_ps
        if not per_op:
            # fall back: aggregate every line
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                    per_op[name] += ev.duration_ps
                    per_op_count[name] += 1
                    total_ps += ev.duration_ps
        print(f"\n=== plane: {plane.name}  lines: {len(plane.lines)} "
              f"total: {total_ps/1e9:.3f} ms ===")
        # group by op "family": strip trailing .N / fusion numbering
        fam = collections.Counter()
        for name, ps in per_op.items():
            base = name.split(".")[0]
            fam[base] += ps
        for name, ps in fam.most_common(40):
            print(f"{ps/1e9:10.3f} ms  {name}")
        print("--- top individual ops ---")
        for name, ps in per_op.most_common(25):
            print(f"{ps/1e9:10.3f} ms  x{per_op_count[name]:<5d} {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--parse", default=None, help="parse an existing trace dir")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--warp", default="block8", help="padgather|blockgather|block8")
    ap.add_argument("--blocks", type=int, default=8)
    ap.add_argument("--t", type=int, default=12)
    ap.add_argument("--hw", type=int, nargs=2, default=(720, 1280))
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--logdir", default="/tmp/pnp_trace")
    args = ap.parse_args()

    if args.parse:
        parse_xspace(args.parse)
        return

    from pnp_vcve_tpu.utils import apply_platform_override

    apply_platform_override()
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    from pnp_vcve_tpu.models import PnPVCVE

    h, w = args.hw
    b, t = 1, args.t
    model = PnPVCVE(
        remat=False,
        feature_dtype=jnp.bfloat16,
        use_pallas_kernels=args.pallas,
        num_blocks=args.blocks,
        warp_impl=args.warp,
    )
    inputs = bench.make_inputs(b, t, h, w, dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), **inputs)

    def chained(p, i):
        def body(_, lrs):
            return model.apply(p, **dict(i, lrs=lrs)).astype(i["lrs"].dtype)

        final = jax.lax.fori_loop(0, args.iters, body, i["lrs"])
        return jnp.sum(final.astype(jnp.float32))

    fwd = jax.jit(chained)
    t0 = time.perf_counter()
    float(fwd(params, inputs))  # compile + warmup
    print(f"compile+warmup: {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    float(fwd(params, inputs))
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "ms_per_frame": round(1e3 * dt / (args.iters * b * t), 3),
                "frames_per_sec": round(args.iters * b * t / dt, 3),
            }
        ),
        flush=True,
    )

    os.makedirs(args.logdir, exist_ok=True)
    jax.profiler.start_trace(args.logdir)
    float(fwd(params, inputs))
    jax.profiler.stop_trace()
    print(f"trace written to {args.logdir}", flush=True)
    parse_xspace(args.logdir)


if __name__ == "__main__":
    main()
