#!/usr/bin/env python
"""dp-scaling sanity check for the train step on a virtual CPU mesh.

Real multi-chip hardware is not reachable here, so this cannot measure
true dp speedup; what it CAN measure is the OVERHEAD the dp sharding
adds: on an n-device virtual CPU mesh backed by one host, the devices
share the same cores, so a perfectly-overhead-free dp=n step on global
batch n*b should cost ~n x the dp=1 step on batch b. The reported
``dp_overhead_factor`` = t(dp=n, batch n*b) / (n * t(dp=1, batch b))
isolates what the mesh adds: gradient psums, replicated-param
bookkeeping, sharded-batch layout. ~1.0 means the dp path is free of
incidental cost; >>1 would flag a sharding bug (e.g. accidentally
replicated compute).

    python tools/bench_train_dp.py [--n 4] [--b 1] [--t 3] [--hw 32 64]

Self-provisions a forced n-device CPU mesh in a subprocess (same
mechanism as __graft_entry__.dryrun_multichip). Prints one JSON line.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _child(n, b, t, h, w, iters):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import optax

    sys.path.insert(0, REPO)
    from __graft_entry__ import _dummy_batch, _flagship
    from pnp_vcve_tpu.parallel.sharding import (
        batch_sharding, make_mesh, replicated,
    )
    from pnp_vcve_tpu.train import create_train_state, make_train_step
    from pnp_vcve_tpu.train.losses import charbonnier_loss

    model = _flagship(tiny=True)

    def timed(devices, batch_b):
        mesh = make_mesh(sp=1, devices=devices)
        batch = _dummy_batch(batch_b, t, h, w, with_gt=True)
        args = (
            batch["lq"], batch["qps"], batch["slices"],
            batch["mvs"], batch["base_qps"], batch["partitions"],
        )
        params = model.init(jax.random.PRNGKey(0), *args)["params"]
        state = jax.device_put(
            create_train_state(params, optax.adam(1e-4)), replicated(mesh)
        )
        batch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim))
            for k, v in batch.items()
        }
        step = make_train_step(model, charbonnier_loss, donate=False)
        state, _ = step(state, batch)  # compile + warm
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, _ = step(state, batch)
        jax.block_until_ready(state.params)
        return (time.perf_counter() - t0) / iters

    t1 = timed(jax.devices()[:1], b)
    tn = timed(jax.devices()[:n], n * b)
    print(json.dumps({
        "metric": "dp_overhead_factor",
        "n_devices": n, "per_device_batch": b, "shape": [t, h, w],
        "t_dp1_s": round(t1, 4), "t_dpN_s": round(tn, 4),
        "dp_overhead_factor": round(tn / (n * t1), 3),
        "note": "single-host virtual mesh: devices share cores, so the "
                "ideal factor is 1.0 (pure overhead isolation, not speedup)",
    }))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--b", type=int, default=1)
    p.add_argument("--t", type=int, default=3)
    p.add_argument("--hw", type=int, nargs=2, default=(32, 64))
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--child", action="store_true")
    args = p.parse_args()

    if args.child:
        _child(args.n, args.b, args.t, *args.hw, args.iters)
        return

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = (
        f"{flags} --xla_force_host_platform_device_count={args.n}"
    ).strip()
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--n", str(args.n), "--b", str(args.b), "--t", str(args.t),
           "--hw", str(args.hw[0]), str(args.hw[1]),
           "--iters", str(args.iters)]
    sys.exit(subprocess.run(cmd, env=env, cwd=REPO).returncode)


if __name__ == "__main__":
    main()
