#!/usr/bin/env python
"""Training-step throughput on the reference recipe shape.

The reference trains the flagship with batch 5 clips x 15 frames at
128x128 crops for 300k iterations (configs/HR_davis_LR_128x128.py train
recipe; mmedit/apis/train.py IterBasedRunner loop). This times OUR jitted
train step (forward + Charbonnier + grads + optax, train/train_step.py)
at exactly that shape on one chip, with the production training
configuration: warp_impl='padgather' (the train contract — crops misalign
the macroblock grid), remat=True, f32 features.

    python tools/bench_train.py [--b 5] [--t 15] [--hw 128 128] [--iters 3]

Prints one JSON line: training frames/sec/chip and step ms. Timing chains
the steps on their own TrainState inside one jit (per-call wall probes
through the device tunnel are untrustworthy; see bench.py).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--b", type=int, default=5)
    p.add_argument("--t", type=int, default=15)
    p.add_argument("--hw", type=int, nargs=2, default=(128, 128))
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import optax

    from pnp_vcve_tpu.models import PnPVCVE
    from pnp_vcve_tpu.train import create_train_state, make_train_step

    b, t, (h, w) = args.b, args.t, args.hw
    rng = np.random.default_rng(0)

    model = PnPVCVE()  # production train config: padgather/remat/f32
    f32 = lambda *s: jnp.asarray(rng.random(s), jnp.float32)  # noqa: E731
    slices = np.full((b, t), 66.0, np.float32)
    slices[:, ::4] = 80.0
    slices[:, 0] = 73.0
    batch = dict(
        lq=f32(b, t, h, w, 3),
        gt=f32(b, t, h, w, 3),
        qps=f32(b, t),
        slices=jnp.asarray(slices),
        mvs=jnp.asarray(
            rng.standard_normal((b, t, h, w, 4)).astype(np.float32) * 3
        ),
        base_qps=jnp.full((b, t), 15.0 / 255.0),
        partitions=(f32(b, t, h, w, 3) > 0.5).astype(jnp.float32) / 255.0,
    )

    params = model.init(jax.random.PRNGKey(0), lrs=batch["lq"],
                        qps=batch["qps"], slices=batch["slices"],
                        mvs=batch["mvs"], base_qps=batch["base_qps"],
                        par_map=batch["partitions"])["params"]
    # reference optimizer: Adam 2e-4 (configs/HR_davis_LR_128x128.py)
    state = create_train_state(params, optax.adam(2e-4))
    step = make_train_step(model, donate=False)

    n_iters = args.iters

    def chained(s0, bt):
        def body(_, s):
            return step(s, bt)[0]

        final = jax.lax.fori_loop(0, n_iters, body, s0)
        leaf = jax.tree_util.tree_leaves(final.params)[0]
        return jnp.sum(leaf.astype(jnp.float32))

    fwd = jax.jit(chained)
    float(fwd(state, batch))  # compile + warm
    t0 = time.perf_counter()
    float(fwd(state, batch))
    dt = (time.perf_counter() - t0) / n_iters

    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "shape": [b, t, h, w],
        "value": round(b * t / dt, 3),
        "unit": "frames/s",
        "step_ms": round(dt * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
