#!/usr/bin/env python
"""Xplane trace of the STANDALONE banded warp kernel: per-line dump.

The kernel is one opaque tpu_custom_call in the HLO plane, but the TPU
plane's other lines (DMA queues, barriers) expose where the ~2 ms/warp
dma-stage floor goes (tools/warp_pf_stages.py measured it byte-bound:
halving grid steps at constant pixels left it unchanged).

    python tools/warp_trace.py [--n 30]
"""

import argparse
import collections
import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()

import jax
import jax.numpy as jnp
import numpy as np

from pnp_vcve_tpu.kernels.drt_stack import pack_pf
from pnp_vcve_tpu.kernels.warp_pf import build_warp_tables, warp_pf

H, W = 720, 1280


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=30)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((1, H, W, 64)).astype(np.float32), jnp.bfloat16
    )
    fb = rng.uniform(-16, 16, (1, H // 8, W // 8, 2)).astype(np.float32)
    flow = jnp.asarray(np.repeat(np.repeat(fb, 8, axis=1), 8, axis=2))
    xpf = jax.block_until_ready(pack_pf(x, th=8))
    tabs = jax.tree.map(
        lambda v: jax.block_until_ready(v.astype(jnp.bfloat16)),
        build_warp_tables(flow, H, W, 128),
    )

    def chained(z, s0, s1, v):
        def body(_, acc):
            return warp_pf(
                acc, s0 + acc.reshape(-1)[0] * 1e-30, s1, v, H, W, 128
            ).astype(acc.dtype)

        return jnp.sum(
            jax.lax.fori_loop(0, args.n, body, z).astype(jnp.float32)
        )

    g = jax.jit(chained)
    float(g(xpf, *tabs))  # compile + warm

    logdir = tempfile.mkdtemp(prefix="warp_trace_")
    with jax.profiler.trace(logdir):
        t0 = time.perf_counter()
        float(g(xpf, *tabs))
        dt = (time.perf_counter() - t0) / args.n
    print(f"{dt * 1e3:.3f} ms/warp  (trace: {logdir})")

    try:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    )
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = {k: v.name for k, v in plane.event_metadata.items()}
        print(f"\n=== plane: {plane.name} ===")
        for line in plane.lines:
            tot = collections.Counter()
            cnt = collections.Counter()
            for ev in line.events:
                name = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                tot[name] += ev.duration_ps
                cnt[name] += 1
            if not tot:
                continue
            line_ms = sum(tot.values()) / 1e9
            print(f"--- line: {line.name!r}  total {line_ms:.3f} ms ---")
            for name, ps in tot.most_common(6):
                print(
                    f"  {ps / 1e9:9.3f} ms  x{cnt[name]:<5d} {name[:110]}"
                )


if __name__ == "__main__":
    main()
