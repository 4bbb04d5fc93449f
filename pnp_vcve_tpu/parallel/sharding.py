"""Device mesh construction and sharding rules.

The reference's only parallelism is per-process NCCL data parallelism
(tools/dist_train.sh:10-16, mmedit/core/distributed_wrapper.py:9-60). Here
distribution is a compiler problem: one process, one
``jax.sharding.Mesh``, sharding annotations on the batch (axis ``dp``) and
optionally the spatial width (axis ``sp``, XLA inserts halo exchanges for
convolutions over it), with gradient reductions emitted by XLA as psums over
ICI. Multi-host extends the same mesh over DCN via
``jax.distributed.initialize`` — no code changes in the train step.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "replicated", "shard_batch_spec"]


def make_mesh(
    dp: Optional[int] = None,
    sp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (dp, sp) mesh; dp defaults to n_devices / sp.

    When ``devices`` is not given, the ``PNP_NUM_CHIPS`` env var (set by
    tools/dist_train.sh's CHIPS argument, the analog of the reference's GPUS
    count, /root/reference/tools/dist_train.sh:10-16) bounds the device
    count; 0/unset means all local devices.
    """
    if devices is None:
        import os

        devices = jax.devices()
        n_chips = int(os.environ.get("PNP_NUM_CHIPS", "0") or 0)
        if n_chips > 0:
            if n_chips > len(devices):
                raise ValueError(
                    f"CHIPS={n_chips} requested but only {len(devices)} devices"
                )
            devices = devices[:n_chips]
    devices = list(devices)
    n = len(devices)
    if dp is None:
        if n % sp:
            raise ValueError(f"{n} devices not divisible by sp={sp}")
        dp = n // sp
    if dp * sp != n:
        raise ValueError(f"dp({dp}) * sp({sp}) != n_devices({n})")
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def shard_batch_spec(ndim: int, spatial_axis: Optional[int] = None) -> P:
    """PartitionSpec for a batch-leading array: batch over dp, optionally one
    spatial axis over sp."""
    spec = [None] * ndim
    spec[0] = "dp"
    if spatial_axis is not None:
        spec[spatial_axis] = "sp"
    return P(*spec)


def batch_sharding(
    mesh: Mesh, ndim: int, spatial_axis: Optional[int] = None
) -> NamedSharding:
    return NamedSharding(mesh, shard_batch_spec(ndim, spatial_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
