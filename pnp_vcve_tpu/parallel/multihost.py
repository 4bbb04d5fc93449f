"""Multi-host helpers: deterministic cross-host eval reduction.

The reference gathers evaluation results across ranks by pickling full
per-clip outputs over NCCL or a shared tmpdir
(mmedit/apis/test.py:129-234, ``collect_results_cpu/gpu``). Here only
METRIC SCALARS cross hosts — a single ``process_allgather`` of a small
float vector — and images stay host-local (the reference also saves images
rank-locally).

Launch contract: ``jax.distributed.initialize()`` from env
(COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID), done by tools/train.py
``--multihost``.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

__all__ = ["shard_clips", "allreduce_clip_metrics"]


def shard_clips(n_clips: int, process_index: int, process_count: int) -> range:
    """Strided rank subsample of clip indices (the reference
    DistributedSampler's rank::num_replicas split, samplers/
    distributed_sampler.py:60-66, without padding — the reduction below is
    count-weighted so uneven shards stay exact)."""
    return range(process_index, n_clips, process_count)


def allreduce_clip_metrics(
    per_clip: Sequence[Dict[str, float]], keys: Sequence[str] | None = None
) -> Dict[str, float]:
    """Global dataset-mean metrics from each process's local per-clip list.

    Exact count-weighted mean: allgather ``[count, sum_metric0, ...]`` and
    combine, so the result equals the single-process evaluation regardless
    of how clips were sharded.
    """
    import jax

    if keys is None:
        keys = sorted(per_clip[0]) if per_clip else []
    count = float(len(per_clip))
    sums = [sum(m[k] for m in per_clip) for k in keys]
    local = np.asarray([count] + sums, np.float32)

    if jax.process_count() == 1:
        total, *gsums = local
    else:
        from jax.experimental import multihost_utils

        gathered = np.asarray(multihost_utils.process_allgather(local))
        combined = gathered.sum(axis=0)
        total, *gsums = combined
    if total == 0:
        return {}
    return {k: float(s / total) for k, s in zip(keys, gsums)}
