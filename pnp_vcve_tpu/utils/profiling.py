"""Profiling utilities.

The reference's only perf probe is an ad-hoc cuda.synchronize + wall print
(restorers/basicvsr.py:176-182). Here profiling is first-class:

- :func:`trace` — context manager around ``jax.profiler`` writing an xplane
  trace viewable in TensorBoard/Perfetto.
- :class:`StepTimer` — robust step timing; on this deployment's tunneled
  device, per-call wall probes lie (block_until_ready returns early), so
  timing forces a scalar host readback of a data-dependent value.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with forced host readback.

    >>> timer = StepTimer()
    >>> with timer.step():
    ...     out = step_fn(...)
    ...     timer.sync(out)  # forces real completion
    >>> timer.mean_ms()
    """

    def __init__(self):
        self.times: list[float] = []
        self._t0: Optional[float] = None

    @contextlib.contextmanager
    def step(self):
        self._t0 = time.perf_counter()
        yield
        self.times.append(time.perf_counter() - self._t0)

    @staticmethod
    def sync(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        if leaves:
            float(jnp.sum(leaves[0].astype(jnp.float32)))

    def mean_ms(self, skip_first: int = 1) -> float:
        xs = self.times[skip_first:] or self.times
        return 1e3 * sum(xs) / len(xs)
