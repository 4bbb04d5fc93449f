"""Batched, prefetching input pipeline feeding the device mesh.

Replaces the reference's torch DataLoader + DistributedWeightedSampler stack
(mmedit/datasets/builder.py:52-199,
mmedit/datasets/samplers/distributed_sampler.py:75-123) with:

- :class:`WeightedMixture` — per-sample multinomial over datasets (the
  reference's ``mix_data=True, weights=[1,2,1]`` tri-dataset sampling).
- :class:`PrefetchLoader` — a thread pool building numpy batches ahead of
  time and ``jax.device_put``-ing them with the global batch sharding, so
  host decode/rasterize overlaps device compute (double buffering into HBM).

Determinism: every batch is derived from ``np.random.Generator`` seeded by
(seed, step, slot) — reproducible regardless of thread scheduling, matching
the spirit of the reference's seeded workers (builder.py:182-198).
"""

from __future__ import annotations

import threading
from typing import Callable, Optional, Sequence

import jax
import numpy as np

from .pipeline import Sample

__all__ = ["WeightedMixture", "PrefetchLoader", "collate"]


class WeightedMixture:
    """Sample from N datasets with probabilities proportional to weights."""

    def __init__(self, datasets: Sequence, weights: Sequence[float]):
        if len(datasets) != len(weights):
            raise ValueError("datasets and weights length mismatch")
        self.datasets = list(datasets)
        p = np.asarray(weights, np.float64)
        self.p = p / p.sum()

    def sample(self, rng: np.random.Generator) -> Sample:
        i = int(rng.choice(len(self.datasets), p=self.p))
        return self.datasets[i].sample(rng)


def collate(samples: Sequence[Sample]) -> dict:
    """Stack sample dicts into batched arrays (b, t, ...)."""
    keys = [k for k in samples[0] if isinstance(samples[0][k], np.ndarray)]
    return {k: np.stack([s[k] for s in samples]) for k in keys}


class PrefetchLoader:
    """Infinite batched iterator with threaded prefetch and device transfer."""

    def __init__(
        self,
        source,
        batch_size: int,
        seed: int = 0,
        num_threads: int = 4,
        prefetch: int = 2,
        sharding: Optional[jax.sharding.Sharding] = None,
        start_step: int = 0,
    ):
        self.source = source
        self.batch_size = batch_size
        self.seed = seed
        # workers_per_gpu=0 means synchronous loading in the reference's
        # torch DataLoader; with a threaded prefetcher that maps to ONE
        # worker thread (0 threads would deadlock __next__ forever)
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.sharding = sharding
        self._step = start_step
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._next_to_emit = start_step
        self._pending: dict[int, dict] = {}
        self._lock = threading.Condition()
        self._claim = start_step
        self._error: Optional[BaseException] = None

    def _build_batch(self, step: int) -> dict:
        samples = []
        for slot in range(self.batch_size):
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, step, slot])
            )
            samples.append(self.source.sample(rng))
        return collate(samples)

    def _worker(self):
        while not self._stop.is_set():
            with self._lock:
                step = self._claim
                self._claim += 1
            try:
                batch = self._build_batch(step)
            except BaseException as e:  # propagate to the consumer
                with self._lock:
                    self._error = e
                    self._stop.set()
                    self._lock.notify_all()
                return
            with self._lock:
                self._pending[step] = batch
                self._lock.notify_all()

    def start(self):
        for _ in range(self.num_threads):
            t = threading.Thread(target=self._worker, daemon=True)
            t.start()
            self._threads.append(t)
        return self

    def stop(self):
        self._stop.set()

    def __iter__(self):
        if not self._threads:
            self.start()
        return self

    def __next__(self) -> dict:
        with self._lock:
            while self._next_to_emit not in self._pending:
                if self._error is not None:
                    raise RuntimeError("data loader worker failed") from self._error
                self._lock.wait(timeout=60.0)
            batch = self._pending.pop(self._next_to_emit)
            self._next_to_emit += 1
        if self.sharding is not None:
            batch = jax.device_put(batch, self.sharding)
        return batch
