"""Batch-of-streams serving scheduler.

The reference serves clips strictly sequentially (its eval loop,
``mmedit/apis/test.py:61-126``, and the torchserve handler are both
one-request-at-a-time). This module adds the serving-side component the
TPU design calls for: independent client *streams* submit clips; the
scheduler groups same-shape clips into device-efficient dispatches while
preserving per-stream FIFO ordering, and reports per-clip latency so the
latency/throughput trade is measurable (docs/serving_contract.md).

Two executors:

- :func:`batched_forward_executor` — single-chip batching: B same-shape
  clips stack on the model's batch axis (the b>1 PF serving path
  bench.py measures). Throughput-oriented; per-clip latency grows ~B.
- :func:`exact_stream_executor` — multi-chip frame-parallel: B clips ride
  the B/(B+D-1) streaming two-sweep pipeline
  (parallel/seqpar.enhance_clips_exact_stream), bitwise-equal to
  sequential whole-clip scans.

The scheduler itself is executor-agnostic: dispatch when ``max_batch``
same-shape clips are queued or when ``max_wait_s`` expires for the oldest
queued clip (the latency bound), never reordering clips within a stream.
"""

from __future__ import annotations

import threading
import time
from collections import OrderedDict, deque
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

import numpy as np

__all__ = [
    "Ticket",
    "StreamScheduler",
    "batched_forward_executor",
    "exact_stream_executor",
]


@dataclass
class Ticket:
    """One submitted clip: wait() blocks until the result is ready."""

    stream_id: str
    seq: int
    submitted_at: float
    _event: threading.Event = field(default_factory=threading.Event,
                                    repr=False)
    _result: Any = field(default=None, repr=False)
    _error: Optional[BaseException] = field(default=None, repr=False)
    done_at: Optional[float] = None
    dispatched_batch: int = 0  # size of the batch this clip rode in

    def wait(self, timeout: Optional[float] = None):
        if not self._event.wait(timeout):
            raise TimeoutError(f"{self.stream_id}#{self.seq} not done")
        if self._error is not None:
            raise self._error
        return self._result

    @property
    def latency_s(self) -> Optional[float]:
        if self.done_at is None:
            return None
        return self.done_at - self.submitted_at


class StreamScheduler:
    """Groups same-shape clips from many streams into batched dispatches.

    Args:
      executor: ``list[sample] -> list[output]`` — a batched enhancer
        (:func:`batched_forward_executor` /
        :func:`exact_stream_executor`). Called from the single dispatcher
        thread, so executors need no locking (ONE device context).
      max_batch: dispatch as soon as this many same-shape clips wait.
      max_wait_s: latency bound — dispatch whatever is queued for a shape
        once its oldest clip has waited this long.

    Ordering contract: clips of one stream are dispatched and completed
    in submission order (per-stream FIFO); across streams, arrival order
    decides batch membership. A stream never has two clips in flight in
    different batches out of order because batches are formed from the
    queue head.
    """

    def __init__(
        self,
        executor: Callable[[Sequence[dict]], List[np.ndarray]],
        max_batch: int = 2,
        max_wait_s: float = 0.05,
    ):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self._executor = executor
        self.max_batch = max_batch
        self.max_wait_s = max_wait_s
        self._lock = threading.Condition()
        # shape key -> FIFO of (ticket, sample)
        self._queues: "OrderedDict[tuple, deque]" = OrderedDict()
        self._seq: Dict[str, int] = {}
        self._closing = False
        self._dispatches: List[dict] = []
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    # -- client side --------------------------------------------------------

    def submit(self, stream_id: str, sample: dict) -> Ticket:
        """Queue one clip ``sample`` (keys as in train/eval enhance_clip:
        lq/qps/slices/mvs/base_qps/partitions)."""
        key = tuple(np.asarray(sample["lq"]).shape)
        with self._lock:
            if self._closing:
                raise RuntimeError("scheduler closed")
            seq = self._seq.get(stream_id, 0)
            self._seq[stream_id] = seq + 1
            t = Ticket(stream_id=stream_id, seq=seq,
                       submitted_at=time.perf_counter())
            self._queues.setdefault(key, deque()).append((t, sample))
            self._lock.notify_all()
        return t

    def close(self, drain: bool = True):
        """Stop accepting work; with ``drain`` wait for queued clips."""
        with self._lock:
            self._closing = True
            self._lock.notify_all()
        if drain:
            self._thread.join()

    def stats(self) -> dict:
        """Dispatch log: per-dispatch batch size, wall, per-clip latency."""
        with self._lock:
            d = list(self._dispatches)
        lat = [t.latency_s for dd in d for t in dd["tickets"]]
        return dict(
            dispatches=[
                dict(batch=dd["batch"], wall_s=dd["wall_s"],
                     shape=dd["shape"]) for dd in d
            ],
            clips=len(lat),
            mean_latency_s=float(np.mean(lat)) if lat else 0.0,
            p95_latency_s=float(np.percentile(lat, 95)) if lat else 0.0,
        )

    # -- dispatcher ---------------------------------------------------------

    def _pick(self) -> Optional[tuple]:
        """Choose a shape to dispatch: a full batch, or the one whose head
        clip exceeded max_wait_s, or (when closing) anything queued."""
        now = time.perf_counter()
        for key, q in self._queues.items():
            if len(q) >= self.max_batch:
                return key
        for key, q in self._queues.items():
            if q and (
                self._closing
                or now - q[0][0].submitted_at >= self.max_wait_s
            ):
                return key
        return None

    def _run(self):
        while True:
            with self._lock:
                key = self._pick()
                while key is None:
                    if self._closing and not any(self._queues.values()):
                        return
                    # wake at the earliest deadline among queue heads
                    heads = [
                        q[0][0].submitted_at
                        for q in self._queues.values() if q
                    ]
                    wait = (
                        max(0.0, min(heads) + self.max_wait_s
                            - time.perf_counter())
                        if heads else None
                    )
                    self._lock.wait(timeout=wait)
                    key = self._pick()
                q = self._queues[key]
                batch = [q.popleft() for _ in range(min(self.max_batch,
                                                        len(q)))]
                if not q:
                    del self._queues[key]
            tickets = [t for t, _ in batch]
            samples = [s for _, s in batch]
            t0 = time.perf_counter()
            try:
                outs = self._executor(samples)
                err = None
            except BaseException as e:  # surfaced on every ticket
                outs, err = [None] * len(tickets), e
            wall = time.perf_counter() - t0
            for t, o in zip(tickets, outs):
                t._result = o
                t._error = err
                t.done_at = time.perf_counter()
                t.dispatched_batch = len(tickets)
                t._event.set()
            with self._lock:
                self._dispatches.append(dict(
                    batch=len(tickets), wall_s=wall, shape=key,
                    tickets=tickets,
                ))


def batched_forward_executor(model, params, feature_dtype=None):
    """Single-chip executor: stack B same-shape clips on the batch axis,
    one jitted forward, split back. The b>1 dispatch reuses the SAME
    compiled executable per (B, t, h, w) via jax.jit's cache."""
    import jax

    from pnp_vcve_tpu.train.train_step import make_eval_step

    eval_step = make_eval_step(model)

    def run(samples: Sequence[dict]) -> List[np.ndarray]:
        batch = {
            k: np.stack([np.asarray(s[k]) for s in samples])
            for k in ("lq", "qps", "slices", "mvs", "base_qps", "partitions")
        }
        out = np.asarray(jax.device_get(eval_step(params, batch)))
        return [out[i] for i in range(out.shape[0])]

    return run


def exact_stream_executor(model, params, mesh, axis: str = "sp",
                          feature_dtype=None):
    """Multi-chip executor: B clips through the B/(B+D-1) streaming exact
    pipeline (bitwise-equal to sequential whole-clip scans,
    parallel/seqpar.py)."""
    import jax.numpy as jnp

    from pnp_vcve_tpu.parallel.seqpar import (
        enhance_clip_exact_pipeline,
        enhance_clips_exact_stream,
    )

    kw = dict(feature_dtype=feature_dtype) if feature_dtype else {}

    def run(samples: Sequence[dict]) -> List[np.ndarray]:
        if len(samples) == 1:
            return [enhance_clip_exact_pipeline(
                model, params, samples[0], mesh, axis=axis, **kw)]
        return list(enhance_clips_exact_stream(
            model, params, list(samples), mesh, axis=axis, **kw))

    return run
