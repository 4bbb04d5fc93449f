"""Batch-of-streams serving scheduler (pnp_vcve_tpu/serving.py): ordering,
same-shape batching, latency accounting, and exactness of both executors
vs sequential per-clip enhancement (the reference's only serving mode,
mmedit/apis/test.py:61-126)."""

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_vcve_tpu.models import PnPVCVE
from pnp_vcve_tpu.serving import (
    StreamScheduler,
    batched_forward_executor,
    exact_stream_executor,
)
from pnp_vcve_tpu.train.train_step import make_eval_step


def make_sample(rng, t, h, w):
    slices = np.full((t,), 66.0, np.float32)
    slices[0] = 73.0
    mvs_blk = (rng.standard_normal((t, h // 8, w // 8, 4)) * 3).astype(
        np.float32
    )
    return dict(
        lq=rng.random((t, h, w, 3)).astype(np.float32),
        gt=rng.random((t, h, w, 3)).astype(np.float32),
        qps=rng.random((t,)).astype(np.float32),
        slices=slices,
        mvs=np.repeat(np.repeat(mvs_blk, 8, axis=1), 8, axis=2),
        base_qps=np.full((t,), 15.0 / 255.0, np.float32),
        partitions=(rng.random((t, h, w, 3)) > 0.5).astype(np.float32) / 255.0,
    )


@pytest.fixture(scope="module")
def tiny():
    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=False)
    rng = np.random.default_rng(0)
    s = make_sample(rng, 4, 16, 16)
    params = model.init(
        jax.random.PRNGKey(0),
        lrs=jnp.asarray(s["lq"][None]), qps=jnp.asarray(s["qps"][None]),
        slices=jnp.asarray(s["slices"][None]),
        mvs=jnp.asarray(s["mvs"][None]),
        base_qps=jnp.asarray(s["base_qps"][None]),
        par_map=jnp.asarray(s["partitions"][None]),
    )["params"]
    return model, params


def test_batched_executor_matches_sequential(tiny):
    """B clips stacked on the batch axis == B independent forwards."""
    model, params = tiny
    rng = np.random.default_rng(1)
    samples = [make_sample(rng, 4, 16, 16) for _ in range(3)]
    run = batched_forward_executor(model, params)
    outs = run(samples)
    eval_step = make_eval_step(model)
    for s, o in zip(samples, outs):
        want = np.asarray(
            eval_step(
                params,
                {k: np.asarray(s[k])[None] for k in (
                    "lq", "qps", "slices", "mvs", "base_qps", "partitions")},
            )
        )[0]
        np.testing.assert_allclose(o, want, atol=2e-6, rtol=1e-5)


def test_scheduler_orders_and_batches(tiny):
    model, params = tiny
    rng = np.random.default_rng(2)
    sched = StreamScheduler(
        batched_forward_executor(model, params), max_batch=2, max_wait_s=0.2
    )
    # two streams, two shapes: (4,16,16) and (4,8,16); same-shape clips
    # from different streams batch together, shapes never mix
    tickets = []
    for i in range(3):
        tickets.append(("a", i, sched.submit("a", make_sample(rng, 4, 16, 16))))
        tickets.append(("b", i, sched.submit("b", make_sample(rng, 4, 8, 16))))
    sched.close(drain=True)
    done = {}
    for sid, i, t in tickets:
        out = t.wait(timeout=60)
        assert t.seq == i
        assert out.shape[0] == 4
        done.setdefault(sid, []).append((i, t.done_at))
    # per-stream FIFO: completion times non-decreasing in seq
    for sid, seq_done in done.items():
        times = [d for _, d in sorted(seq_done)]
        assert times == sorted(times), f"stream {sid} completed out of order"
    st = sched.stats()
    assert st["clips"] == 6
    # same-shape batching actually happened (6 clips in < 6 dispatches)
    assert len(st["dispatches"]) < 6
    assert all(d["batch"] <= 2 for d in st["dispatches"])
    # each dispatch carries exactly one shape (queues are keyed by shape)
    assert {d["shape"] for d in st["dispatches"]} == {
        (4, 16, 16, 3), (4, 8, 16, 3)}
    assert st["mean_latency_s"] > 0


def test_scheduler_latency_bound_flushes_partial_batch(tiny):
    """A lone clip must not wait for a full batch: the max_wait_s bound
    dispatches it (the latency half of the latency/throughput contract)."""
    model, params = tiny
    rng = np.random.default_rng(3)
    sched = StreamScheduler(
        batched_forward_executor(model, params), max_batch=4, max_wait_s=0.05
    )
    t = sched.submit("solo", make_sample(rng, 4, 16, 16))
    out = t.wait(timeout=60)
    assert out.shape == (4, 16, 16, 3)
    assert t.dispatched_batch == 1
    sched.close()


def test_scheduler_propagates_executor_errors():
    def boom(samples):
        raise RuntimeError("device on fire")

    sched = StreamScheduler(boom, max_batch=1, max_wait_s=0.01)
    t = sched.submit("s", dict(lq=np.zeros((2, 8, 8, 3), np.float32)))
    with pytest.raises(RuntimeError, match="device on fire"):
        t.wait(timeout=30)
    sched.close()


def test_exact_stream_executor_bitwise_equals_scan(tiny):
    """The multi-chip executor through the scheduler == the single-device
    whole-clip scan, bitwise (parallel/seqpar exactness contract)."""
    from jax.sharding import Mesh

    model, params = tiny
    rng = np.random.default_rng(4)
    samples = [make_sample(rng, 8, 16, 16) for _ in range(2)]
    mesh = Mesh(np.array(jax.devices())[:4], ("sp",))
    sched = StreamScheduler(
        exact_stream_executor(model, params, mesh), max_batch=2,
        max_wait_s=0.5,
    )
    ts = [sched.submit("s", s) for s in samples]
    outs = [t.wait(timeout=300) for t in ts]
    sched.close()
    eval_step = make_eval_step(model)
    for s, o in zip(samples, outs):
        want = np.asarray(
            eval_step(
                params,
                {k: np.asarray(s[k])[None] for k in (
                    "lq", "qps", "slices", "mvs", "base_qps", "partitions")},
            )
        )[0]
        np.testing.assert_array_equal(np.asarray(o), want)


def test_scheduler_concurrent_submitters(tiny):
    """Threaded clients submitting concurrently: everything completes,
    per-stream order holds."""
    model, params = tiny
    sched = StreamScheduler(
        batched_forward_executor(model, params), max_batch=3, max_wait_s=0.02
    )
    results = {}

    def client(sid):
        rng = np.random.default_rng(hash(sid) % 2**31)
        ts = [sched.submit(sid, make_sample(rng, 4, 16, 16))
              for _ in range(3)]
        results[sid] = [t.wait(timeout=120) for t in ts]

    threads = [threading.Thread(target=client, args=(f"c{i}",))
               for i in range(3)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    sched.close()
    assert len(results) == 3
    assert all(len(v) == 3 for v in results.values())
