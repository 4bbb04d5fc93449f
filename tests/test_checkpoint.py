"""Checkpoint/resume: a killed-and-resumed run must continue the loss/LR
trajectory EXACTLY (reference resume_from restores iter + optimizer + lr,
mmedit/apis/train.py:235-238; CheckpointHook saves optimizer state,
configs/HR_davis_LR_128x128.py:226)."""

import numpy as np
import jax
import optax
import pytest

from pnp_vcve_tpu.core.checkpoint import (
    CheckpointManager,
    load_params,
    restore_train_state,
)
from pnp_vcve_tpu.models import PnPVCVE
from pnp_vcve_tpu.train import (
    charbonnier_loss,
    cosine_restart_schedule,
    create_train_state,
    make_train_step,
)
from pnp_vcve_tpu.train.loop import state_payload, train_loop

from tests.test_train import tiny_batch


def _make_state_and_step(lr_schedule=False):
    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=False)
    batch = tiny_batch()
    params = model.init(
        jax.random.PRNGKey(0),
        lrs=batch["lq"], qps=batch["qps"], slices=batch["slices"],
        mvs=batch["mvs"], base_qps=batch["base_qps"], par_map=batch["partitions"],
    )["params"]
    if lr_schedule:
        # steep schedule so a reset LR position is detectable in one step
        tx = optax.adam(cosine_restart_schedule(1e-2, [10], [1.0], min_lr=1e-6))
    else:
        tx = optax.adam(1e-3)
    state = create_train_state(params, tx)
    step = make_train_step(model, charbonnier_loss, donate=False)
    return state, step, batch


class _Loader:
    def __init__(self, batch):
        self.batch = batch

    def __iter__(self):
        while True:
            yield self.batch


def test_full_state_checkpoint_roundtrip(tmp_path):
    state, step_fn, batch = _make_state_and_step()
    for _ in range(3):
        state, _ = step_fn(state, batch)

    mgr = CheckpointManager(tmp_path)
    mgr.save(3, state_payload(state, save_optimizer=True), wait=True)

    fresh, _, _ = _make_state_and_step()
    restored, start = restore_train_state(tmp_path, fresh)
    assert start == 3
    assert int(restored.step) == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.opt_state)),
        jax.tree_util.tree_leaves(jax.device_get(restored.opt_state)),
    ):
        np.testing.assert_array_equal(a, b)
    mgr.close()


def test_resume_continues_trajectory_exactly(tmp_path):
    """6 straight steps == 3 steps + checkpoint + resume + 3 steps."""
    state_a, step_fn, batch = _make_state_and_step(lr_schedule=True)
    state_b = state_a  # same init

    for _ in range(6):
        state_a, m_a = step_fn(state_a, batch)

    for _ in range(3):
        state_b, _ = step_fn(state_b, batch)
    mgr = CheckpointManager(tmp_path)
    mgr.save(3, state_payload(state_b, save_optimizer=True), wait=True)
    mgr.close()

    fresh, step_fn2, _ = _make_state_and_step(lr_schedule=True)
    resumed, start = restore_train_state(tmp_path, fresh)
    assert start == 3
    for _ in range(3):
        resumed, m_r = step_fn2(resumed, batch)

    assert float(m_r["loss"]) == pytest.approx(float(m_a["loss"]), abs=1e-7)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state_a.params)),
        jax.tree_util.tree_leaves(jax.device_get(resumed.params)),
    ):
        np.testing.assert_allclose(a, b, atol=1e-7)


def test_weights_only_fallback(tmp_path):
    """Old-style weights-only checkpoints still restore (params only)."""
    state, step_fn, batch = _make_state_and_step()
    state, _ = step_fn(state, batch)
    mgr = CheckpointManager(tmp_path)
    mgr.save(1, jax.device_get(state.params), wait=True)
    mgr.close()

    fresh, _, _ = _make_state_and_step()
    restored, start = restore_train_state(tmp_path, fresh)
    assert start == 1
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(jax.device_get(restored.params)),
    ):
        np.testing.assert_array_equal(a, b)


def test_load_params_unwraps_full_state(tmp_path):
    """tools/test.py-style loads work on full-train-state checkpoints."""
    state, step_fn, batch = _make_state_and_step()
    state, _ = step_fn(state, batch)
    mgr = CheckpointManager(tmp_path)
    mgr.save(1, state_payload(state, save_optimizer=True), wait=True)
    mgr.close()

    template = jax.device_get(state.params)
    params = load_params(tmp_path / "ckpt" / "1", template=template)
    for a, b in zip(
        jax.tree_util.tree_leaves(template), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(a, b)


def test_train_loop_saves_full_state(tmp_path):
    state, step_fn, batch = _make_state_and_step()
    mgr = CheckpointManager(tmp_path)
    train_loop(
        state,
        step_fn,
        _Loader(batch),
        total_iters=2,
        log_interval=100,
        checkpoint_interval=2,
        ckpt_manager=mgr,
    )
    mgr.close()
    fresh, _, _ = _make_state_and_step()
    restored, start = restore_train_state(tmp_path, fresh)
    assert start == 2 and int(restored.step) == 2
