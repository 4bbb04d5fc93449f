"""Train-step tests: optimization works, fix_iter freezing, schedule parity."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pnp_vcve_tpu.models import PnPVCVE
from pnp_vcve_tpu.train import (
    charbonnier_loss,
    cosine_restart_schedule,
    create_train_state,
    make_train_step,
)


def tiny_batch(b=2, t=3, h=16, w=16, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lq": jnp.asarray(rng.random((b, t, h, w, 3), np.float32)),
        "gt": jnp.asarray(rng.random((b, t, h, w, 3), np.float32)),
        "qps": jnp.asarray(rng.random((b, t), np.float32)),
        "slices": jnp.full((b, t), 73.0),
        "mvs": jnp.zeros((b, t, h, w, 4)),
        "base_qps": jnp.full((b, t), 15.0 / 255),
        "partitions": jnp.zeros((b, t, h, w, 3)),
    }


def test_charbonnier_matches_formula():
    rng = np.random.default_rng(0)
    p = rng.standard_normal((2, 3, 4)).astype(np.float32)
    t = rng.standard_normal((2, 3, 4)).astype(np.float32)
    expected = np.mean(np.sqrt((p - t) ** 2 + 1e-12))
    assert float(charbonnier_loss(jnp.asarray(p), jnp.asarray(t))) == pytest.approx(
        expected, rel=1e-6
    )


def test_cosine_restart_schedule_endpoints():
    sched = cosine_restart_schedule(2e-4, [1000], [1.0], min_lr=1e-7)
    assert float(sched(0)) == pytest.approx(2e-4, rel=1e-6)
    assert float(sched(1000)) == pytest.approx(1e-7, rel=1e-3)
    mid = float(sched(500))
    assert 1e-7 < mid < 2e-4
    # restart: second period resumes at base_lr * weight
    sched2 = cosine_restart_schedule(2e-4, [100, 100], [1.0, 0.5], min_lr=1e-7)
    assert float(sched2(100)) == pytest.approx(1e-4, rel=1e-4)


def test_train_step_reduces_loss():
    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=True)
    batch = tiny_batch()
    init_args = {k: v for k, v in batch.items() if k != "gt"}
    params = model.init(
        jax.random.PRNGKey(0),
        lrs=init_args["lq"], qps=init_args["qps"], slices=init_args["slices"],
        mvs=init_args["mvs"], base_qps=init_args["base_qps"],
        par_map=init_args["partitions"],
    )["params"]
    state = create_train_state(params, optax.adam(1e-3))
    step = make_train_step(model, charbonnier_loss, donate=False)

    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_fix_iter_freezes_prefix():
    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=False)
    batch = tiny_batch()
    params = model.init(
        jax.random.PRNGKey(0),
        lrs=batch["lq"], qps=batch["qps"], slices=batch["slices"],
        mvs=batch["mvs"], base_qps=batch["base_qps"], par_map=batch["partitions"],
    )["params"]
    state = create_train_state(params, optax.sgd(1e-2))
    step = make_train_step(
        model, charbonnier_loss, fix_iter=2, freeze_prefixes=("base_predictor",),
        donate=False,
    )
    frozen0 = jax.device_get(state.params["base_predictor"])
    state, _ = step(state, batch)
    frozen1 = jax.device_get(state.params["base_predictor"])
    # still within fix_iter: unchanged
    for a, b in zip(jax.tree_util.tree_leaves(frozen0), jax.tree_util.tree_leaves(frozen1)):
        np.testing.assert_array_equal(a, b)
    state, _ = step(state, batch)
    state, _ = step(state, batch)  # step 3 > fix_iter: now updates
    frozen3 = jax.device_get(state.params["base_predictor"])
    diffs = [
        float(np.max(np.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(frozen0), jax.tree_util.tree_leaves(frozen3)
        )
    ]
    assert max(diffs) > 0


def test_paramwise_lr_mult():
    """paramwise_cfg custom_keys scales matching params' updates (reference
    spynet lr_mult=0.125, core/optimizer/builder.py:5-58)."""
    from pnp_vcve_tpu.core.builder import build_optimizer

    tx = build_optimizer(
        dict(generator=dict(
            type="Adam", lr=1.0, betas=(0.9, 0.999),
            paramwise_cfg=dict(custom_keys={"spynet": dict(lr_mult=0.125)}),
        )),
        None,
    )
    params = {"spynet": {"w": jnp.ones((4,))}, "head": {"w": jnp.ones((4,))}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    ratio = float(updates["spynet"]["w"][0] / updates["head"]["w"][0])
    assert ratio == pytest.approx(0.125, rel=1e-5)
