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


def test_ema_update_semantics():
    """EMA: tracks raw params before start_iter, lerps after (reference
    core/hooks/ema.py lerp: new_ema = p + (ema - p) * momentum)."""
    import jax.numpy as jnp

    from pnp_vcve_tpu.train.ema import ema_init, ema_update

    p0 = {"w": jnp.asarray([1.0, 2.0])}
    ema = ema_init(p0)
    p1 = {"w": jnp.asarray([3.0, 4.0])}
    # warmup: copies the live params
    ema = ema_update(ema, p1, step=0, momentum=0.9, start_iter=5)
    np.testing.assert_allclose(np.asarray(ema["w"]), [3.0, 4.0])
    # past start: lerp toward old ema with weight momentum
    p2 = {"w": jnp.asarray([13.0, 14.0])}
    ema = ema_update(ema, p2, step=5, momentum=0.9, start_iter=5, interval=1)
    np.testing.assert_allclose(
        np.asarray(ema["w"]), [13.0 + (3.0 - 13.0) * 0.9, 14.0 + (4.0 - 14.0) * 0.9]
    )
    # off-interval tick: unchanged
    before = np.asarray(ema["w"]).copy()
    ema = ema_update(ema, p1, step=6, momentum=0.9, start_iter=0, interval=2)
    np.testing.assert_allclose(np.asarray(ema["w"]), before)


def test_cyclegan_train_step_decreases_losses():
    import jax
    import jax.numpy as jnp
    import optax

    from pnp_vcve_tpu.models.upstream import PatchDiscriminator, ResnetGenerator
    from pnp_vcve_tpu.train.gan import make_cyclegan_train_step
    from pnp_vcve_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    img_a = jnp.asarray(rng.random((1, 32, 32, 3), np.float32) * 2 - 1)
    img_b = jnp.asarray(rng.random((1, 32, 32, 3), np.float32) * 2 - 1)

    gen_kw = dict(base_channels=8, num_blocks=1)
    ga = ResnetGenerator(**gen_kw)
    gb = ResnetGenerator(**gen_kw)
    da = PatchDiscriminator(base_channels=8, num_conv=1)
    db = PatchDiscriminator(base_channels=8, num_conv=1)

    key = jax.random.PRNGKey(0)
    tx = optax.adam(2e-4)
    mk = lambda mod, k, x: create_train_state(  # noqa: E731
        mod.init(k, x)["params"], tx
    )
    k1, k2, k3, k4 = jax.random.split(key, 4)
    ga_s, gb_s = mk(ga, k1, img_a), mk(gb, k2, img_b)
    da_s, db_s = mk(da, k3, img_a), mk(db, k4, img_b)

    step = make_cyclegan_train_step(ga, gb, da, db, donate=False)
    batch = {"img_a": img_a, "img_b": img_b}
    metrics0 = None
    for _ in range(3):
        ga_s, gb_s, da_s, db_s, metrics = step(ga_s, gb_s, da_s, db_s, batch)
        if metrics0 is None:
            metrics0 = metrics
    assert float(metrics["loss_g"]) < float(metrics0["loss_g"])
    assert np.isfinite(float(metrics["loss_da"]))


def test_visualization_hook(tmp_path):
    from pnp_vcve_tpu.train.visualization import VisualizationHook, make_image_grid

    rng = np.random.default_rng(0)
    hook = VisualizationHook(
        str(tmp_path), ["lq", "output"], interval=2, rerange=False, nrow=2
    )
    res = {
        "lq": rng.random((2, 8, 8, 3), np.float32),
        "output": rng.random((2, 8, 8, 3), np.float32),
    }
    assert hook(0, res) is None         # off-interval
    path = hook(1, res)                 # (step+1) % 2 == 0
    assert path is not None and path.endswith("iter_2.png")
    from PIL import Image

    with Image.open(path) as im:
        wpx, hpx = im.size
    # 4 tiles, 2 per row, 4px padding: 2*8+4 = 20 each way
    assert (wpx, hpx) == (20, 20)

    g = make_image_grid([np.full((4, 4, 3), -1.0)], rerange=True)
    assert g.max() == 0  # [-1,1] -> [0,1] rerange maps -1 to 0
