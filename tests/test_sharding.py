"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnp_vcve_tpu.parallel.sharding import batch_sharding, make_mesh, replicated


def test_mesh_construction():
    mesh = make_mesh(sp=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "sp")
    with pytest.raises(ValueError):
        make_mesh(dp=3, sp=2)


def test_dp_sharded_matches_single_device():
    """A jitted computation over a dp-sharded batch equals the unsharded one."""
    mesh = make_mesh(sp=1)
    x = np.arange(8 * 4 * 4, dtype=np.float32).reshape(8, 4, 4)

    def f(v):
        return jnp.sin(v) * 2.0 + jnp.sum(v, axis=(1, 2), keepdims=True)

    expected = jax.jit(f)(jnp.asarray(x))
    xs = jax.device_put(jnp.asarray(x), batch_sharding(mesh, 3))
    got = jax.jit(f)(xs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[0].shape[0]
    assert np.isfinite(np.asarray(out)).all()


def test_frame_parallel_clip_enhancement():
    """Overlapped-window frame-parallel eval on the 8-device mesh: output
    shape matches, halo windows agree with the full-clip forward away from
    chunk boundaries better than halo-free chunks."""
    import numpy as np
    from pnp_vcve_tpu.models import PnPVCVE
    from pnp_vcve_tpu.train.train_step import make_eval_step
    from pnp_vcve_tpu.train.eval import enhance_clip, enhance_clip_frame_parallel
    from pnp_vcve_tpu.parallel.sharding import make_mesh

    rng = np.random.default_rng(0)
    t, h, w = 16, 16, 16
    sample = {
        "lq": rng.random((t, h, w, 3)).astype(np.float32),
        "qps": rng.random((t,)).astype(np.float32),
        "slices": np.where(rng.random(t) < 0.4, 80.0, 66.0).astype(np.float32),
        "mvs": (rng.standard_normal((t, h, w, 4)) * 2).astype(np.float32),
        "base_qps": np.full((t,), 15 / 255, np.float32),
        "partitions": (rng.random((t, h, w, 3)) > 0.5).astype(np.float32) / 255,
    }
    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=False)
    batch1 = {k: v[None][:, :4] for k, v in sample.items()}
    params = model.init(
        jax.random.PRNGKey(0),
        lrs=batch1["lq"], qps=batch1["qps"], slices=batch1["slices"],
        mvs=batch1["mvs"], base_qps=batch1["base_qps"],
        par_map=batch1["partitions"],
    )["params"]
    step = make_eval_step(model)

    mesh = make_mesh(sp=1)
    full = enhance_clip(step, params, sample)  # exact single-window
    par = enhance_clip_frame_parallel(step, params, sample, mesh, chunk_t=2, halo_t=2)
    assert par.shape == full.shape
    chunked = enhance_clip(step, params, sample, chunk_t=2)
    err_halo = np.abs(par - full).mean()
    err_chunk = np.abs(chunked - full).mean()
    assert err_halo <= err_chunk + 1e-7
    assert err_halo < 0.05
