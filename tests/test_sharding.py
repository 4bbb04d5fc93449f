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
