"""VFI breadth (VERDICT r2 item 5): TOFlowVFINet + FLAVR forward tests
from reference-shaped config dicts."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnp_vcve_tpu.core.builder import build_generator


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_toflow_vfi_forward(rng):
    model = build_generator(
        dict(type="TOFlowVFINet", flow_cfg=dict(norm_cfg=None, pretrained=None))
    )
    # 40x52 exercises the pad-to-16 path (reference spatial_padding)
    pair = jnp.asarray(rng.random((1, 2, 40, 52, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), pair)
    out = model.apply(variables, pair)
    assert out.shape == (1, 40, 52, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_toflow_vfi_bn_variant(rng):
    model = build_generator(
        dict(type="TOFlowVFINet", flow_cfg=dict(norm_cfg=dict(type="BN")))
    )
    pair = jnp.asarray(rng.random((1, 2, 32, 32, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), pair)
    out = model.apply(variables, pair)
    assert out.shape == (1, 32, 32, 3)


def test_flavr_forward(rng):
    model = build_generator(
        dict(type="FLAVRNet", num_input_frames=4, num_output_frames=1,
             mid_channels_list=[64, 32, 16, 8], encoder_layers_list=[1, 1, 1, 1])
    )
    clip = jnp.asarray(rng.random((1, 4, 32, 32, 3), np.float32))
    variables = model.init(jax.random.PRNGKey(0), clip)
    out = model.apply(variables, clip)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()
