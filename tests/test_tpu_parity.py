"""Real-chip Mosaic lowering parity tier (VERDICT r3 item 6).

Per-kernel comparisons vs the XLA composition at flagship BAND shapes
(full 1280 width, full 64-channel PF lanes, reduced height to bound
compile time), run COMPILED on the real TPU — not interpret mode. A
Mosaic lowering regression between jax/libtpu bumps fails a named test
here instead of only nudging the end-to-end bench smoke's 3e-3.

Run with:  PNP_TESTS_TPU=1 python -m pytest tests/ -m tpu -q
(conftest skips the CPU-platform forcing under PNP_TESTS_TPU=1; one TPU
process at a time — do not run concurrently with bench.py).

Tolerances: features are bf16 (the production carry dtype); oracles run
in f32 on the same bf16-rounded inputs. Error budget = input rounding
(~0.4% rel) + per-stage bf16 output rounding; bounds are set at ~5x the
measured slack, in units of std(reference) so they track magnitude. A
lowering bug (wrong slice, swapped lane, dropped tap) shifts whole
blocks by O(std) and trips any of them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

if jax.devices()[0].platform != "tpu":
    pytest.skip(
        "real-TPU parity tier (set PNP_TESTS_TPU=1 and run on the chip)",
        allow_module_level=True,
    )

pytestmark = [pytest.mark.tpu, pytest.mark.slow]

B, H, W, C = 1, 64, 1280, 64  # flagship band: full width, 8 warp bands


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _stats_assert(got, want, max_rel=0.02, mean_rel=0.002):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    sd = float(want.std()) or 1.0
    diff = np.abs(got - want)
    assert float(diff.max()) < max_rel * sd, (
        f"max|diff|={diff.max():.4g} vs {max_rel}*std={max_rel * sd:.4g}"
    )
    assert float(diff.mean()) < mean_rel * sd


def test_warp_pf_tpu_band_parity(rng):
    """Compiled banded warp vs the XLA block8 gather at (64, 1280, 64)."""
    from pnp_vcve_tpu.kernels.drt_stack import pack_pf, unpack_pf
    from pnp_vcve_tpu.kernels.warp_pf import flow_warp_pf
    from pnp_vcve_tpu.ops.warp import flow_warp

    x = jnp.asarray(
        rng.standard_normal((B, H, W, C)).astype(np.float32), jnp.bfloat16
    )
    fb = rng.uniform(-16, 16, (B, H // 8, W // 8, 2)).astype(np.float32)
    flow = jnp.asarray(np.repeat(np.repeat(fb, 8, axis=1), 8, axis=2))

    got = unpack_pf(flow_warp_pf(pack_pf(x, th=8), flow, H, W), H, W)
    want = flow_warp(x.astype(jnp.float32), flow, impl="block8")
    # bf16 blend vs f32 oracle: max error ~1 ulp at the distribution's
    # extremes (ulp(4sigma)=0.031 ~= 0.04*std); measured 0.0238 on this
    # seed. A lowering bug shifts whole blocks by O(std).
    _stats_assert(got, want, max_rel=0.08, mean_rel=0.01)


def test_drt_stack_tpu_band_parity(rng):
    """Compiled fused DRT stack vs the XLA composition, 2 chained blocks."""
    from tests.test_kernels import drt_reference
    from pnp_vcve_tpu.kernels.drt_stack import drt_stack_packed

    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    x32 = f32(B, H, W, C)
    x = jnp.asarray(x32, jnp.bfloat16)
    par = jnp.asarray((rng.random((B, H, W, 3)) > 0.5).astype(np.float32) / 255.0)

    blocks, expected = [], x.astype(jnp.float32)
    for _ in range(2):
        blk = dict(
            dyn_kernels=jnp.asarray(f32(B, 3, 3, C, C) * 0.1),
            dyn_biases=jnp.asarray(f32(B, C) * 0.1),
            par_kernel=jnp.asarray(f32(C, 3, C) * 0.1),
            conv1_kernel=jnp.asarray(f32(3, 3, C, C) * 0.1),
            conv1_bias=jnp.asarray(f32(C) * 0.1),
            gamma=jnp.asarray(rng.random((B, C)).astype(np.float32)),
        )
        blocks.append(blk)
        expected = drt_reference(
            expected, par, blk["dyn_kernels"], blk["dyn_biases"],
            blk["par_kernel"], blk["conv1_kernel"], blk["conv1_bias"],
            blk["gamma"],
        )

    bf_blocks = [
        {k: v.astype(jnp.bfloat16) for k, v in blk.items()} for blk in blocks
    ]
    got = drt_stack_packed(x, par.astype(jnp.bfloat16), bf_blocks, th=8)
    _stats_assert(got, expected, max_rel=0.06, mean_rel=0.004)


def test_input_conv_pf_tpu_band_parity(rng):
    """Compiled PF input conv (A/B matmul path) vs the XLA sum-of-convs."""
    from pnp_vcve_tpu.kernels.drt_stack import input_conv_pf, unpack_pf

    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    lr = jnp.asarray(f32(B, H, W, 3), jnp.bfloat16)
    f1 = jnp.asarray(f32(B, H, W, C), jnp.bfloat16)
    f2 = jnp.asarray(f32(B, H, W, C), jnp.bfloat16)
    cin = 3 + 2 * C
    kernel = jnp.asarray(f32(3, 3, cin, C) * 0.1)
    bias = jnp.asarray(f32(C) * 0.1)

    got = unpack_pf(
        input_conv_pf(
            [lr, f1, f2], kernel.astype(jnp.bfloat16),
            bias.astype(jnp.bfloat16), cout=C,
        ),
        H, W,
    )
    x = jnp.concatenate(
        [lr.astype(jnp.float32), f1.astype(jnp.float32),
         f2.astype(jnp.float32)], axis=-1,
    )
    ref = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    ref = jnp.where(ref >= 0, ref, 0.1 * ref)
    _stats_assert(got, ref, max_rel=0.04, mean_rel=0.004)


def test_head_pf_tpu_band_parity(rng):
    """Compiled packed reconstruction head vs the XLA conv composition."""
    from pnp_vcve_tpu.kernels.drt_stack import _xla_head, head_pf, pack_pf

    f32 = lambda *s: rng.standard_normal(s).astype(np.float32)
    x32 = f32(B, H, W, C)
    x = jnp.asarray(x32, jnp.bfloat16)
    head32 = (
        jnp.asarray(f32(3, 3, C, C) * 0.1), jnp.asarray(f32(C) * 0.1),
        jnp.asarray(f32(3, 3, C, 3) * 0.1), jnp.asarray(f32(3) * 0.1),
    )
    head_bf = tuple(hh.astype(jnp.bfloat16) for hh in head32)
    got = head_pf(pack_pf(x, 8), *head_bf, H, W)
    want = _xla_head(x.astype(jnp.float32), head32)
    _stats_assert(got, want, max_rel=0.04, mean_rel=0.004)
