"""Torch-oracle parity for the baseline converters: the reference's real
SPyNet / STDFNet / BasicVSR++-PQF code (run on CPU via the tests/oracle
mmcv shim) with random weights, converted through core/convert_baselines,
must match our JAX models to float tolerance."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from pnp_vcve_tpu.core.convert_baselines import (
    convert_bvpp_pqf,
    convert_spynet,
    convert_stdf,
)

from tests.oracle.loader import load_ref


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _nhwc(x):
    return jnp.asarray(np.moveaxis(x.numpy(), -3, -1))


def test_spynet_matches_reference_code():
    mod = load_ref("mmedit.models.backbones.sr_backbones.basicvsr_net")
    torch.manual_seed(0)
    ref = mod.SPyNet(pretrained=None).eval()

    g = torch.Generator().manual_seed(1)
    # non-multiple-of-32 size exercises the resize-in/resize-out path
    a = torch.rand(2, 3, 48, 40, generator=g)
    b = torch.rand(2, 3, 48, 40, generator=g)
    with torch.no_grad():
        expected = ref(a, b).numpy()  # (n, 2, h, w)

    from pnp_vcve_tpu.models.spynet import SPyNet

    params = convert_spynet(_sd(ref))
    flow = SPyNet().apply({"params": params}, _nhwc(a), _nhwc(b))
    got = np.moveaxis(np.asarray(flow), -1, 1)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)


def test_stdf_matches_reference_code():
    mod = load_ref("mmedit.models.backbones.sr_backbones.stdf")
    torch.manual_seed(0)
    ref = mod.STDFNet().eval()

    g = torch.Generator().manual_seed(1)
    x = torch.rand(1, 7, 3, 32, 32, generator=g)
    with torch.no_grad():
        expected = ref(x).numpy()  # (n, c, h, w) center frame

    from pnp_vcve_tpu.models.baselines.stdf import STDFNet

    params = convert_stdf(_sd(ref), nb=3, nb_qe=6)
    out = STDFNet().apply({"params": params}, _nhwc(x))
    got = np.moveaxis(np.asarray(out), -1, 1)
    np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-4)


_VARIANTS = {
    "base": "BasicVSRPlusPlus_PQF",
    "v2": "BasicVSRPlusPlus_PQF_v2",
    "v2_withB_skip": "BasicVSRPlusPlus_PQF_v2_withB_skip",
    "v2_onlyB_skip": "BasicVSRPlusPlus_PQF_v2_onlyB_skip",
}


@pytest.mark.parametrize("variant", sorted(_VARIANTS))
def test_bvpp_pqf_matches_reference_code(variant):
    mod = load_ref("mmedit.models.backbones.sr_backbones.basicvsr_pp_v2")
    torch.manual_seed(0)
    ref = getattr(mod, _VARIANTS[variant])(
        mid_channels=32, num_blocks=2, spynet_pretrained=None
    ).eval()

    g = torch.Generator().manual_seed(2)
    b, t, h, w = 1, 5, 64, 64
    lqs = torch.rand(b, t, 3, h, w, generator=g)
    slices = torch.tensor([[73.0, 66.0, 80.0, 66.0, 80.0]][:b]).view(b, t, 1, 1, 1)
    qps = torch.rand(b, t, 1, 1, 1, generator=g)
    with torch.no_grad():
        expected = ref(lqs, qps, slices).numpy()  # (n, t, 3, 4h, 4w)

    from pnp_vcve_tpu.models.baselines.basicvsr_pp import BasicVSRPlusPlusPQF

    params = convert_bvpp_pqf(_sd(ref), num_blocks=2)
    model = BasicVSRPlusPlusPQF(mid_channels=32, num_blocks=2, variant=variant)
    out = model.apply(
        {"params": params},
        _nhwc(lqs),
        qps=jnp.asarray(qps.numpy()[:, :, 0, 0, 0]),
        slices=jnp.asarray(slices.numpy()[:, :, 0, 0, 0]),
    )
    got = np.moveaxis(np.asarray(out), -1, 2)
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


def test_bvpp_vanilla_matches_reference_code():
    """Vanilla BasicVSR++ (reference basicvsr_pp.py:17-383) with random
    weights == our BasicVSRPlusPlus through convert_bvpp_pqf (identical
    parameter layout across the family)."""
    mod = load_ref("mmedit.models.backbones.sr_backbones.basicvsr_pp")
    torch.manual_seed(0)
    ref = mod.BasicVSRPlusPlus(
        mid_channels=32, num_blocks=2, spynet_pretrained=None
    ).eval()

    g = torch.Generator().manual_seed(2)
    b, t, h, w = 1, 5, 64, 64
    lqs = torch.rand(b, t, 3, h, w, generator=g)
    with torch.no_grad():
        expected = ref(lqs).numpy()  # (n, t, 3, 4h, 4w)

    from pnp_vcve_tpu.models.baselines.basicvsr_pp import BasicVSRPlusPlus

    params = convert_bvpp_pqf(_sd(ref), num_blocks=2)
    model = BasicVSRPlusPlus(mid_channels=32, num_blocks=2)
    out = model.apply({"params": params}, _nhwc(lqs))
    got = np.moveaxis(np.asarray(out), -1, 2)
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)


def test_bvpp_vanilla_mirror_extended_matches_reference_code():
    """Mirror-extended input: the reference detects it at runtime and reuses
    flipped backward flows (basicvsr_pp.py:113-127,152-153); we pass the
    host-side flag (train/eval.py is_mirror_extended)."""
    mod = load_ref("mmedit.models.backbones.sr_backbones.basicvsr_pp")
    torch.manual_seed(0)
    ref = mod.BasicVSRPlusPlus(
        mid_channels=32, num_blocks=2, spynet_pretrained=None
    ).eval()

    g = torch.Generator().manual_seed(3)
    b, t2, h, w = 1, 3, 64, 64
    half = torch.rand(b, t2, 3, h, w, generator=g)
    lqs = torch.cat([half, torch.flip(half, dims=(1,))], dim=1)
    with torch.no_grad():
        expected = ref(lqs).numpy()
    assert ref.is_mirror_extended  # the oracle actually took the mirror path

    from pnp_vcve_tpu.models.baselines.basicvsr_pp import BasicVSRPlusPlus

    params = convert_bvpp_pqf(_sd(ref), num_blocks=2)
    model = BasicVSRPlusPlus(mid_channels=32, num_blocks=2)
    out = model.apply({"params": params}, _nhwc(lqs), is_mirror_extended=True)
    got = np.moveaxis(np.asarray(out), -1, 2)
    np.testing.assert_allclose(got, expected, atol=5e-4, rtol=1e-4)
