"""Op-level parity tests against torch CPU oracles.

torch here is a test oracle only (grid_sample / conv2d / pixel_shuffle /
interpolate are the primitives the reference model is built on); the
framework itself never imports torch.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from pnp_vcve_tpu.ops import (  # noqa: E402
    flow_warp,
    mix_expert_kernels,
    dynamic_conv2d,
    conv2d_nhwc,
    pixel_shuffle,
    bilinear_resize,
)


def torch_flow_warp(x_nchw, flow_nhwc2, interpolation="bilinear"):
    """Reference-protocol warp: unnormalized flow + grid_sample a_c=True."""
    n, c, h, w = x_nchw.shape
    grid_y, grid_x = torch.meshgrid(
        torch.arange(h, dtype=x_nchw.dtype),
        torch.arange(w, dtype=x_nchw.dtype),
        indexing="ij",
    )
    grid = torch.stack((grid_x, grid_y), 2)
    gf = grid[None] + flow_nhwc2
    gx = 2.0 * gf[..., 0] / max(w - 1, 1) - 1.0
    gy = 2.0 * gf[..., 1] / max(h - 1, 1) - 1.0
    return F.grid_sample(
        x_nchw,
        torch.stack((gx, gy), dim=3),
        mode=interpolation,
        padding_mode="zeros",
        align_corners=True,
    )


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("interp", ["bilinear", "nearest"])
def test_flow_warp_matches_grid_sample(rng, interp):
    n, h, w, c = 2, 12, 17, 5
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    # flows large enough to push some samples out of bounds
    flow = (rng.standard_normal((n, h, w, 2)) * 4.0).astype(np.float32)

    ours = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow), interp))

    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = (
        torch_flow_warp(x_t, torch.from_numpy(flow), interp)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, expected, atol=2e-5, rtol=1e-5)


def test_flow_warp_zero_flow_identity(rng):
    x = rng.standard_normal((1, 8, 8, 3)).astype(np.float32)
    out = np.asarray(flow_warp(jnp.asarray(x), jnp.zeros((1, 8, 8, 2))))
    np.testing.assert_allclose(out, x, atol=1e-6)


def test_dynamic_conv_matches_groups_batch_trick(rng):
    """Our einsum-mix + shifted-matmul == the reference cuDNN groups=batch trick."""
    b, h, w, cin, cout, K = 3, 10, 12, 8, 8, 6
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    bank_oihw = rng.standard_normal((K, cout, cin, 3, 3)).astype(np.float32) * 0.1
    bias_bank = rng.standard_normal((K, cout)).astype(np.float32) * 0.1
    weights = rng.standard_normal((b, K)).astype(np.float32)
    gamma = rng.random((b, cout)).astype(np.float32)

    # torch oracle: the exact groups=batch formulation of the reference
    # (sr_backbone_utils.py:166-209)
    xt = torch.from_numpy(x).permute(0, 3, 1, 2).reshape(1, -1, h, w)
    wt = torch.from_numpy(weights)
    bank_t = torch.from_numpy(bank_oihw).reshape(K, -1)
    agg_w = torch.mm(wt, bank_t).view(-1, cin, 3, 3)
    agg_b = torch.mm(wt, torch.from_numpy(bias_bank)).view(-1)
    out_t = F.conv2d(xt, agg_w, agg_b, padding=1, groups=b)
    out_t = out_t.view(b, cout, h, w)
    out_t = out_t * torch.from_numpy(gamma)[:, :, None, None]
    expected = out_t.permute(0, 2, 3, 1).numpy()

    # ours: bank in (K, kh, kw, cin, cout)
    bank_hwio = jnp.asarray(bank_oihw.transpose(0, 3, 4, 2, 1))
    kernels, biases = mix_expert_kernels(
        jnp.asarray(weights), bank_hwio, jnp.asarray(bias_bank)
    )
    ours = np.asarray(
        dynamic_conv2d(jnp.asarray(x), kernels, biases, gamma=jnp.asarray(gamma))
    )
    np.testing.assert_allclose(ours, expected, atol=3e-5, rtol=1e-4)


def test_conv2d_nhwc_matches_torch(rng):
    b, h, w, cin, cout = 2, 9, 11, 4, 7
    x = rng.standard_normal((b, h, w, cin)).astype(np.float32)
    k_oihw = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
    bias = rng.standard_normal((cout,)).astype(np.float32)
    expected = (
        F.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(k_oihw),
            torch.from_numpy(bias),
            padding=1,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    k_hwio = jnp.asarray(k_oihw.transpose(2, 3, 1, 0))
    ours = np.asarray(conv2d_nhwc(jnp.asarray(x), k_hwio, jnp.asarray(bias)))
    np.testing.assert_allclose(ours, expected, atol=3e-5, rtol=1e-4)


def test_pixel_shuffle_matches_torch(rng):
    n, h, w, r, cout = 2, 5, 6, 2, 3
    x = rng.standard_normal((n, h, w, cout * r * r)).astype(np.float32)
    expected = (
        F.pixel_shuffle(torch.from_numpy(x).permute(0, 3, 1, 2), r)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_bilinear_resize_matches_torch(rng):
    n, h, w, c = 1, 7, 9, 3
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    expected = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=4,
            mode="bilinear",
            align_corners=False,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    ours = np.asarray(bilinear_resize(jnp.asarray(x), 4))
    np.testing.assert_allclose(ours, expected, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("impl", ["padgather", "blockgather", "corner"])
def test_flow_warp_impls_match_oracle(rng, impl):
    n, h, w, c = 2, 10, 14, 4
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    # include far out-of-bounds flows and exact-boundary hits
    flow = (rng.standard_normal((n, h, w, 2)) * 10.0).astype(np.float32)
    flow[0, 0, 0] = [100.0, 100.0]
    flow[0, 1, 1] = [-50.0, 3.0]
    flow[0, 2, 2] = [0.0, 0.0]
    ours = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow), impl=impl))
    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = (
        torch_flow_warp(x_t, torch.from_numpy(flow), "bilinear")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(ours, expected, atol=2e-5, rtol=1e-5)


def test_dwt_iwt_roundtrip_and_torch_parity(rng):
    from pnp_vcve_tpu.ops.wavelet import dwt, iwt

    x = rng.standard_normal((2, 8, 12, 5)).astype(np.float32)
    d = np.asarray(dwt(jnp.asarray(x)))
    assert d.shape == (2, 4, 6, 20)

    # torch-convention oracle (wavelet_util.py:20-33) on NCHW
    xt = x.transpose(0, 3, 1, 2)
    x01 = xt[:, :, 0::2, :] / 2
    x02 = xt[:, :, 1::2, :] / 2
    x1, x2 = x01[:, :, :, 0::2], x02[:, :, :, 0::2]
    x3, x4 = x01[:, :, :, 1::2], x02[:, :, :, 1::2]
    expected = np.concatenate(
        [x1 + x2 + x3 + x4, -x1 - x2 + x3 + x4, -x1 + x2 - x3 + x4, x1 - x2 - x3 + x4],
        axis=1,
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(d, expected, atol=1e-6)

    # exact invertibility
    r = np.asarray(iwt(jnp.asarray(d)))
    np.testing.assert_allclose(r, x, atol=1e-6)


def test_flow_warp_block8_matches_oracle_on_block_flows(rng):
    """block8 == grid_sample exactly for 8x8-block-constant flows (the MV
    rasterizer's structure), incl. borders and huge displacements."""
    n, h, w, c = 2, 24, 32, 5
    x = rng.standard_normal((n, h, w, c)).astype(np.float32)
    fb = (rng.standard_normal((n, h // 8, w // 8, 2)) * 9).astype(np.float32)
    fb[0, 0, 0] = [300.0, -200.0]   # fully outside -> zeros
    fb[0, 1, 1] = [-3.25, 2.5]      # fractional, near border
    fb[0, 2, 0] = [0.0, 0.0]
    flow = np.repeat(np.repeat(fb, 8, axis=1), 8, axis=2)

    expected = (
        torch_flow_warp(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(flow),
            "bilinear",
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    got = np.asarray(flow_warp(jnp.asarray(x), jnp.asarray(flow), impl="block8"))
    np.testing.assert_allclose(got, expected, atol=2e-5, rtol=1e-5)

    # non-8-divisible sizes fall back to the generic path (still exact)
    got2 = np.asarray(
        flow_warp(jnp.asarray(x[:, :20, :28]), jnp.asarray(flow[:, :20, :28]),
                  impl="block8")
    )
    exp2 = (
        torch_flow_warp(
            torch.from_numpy(x[:, :20, :28]).permute(0, 3, 1, 2),
            torch.from_numpy(flow[:, :20, :28]), "bilinear",
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got2, exp2, atol=2e-5, rtol=1e-5)


def test_fused_bias_leakyrelu(rng):
    from pnp_vcve_tpu.ops.stylegan2 import fused_bias_leakyrelu

    x = rng.standard_normal((2, 4, 4, 3)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    got = np.asarray(fused_bias_leakyrelu(jnp.asarray(x), jnp.asarray(b)))
    y = x + b
    expected = (2**0.5) * np.where(y >= 0, y, 0.2 * y)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_upfirdn2d_matches_manual(rng):
    """upfirdn2d == zero-upsample, pad, correlate, downsample (manual numpy
    reference of the official op)."""
    from pnp_vcve_tpu.ops.stylegan2 import make_resample_kernel, upfirdn2d

    x = rng.standard_normal((1, 6, 6, 2)).astype(np.float32)
    k = make_resample_kernel([1, 3, 3, 1])
    up, down, pad = 2, 1, (2, 1)

    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(k), up, down, pad))

    # manual reference
    n, h, w, c = x.shape
    ups = np.zeros((n, h * up, w * up, c), np.float32)
    ups[:, ::up, ::up] = x
    p = np.pad(ups, ((0, 0), (pad[0], pad[1]), (pad[0], pad[1]), (0, 0)))
    kh, kw = k.shape
    oh, ow = p.shape[1] - kh + 1, p.shape[2] - kw + 1
    ref = np.zeros((n, oh, ow, c), np.float32)
    for i in range(oh):
        for j in range(ow):
            ref[:, i, j] = np.einsum(
                "nijc,ij->nc", p[:, i : i + kh, j : j + kw], k
            )
    ref = ref[:, ::down, ::down]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_block8_separable_weights_match_padgather(rng):
    """block8 with SEPARABLE per-block weight vectors == the generic
    per-pixel padgather on block-constant flows (incl. fully-out-of-frame
    and partially visible blocks)."""
    from pnp_vcve_tpu.ops.warp import (
        _warp_single_block8,
        _warp_single_padgather,
    )

    h, w, c = 16, 24, 8
    x = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    fb = (rng.standard_normal((h // 8, w // 8, 2)) * 5).astype(np.float32)
    fb[0, 0] = (40.0, -40.0)   # fully out of frame -> zero output
    fb[1, 0] = (-3.3, 6.7)     # partially visible at the bottom-left
    flow = jnp.asarray(np.repeat(np.repeat(fb, 8, 0), 8, 1))

    ref = _warp_single_padgather(x, flow, False)
    got = _warp_single_block8(x, flow)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("border", [False, True])
def test_padgather_custom_vjp_matches_autodiff(rng, border):
    """The scatter-free warp backward (sort + prefix-sum segment reads,
    ops/warp.py _padgather_bwd) == autodiff of the plain gather forward
    for BOTH cotangents (features and flow). The custom path exists
    because XLA's scatter-add adjoint updates serially on TPU — measured
    ~9.4 s of a 10.7 s flagship train step at the reference recipe shape
    (5 clips x 15 frames, 128x128 crops)."""
    from pnp_vcve_tpu.ops.warp import (
        _warp_single_padgather,
        _warp_single_padgather_impl,
    )

    h, w, c = 16, 24, 6
    x = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))
    flow = jnp.asarray(rng.uniform(-6, 6, (h, w, 2)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((h, w, c)).astype(np.float32))

    out1, pull1 = jax.vjp(
        lambda a, f: _warp_single_padgather(a, f, border), x, flow
    )
    out2, pull2 = jax.vjp(
        lambda a, f: _warp_single_padgather_impl(a, f, border), x, flow
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    dx1, df1 = pull1(g)
    dx2, df2 = pull2(g)
    np.testing.assert_allclose(
        np.asarray(dx1), np.asarray(dx2), atol=1e-5, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(df1), np.asarray(df2), atol=1e-5, rtol=1e-5
    )
