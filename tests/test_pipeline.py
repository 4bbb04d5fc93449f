"""Transform pipeline tests (quirk parity)."""

import numpy as np
import pytest

from pnp_vcve_tpu.data.pipeline import (
    flip,
    generate_segment_indices,
    paired_random_crop_mv,
    random_transpose_hw,
    rescale_to_zero_one,
)


def make_sample(t=3, h=16, w=20, scale=1):
    rng = np.random.default_rng(0)
    return {
        "lq": rng.random((t, h, w, 3)).astype(np.float32),
        "gt": rng.random((t, h * scale, w * scale, 3)).astype(np.float32),
        "mvs": rng.standard_normal((t, h, w, 4)).astype(np.float32),
        "partitions": rng.random((t, h, w, 3)).astype(np.float32),
        "qps": np.ones(t, np.float32) * 30,
        "base_qps": np.ones(t, np.float32) * 15,
        "slices": np.array([73, 80, 66], np.float32),
    }


def test_rescale_touches_partitions_not_mvs():
    s = make_sample()
    mv_before = s["mvs"].copy()
    qp_before = s["qps"].copy()
    rescale_to_zero_one(s)
    np.testing.assert_array_equal(s["mvs"], mv_before)  # MVs stay in pixels
    np.testing.assert_allclose(s["qps"], qp_before / 255.0)
    assert s["base_qps"][0] == pytest.approx(15 / 255)


def test_crop_shares_window():
    s = make_sample()
    rng = np.random.default_rng(3)
    lq0, mv0, par0 = s["lq"].copy(), s["mvs"].copy(), s["partitions"].copy()
    paired_random_crop_mv(s, gt_patch_size=8, scale=1, rng=rng)
    assert s["lq"].shape == (3, 8, 8, 3)
    assert s["gt"].shape == (3, 8, 8, 3)
    assert s["mvs"].shape == (3, 8, 8, 4)
    # find the window from lq, confirm mvs/partitions used the same
    for top in range(9):
        for left in range(13):
            if np.array_equal(lq0[:, top : top + 8, left : left + 8], s["lq"]):
                np.testing.assert_array_equal(
                    mv0[:, top : top + 8, left : left + 8], s["mvs"]
                )
                np.testing.assert_array_equal(
                    par0[:, top : top + 8, left : left + 8], s["partitions"]
                )
                return
    pytest.fail("crop window not found")


def test_crop_scale_factor():
    s = make_sample(scale=4)
    paired_random_crop_mv(s, gt_patch_size=32, scale=4, rng=np.random.default_rng(0))
    assert s["lq"].shape == (3, 8, 8, 3)
    assert s["gt"].shape == (3, 32, 32, 3)


def test_flip_does_not_negate_mvs():
    s = make_sample()
    mv0 = s["mvs"].copy()
    flip(s, "horizontal", np.random.default_rng(0), ratio=1.0)
    # mirrored spatially, values unchanged in sign (reference quirk)
    np.testing.assert_array_equal(s["mvs"], mv0[:, :, ::-1])


def test_flip_respects_ratio_zero():
    s = make_sample()
    lq0 = s["lq"].copy()
    flip(s, "vertical", np.random.default_rng(0), ratio=0.0)
    np.testing.assert_array_equal(s["lq"], lq0)


def test_transpose_always_and_no_channel_swap():
    s = make_sample()
    mv0 = s["mvs"].copy()
    random_transpose_hw(s, np.random.default_rng(0), always_transpose=True)
    # transposed spatially, flow x/y channels NOT swapped (reference quirk)
    np.testing.assert_array_equal(s["mvs"], mv0.transpose(0, 2, 1, 3))
    assert s["lq"].shape == (3, 20, 16, 3)


def test_segment_indices_bounds():
    rng = np.random.default_rng(0)
    for _ in range(50):
        idxs = generate_segment_indices(100, 15, rng)
        assert len(idxs) == 15
        assert idxs[0] >= 0 and idxs[-1] <= 99
        assert all(b - a == 1 for a, b in zip(idxs, idxs[1:]))
    with pytest.raises(ValueError):
        generate_segment_indices(10, 15, rng)


def test_edvr_window_indices():
    """Center-frame window with border reroll (augmentation.py:960-1045)."""
    import numpy as np

    from pnp_vcve_tpu.data.pipeline import generate_edvr_window_indices

    rng = np.random.default_rng(0)
    for _ in range(200):
        idxs = generate_edvr_window_indices(20, 5, rng, interval_list=(1, 2, 3))
        assert len(idxs) == 5
        assert all(0 <= i <= 19 for i in idxs)
        d = np.diff(idxs)
        assert (d == d[0]).all() and d[0] in (1, 2, 3)
        # centered window: symmetric around the middle element
        assert idxs[2] - idxs[0] == idxs[4] - idxs[2]
