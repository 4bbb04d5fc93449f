"""MV rasterizer parity tests with hand-computed fixtures.

Covers the reference loader's quirks (loading_ipb.py:137-185): P-frame
reversal into the previous frame's backward channels at the matched
location, the B-run p_offset bookkeeping, overwrite ordering, motion/scale
division, and partition one-hot channels by block area.
"""

import numpy as np

from pnp_vcve_tpu.data import rasterize_clip, rasterize_frame_mvs


def rec(direction, w, h, x_w, y_w, x, y, mx, my, scale=4.0):
    return [direction, w, h, x_w, y_w, x, y, mx, my, scale]


def test_forward_mv_written_to_current_frame():
    r = np.array([rec(-1, 16, 16, 0, 0, 8, 8, 8.0, -4.0)])
    mv, par = rasterize_frame_mvs(r, 32, 32, False, [], 1)
    # block [0:16, 0:16], motion / scale = (2.0, -1.0)
    assert mv[0, 0, 0] == 2.0 and mv[0, 0, 1] == -1.0
    assert mv[15, 15, 0] == 2.0
    assert mv[16, 16, 0] == 0.0
    assert np.all(mv[..., 2:] == 0)
    # 16x16 block -> partition channel 0
    assert par[0, 0, 0] == 1.0 and par[0, 0, 1] == 0.0


def test_b_frame_backward_mv():
    r = np.array([rec(+1, 8, 8, 0, 0, 4, 4, 4.0, 4.0)])
    mv, par = rasterize_frame_mvs(r, 16, 16, True, [], 1)
    assert mv[0, 0, 2] == 1.0 and mv[0, 0, 3] == 1.0
    assert np.all(mv[..., :2] == 0)
    # 8x8 block -> channel 2
    assert par[0, 0, 2] == 1.0


def test_16x8_partition_channel():
    r = np.array([rec(-1, 16, 8, 0, 0, 8, 4, 0.0, 0.0)])
    _, par = rasterize_frame_mvs(r, 16, 16, False, [], 1)
    assert par[0, 0, 1] == 1.0
    r2 = np.array([rec(-1, 8, 16, 0, 0, 4, 8, 0.0, 0.0)])
    _, par2 = rasterize_frame_mvs(r2, 16, 16, False, [], 1)
    assert par2[0, 0, 1] == 1.0  # 8x16 also area 128 -> channel 1


def test_p_frame_reversal_into_previous_frame():
    # frame 0: I (no records); frame 1: P with a forward MV pointing back
    recs = [
        np.zeros((0, 10), np.float32),
        np.array([rec(+1, 16, 16, 8, 8, 8, 8, 8.0, 12.0)]),
    ]
    mvs, pars = rasterize_clip(recs, ["I", "P"], 32, 32)
    # reversal lands in frame 0's backward channels at the matched block
    assert mvs[0][0, 0, 2] == -2.0 and mvs[0][0, 0, 3] == -3.0
    # P frame's own map untouched by the direction>0 record
    assert np.all(mvs[1] == 0)
    # but the partition IS written on the P frame itself
    assert pars[1][0, 0, 0] == 1.0
    assert np.all(pars[0] == 0)


def test_p_offset_across_b_run():
    # I B B P: the P frame's reversal must land in the *I* frame (offset 3)
    recs = [
        np.zeros((0, 10), np.float32),
        np.zeros((0, 10), np.float32),
        np.zeros((0, 10), np.float32),
        np.array([rec(+1, 16, 16, 8, 8, 24, 8, 4.0, 0.0)]),
    ]
    mvs, _ = rasterize_clip(recs, ["I", "B", "B", "P"], 32, 32)
    assert mvs[0][0, 0, 2] == -1.0  # I frame got the reversed flow
    assert np.all(mvs[1] == 0) and np.all(mvs[2] == 0)


def test_p_offset_resets_after_p():
    # I P P: second P reverses into the first P (offset 1)
    recs = [
        np.zeros((0, 10), np.float32),
        np.zeros((0, 10), np.float32),
        np.array([rec(+1, 16, 16, 8, 8, 8, 8, 4.0, 0.0)]),
    ]
    mvs, _ = rasterize_clip(recs, ["I", "P", "P"], 32, 32)
    assert mvs[1][0, 0, 2] == -1.0
    assert np.all(mvs[0] == 0)


def test_overwrite_ordering_last_record_wins():
    r = np.array(
        [
            rec(-1, 16, 16, 0, 0, 8, 8, 8.0, 0.0),
            rec(-1, 8, 8, 0, 0, 4, 4, 16.0, 0.0),
        ]
    )
    mv, par = rasterize_frame_mvs(r, 32, 32, False, [], 1)
    assert mv[0, 0, 0] == 4.0  # overwritten by the later 8x8 record
    assert mv[12, 12, 0] == 2.0  # outside the 8x8 block: first record's value
    # partition channels are cumulative one-hots (both set where overlapped)
    assert par[0, 0, 0] == 1.0 and par[0, 0, 2] == 1.0


def test_non_drconv_partition_value():
    r = np.array([rec(-1, 16, 8, 0, 0, 8, 4, 0.0, 0.0)])
    _, par = rasterize_frame_mvs(r, 16, 16, False, [], 1, drconv=False)
    assert par.shape == (16, 16, 1)
    np.testing.assert_allclose(par[0, 0, 0], 255.0 / 128.0 * 64.0)


def test_qp_slice_lookup(tmp_path):
    import json
    from pnp_vcve_tpu.data import QpSliceLookup

    sidecar = {
        "crf15": {"000": {"0": {"QP": 17.0, "slice": "I"}, "1": {"QP": 20.0, "slice": "B"}}}
    }
    p = tmp_path / "qp.json"
    p.write_text(json.dumps(sidecar))

    lut = QpSliceLookup(p)
    assert lut(15, "000", 0) == (17.0, "I")
    assert lut(15, "000", 1) == (20.0, "B")
    assert lut(0, "000", 0) == (0.0, "I")
    assert lut(0, "000", 5) == (0.0, "P")

    lut_ipb = QpSliceLookup(p, replace_qp_with_ipb=True)
    assert lut_ipb(15, "000", 1) == (float(ord("B")), "B")
    assert lut_ipb(0, "000", 0) == (float(ord("I")), "I")


def test_native_rasterizer_matches_numpy():
    """The C rasterizer must be bit-identical to the numpy reference on
    randomized clips (including P-frame reversal and overwrite order)."""
    import pytest
    from pnp_vcve_tpu.native import native_rasterizer, rasterize_frame_native
    from pnp_vcve_tpu.data.mv_raster import rasterize_frame_mvs

    if native_rasterizer() is None:
        pytest.skip("no C compiler available")

    rng = np.random.default_rng(9)
    h = w = 64
    slice_types = ["I", "P", "B", "B", "P", "B", "P"]
    mvs_np, mvs_c = [], []
    p_offset = 0
    for st in slice_types:
        n = int(rng.integers(0, 30))
        recs = np.zeros((n, 10), np.float32)
        for k in range(n):
            bw, bh = rng.choice([8, 16]), rng.choice([8, 16])
            if bw == 8 and bh == 16:
                bw = 16  # keep areas in {256,128,64}: 16x16,16x8,8x8
            x = int(rng.integers(0, w // 8)) * 8 + bw // 2
            y = int(rng.integers(0, h // 8)) * 8 + bh // 2
            xw = int(rng.integers(0, w // 8)) * 8 + bw // 2
            yw = int(rng.integers(0, h // 8)) * 8 + bh // 2
            direction = -1 if (st == "I" or rng.random() < 0.5) else 1
            recs[k] = [direction, bw, bh, xw, yw, x, y,
                       float(rng.integers(-32, 32)), float(rng.integers(-32, 32)), 4.0]
        is_b = st == "B"
        a = rasterize_frame_mvs(recs, h, w, is_b, mvs_np, p_offset)
        b = rasterize_frame_native(recs, h, w, is_b, mvs_c, p_offset)
        mvs_np.append(a[0]); mvs_c.append(b[0])
        np.testing.assert_array_equal(a[1], b[1])
        p_offset = p_offset + 1 if is_b else 1
    for a, b in zip(mvs_np, mvs_c):
        np.testing.assert_array_equal(a, b)
