"""PIPELINES registry + Compose: config-driven stage composition.

Reference contract (mmedit/datasets/pipelines/compose.py:10-54 via
build_from_cfg): every stage builds by name from the registry, unknown
types error, and the config's order/parameters are what executes.
"""

import numpy as np
import pytest

from pnp_vcve_tpu.core.builder import DATASETS
from pnp_vcve_tpu.core.presets import mix_pipeline
from pnp_vcve_tpu.data.compose import PIPELINES, Compose

from test_e2e import dataset_root, make_train_dataset  # noqa: F401


def _sample(h=12, w=10, t=3):
    rng = np.random.default_rng(0)
    return {
        "lq": rng.integers(0, 256, (t, h, w, 3)).astype(np.float32),
        "gt": rng.integers(0, 256, (t, h, w, 3)).astype(np.float32),
        "mvs": rng.normal(size=(t, h, w, 4)).astype(np.float32),
        "partitions": rng.integers(0, 2, (t, h, w, 3)).astype(np.float32) * 255,
        "qps": np.arange(t, dtype=np.float32),
        "base_qps": np.full(t, 25.0, np.float32),
        "slices": np.full(t, 73.0, np.float32),
    }


def test_unknown_stage_raises():
    with pytest.raises(KeyError, match="NotARealStage"):
        Compose([dict(type="NotARealStage", ratio=1.0)])


def test_unknown_param_raises():
    # build_from_cfg passes cfg as kwargs: an unexpected kwarg errors
    with pytest.raises(TypeError):
        Compose([dict(type="Flip", flip_probability=0.5)])


def test_non_dict_non_callable_raises():
    with pytest.raises(TypeError, match="dict or callable"):
        Compose([42])


def test_flip_ratio_and_keys_honored():
    s = _sample()
    lq0 = s["lq"].copy()
    # ratio 0 -> never flips
    c = Compose([dict(type="Flip", keys=["lq"], flip_ratio=0.0, direction="horizontal")])
    out = c.apply_sample(dict(s), np.random.default_rng(1))
    np.testing.assert_array_equal(out["lq"], lq0)
    # ratio 1 -> always flips, and only the configured keys
    c = Compose([dict(type="Flip", keys=["lq"], flip_ratio=1.0, direction="horizontal")])
    out = c.apply_sample({k: v.copy() for k, v in s.items()}, np.random.default_rng(1))
    np.testing.assert_array_equal(out["lq"], lq0[:, :, ::-1])
    np.testing.assert_array_equal(out["gt"], s["gt"])  # gt untouched


def test_stage_order_is_config_order():
    # crop-then-rescale vs rescale-then-crop with the same rng draws give
    # the same crop window; dropping RescaleToZeroOne entirely leaves uint8
    # ranges — proving the list is executed, not pattern-matched.
    s = _sample(h=16, w=16)
    with_rescale = Compose([
        dict(type="RescaleToZeroOne", keys=["lq", "gt"]),
        dict(type="PairedRandomCrop_mv", gt_patch_size=8),
    ])
    without = Compose([dict(type="PairedRandomCrop_mv", gt_patch_size=8)])
    a = with_rescale.apply_sample({k: v.copy() for k, v in s.items()},
                                  np.random.default_rng(3))
    b = without.apply_sample({k: v.copy() for k, v in s.items()},
                             np.random.default_rng(3))
    assert a["lq"].max() <= 1.0
    assert b["lq"].max() > 1.5  # still 0..255
    np.testing.assert_allclose(a["lq"], b["lq"] / 255.0, rtol=1e-6)


def test_transpose_quirk_and_opt_out():
    s = _sample(h=6, w=9)
    # reference quirk: transpose unconditional regardless of ratio
    c = Compose([dict(type="RandomTransposeHW", keys=["lq"], transpose_ratio=0.0)])
    out = c.apply_sample({k: v.copy() for k, v in s.items()}, np.random.default_rng(0))
    assert out["lq"].shape == (3, 9, 6, 3)
    # opt-out restores the documented probabilistic behavior
    c = Compose([dict(type="RandomTransposeHW", keys=["lq"], transpose_ratio=0.0,
                      always_transpose=False)])
    out = c.apply_sample({k: v.copy() for k, v in s.items()}, np.random.default_rng(0))
    assert out["lq"].shape == (3, 6, 9, 3)


def test_collect_and_frames_to_tensor():
    s = _sample()
    c = Compose([
        dict(type="FramesToTensor", keys=["lq", "gt", "QPs", "base_QPs"]),
        dict(type="Collect", keys=["lq", "gt", "QPs"]),
    ])
    out = c.apply_sample(dict(s), np.random.default_rng(0))
    assert set(out) == {"lq", "gt", "qps"}
    with pytest.raises(KeyError, match="not in sample"):
        Compose([dict(type="FramesToTensor", keys=["nope"])]).apply_sample(
            dict(s), np.random.default_rng(0))


def test_temporal_reverse_reverses_indices():
    c = Compose([
        dict(type="GenerateSegmentIndices_Mix_Compress", interval_list=[1]),
        dict(type="TemporalReverse", keys=["lq_path", "gt_path"], reverse_ratio=1.0),
    ])
    plan = c.apply_index(sequence_length=10, num_input_frames=4,
                         rng=np.random.default_rng(0))
    assert plan["reverse"] is True
    assert plan["lq_idxs"] == plan["gt_idxs"]
    assert plan["lq_idxs"] == sorted(plan["lq_idxs"], reverse=True)
    # ratio 0 never reverses, and the shipped-config bare-string key works
    c = Compose([
        dict(type="GenerateSegmentIndices_Mix_Compress", interval_list=[1]),
        dict(type="TemporalReverse", keys="lq_path", reverse_ratio=0.0),
    ])
    plan = c.apply_index(10, 4, np.random.default_rng(0))
    assert plan["reverse"] is False
    assert plan["lq_idxs"] == sorted(plan["lq_idxs"])


def test_dataset_respects_config_pipeline(dataset_root):  # noqa: F811
    """A re-parameterized pipeline changes the dataset's output stream."""
    from pnp_vcve_tpu.data.datasets import MixCompressTrainDataset

    base = mix_pipeline(str(dataset_root / "qp.json"))
    # keep geometry deterministic: drop flips + transpose, keep crop
    det = [st for st in base if st["type"] not in
           ("Flip", "RandomTransposeHW")]
    for st in det:
        if st["type"] == "PairedRandomCrop_mv":
            st["gt_patch_size"] = 8

    ds = make_train_dataset(dataset_root, transforms=Compose(det))
    s = ds.sample(np.random.default_rng(5))
    assert s["lq"].shape == (3, 8, 8, 3)  # config patch size, not the field's 16

    # reversed indices: TemporalReverse at ratio 1 flips the frame order
    rev = [dict(st) for st in det]
    for st in rev:
        if st["type"] == "TemporalReverse":
            st["reverse_ratio"] = 1.0
    ds_f = make_train_dataset(dataset_root, transforms=Compose(det))
    ds_r = make_train_dataset(dataset_root, transforms=Compose(rev))
    a = ds_f.sample(np.random.default_rng(7))
    b = ds_r.sample(np.random.default_rng(7))
    np.testing.assert_array_equal(a["lq"], b["lq"][::-1])
    np.testing.assert_array_equal(a["qps"], b["qps"][::-1])


def test_builder_routes_pipeline_through_registry(dataset_root):  # noqa: F811
    """DATASETS builders now reject configs with unknown pipeline stages."""
    cfg = dict(
        type="SRREDSMultipleGTMixCompressDataset",
        lq_folder=str(dataset_root / "crf15" / "png"),
        gt_folder=str(dataset_root / "sharp" / "png"),
        cprs15_folder=str(dataset_root / "crf15" / "png"),
        cprs25_folder=str(dataset_root / "crf25" / "png"),
        cprs35_folder=str(dataset_root / "crf35" / "png"),
        num_input_frames=3,
        pipeline=[dict(type="TotallyUnknownStage")],
        val_partition="REDS4",
        test_mode=True,
    )
    with pytest.raises(KeyError, match="TotallyUnknownStage"):
        DATASETS.build(cfg)


def test_shipped_preset_builds_and_samples(dataset_root):  # noqa: F811
    """The full shipped pipeline (incl. TemporalReverse/FramesToTensor/
    Collect) builds through the registry and produces training samples."""
    pipeline = mix_pipeline(str(dataset_root / "qp.json"))
    assert Compose(pipeline).loader_params()["gt_patch_size"] == 128
    for st in pipeline:  # shrink the crop to the fixture's 32x48 frames
        if st["type"] == "PairedRandomCrop_mv":
            st["gt_patch_size"] = 16
    tf = Compose(pipeline)
    assert len(tf.index_stages) == 2 and len(tf.load_stages) == 2
    ds = make_train_dataset(dataset_root, transforms=tf, gt_patch_size=999)
    s = ds.sample(np.random.default_rng(0))
    # patch size comes from the pipeline's crop stage, not the field
    assert s["lq"].shape == (3, 16, 16, 3)
    assert set(s) >= {"lq", "gt", "mvs", "qps", "base_qps", "partitions"}
