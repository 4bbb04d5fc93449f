"""End-to-end slice: synthetic dataset on disk -> loader -> train steps ->
full-clip eval with PSNR/SSIM. Exercises every layer together."""

import json

import jax.numpy as jnp

import numpy as np
import pytest
from PIL import Image

from pnp_vcve_tpu.data.datasets import (
    ClipIndex,
    CompressTestDataset,
    MixCompressTrainDataset,
)
from pnp_vcve_tpu.data.loader import PrefetchLoader, WeightedMixture, collate

T_FRAMES = 6
H, W = 32, 48


def _write_clip(root, crf, clip, n_frames, rng):
    png_dir = root / f"crf{crf}" / "png" / clip
    mv_dir = root / f"crf{crf}" / "mv" / clip
    png_dir.mkdir(parents=True, exist_ok=True)
    mv_dir.mkdir(parents=True, exist_ok=True)
    qp_entries = {}
    for i in range(n_frames):
        img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(png_dir / f"{i:08d}.png")
        # one MV record per frame: a 16x16 block with a small forward motion
        if i == 0:
            recs = np.zeros((0, 10), np.float32)
            st = "I"
        else:
            recs = np.array(
                [[-1, 16, 16, 8, 8, 8, 8, 4.0, -4.0, 4.0]], np.float32
            )
            st = "P" if i % 2 else "B"
        np.save(mv_dir / f"{i:08d}.npy", recs)
        qp_entries[str(i)] = {"QP": 20.0 + i, "slice": st}
    return qp_entries


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("reds_tiny")
    rng = np.random.default_rng(0)
    sidecar = {}
    for crf in (15, 25, 35):
        sidecar[f"crf{crf}"] = {}
        for clip in ("000", "001"):
            sidecar[f"crf{crf}"][clip] = _write_clip(root, crf, clip, T_FRAMES, rng)
    # gt frames
    for clip in ("000", "001"):
        gt_dir = root / "sharp" / "png" / clip
        gt_dir.mkdir(parents=True, exist_ok=True)
        for i in range(T_FRAMES):
            img = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
            Image.fromarray(img).save(gt_dir / f"{i:08d}.png")
    (root / "qp.json").write_text(json.dumps(sidecar))
    return root


def make_train_dataset(root, **over):
    kw = dict(
        lq_folder=str(root / "crf15" / "png"),
        gt_folder=str(root / "sharp" / "png"),
        cprs15_folder=str(root / "crf15" / "png"),
        cprs25_folder=str(root / "crf25" / "png"),
        cprs35_folder=str(root / "crf35" / "png"),
        qp_slice_file=str(root / "qp.json"),
        clips=[ClipIndex("000", T_FRAMES), ClipIndex("001", T_FRAMES)],
        num_input_frames=3,
        gt_patch_size=16,
    )
    kw.update(over)
    return MixCompressTrainDataset(**kw)


def test_train_sample_shapes_and_ranges(dataset_root):
    ds = make_train_dataset(dataset_root)
    s = ds.sample(np.random.default_rng(0))
    assert s["lq"].shape == (3, 16, 16, 3)
    assert s["gt"].shape == (3, 16, 16, 3)
    assert s["mvs"].shape == (3, 16, 16, 4)
    assert s["partitions"].shape == (3, 16, 16, 3)
    assert s["qps"].shape == (3,)
    assert 0 <= s["lq"].min() and s["lq"].max() <= 1.0
    # partitions rescaled to {0, 1/255} (reference quirk)
    vals = np.unique(s["partitions"])
    assert all(v in (0.0, pytest.approx(1 / 255)) for v in vals)
    # slices are raw ord codes
    assert set(np.unique(s["slices"])).issubset({66.0, 73.0, 80.0})


def test_crf_mixture_respects_ratios(dataset_root):
    ds = make_train_dataset(dataset_root)
    counts = {0: 0, 15: 0, 25: 0, 35: 0}
    for i in range(200):
        s = ds.sample(np.random.default_rng(i))
        counts[int(round(s["base_qps"][0] * 255))] += 1
    # data_ratio (0.2, 0.6, 0.85, 1.0) -> p = .2/.4/.25/.15
    assert counts[0] > 15 and counts[15] > 60 and counts[25] > 25 and counts[35] > 10


def test_loader_batches_and_is_deterministic(dataset_root):
    ds = make_train_dataset(dataset_root)
    mix = WeightedMixture([ds, ds], [1, 2])
    l1 = PrefetchLoader(mix, batch_size=2, seed=7, num_threads=2)
    b1 = next(iter(l1))
    l1.stop()
    l2 = PrefetchLoader(mix, batch_size=2, seed=7, num_threads=1)
    b2 = next(iter(l2))
    l2.stop()
    assert b1["lq"].shape == (2, 3, 16, 16, 3)
    np.testing.assert_array_equal(np.asarray(b1["lq"]), np.asarray(b2["lq"]))
    np.testing.assert_array_equal(np.asarray(b1["mvs"]), np.asarray(b2["mvs"]))
    # workers_per_gpu=0 (the reference's synchronous-DataLoader mode) must
    # not deadlock: the loader clamps to one worker thread
    l3 = PrefetchLoader(mix, batch_size=2, seed=7, num_threads=0)
    b3 = next(iter(l3))
    l3.stop()
    np.testing.assert_array_equal(np.asarray(b1["lq"]), np.asarray(b3["lq"]))


def test_end_to_end_train_and_eval(dataset_root):
    import jax
    import optax

    from pnp_vcve_tpu.models import PnPVCVE
    from pnp_vcve_tpu.models.restorer import Restorer
    from pnp_vcve_tpu.train import (
        charbonnier_loss,
        create_train_state,
        make_train_step,
    )
    from pnp_vcve_tpu.train.eval import evaluate_dataset

    ds = make_train_dataset(dataset_root)
    loader = PrefetchLoader(ds, batch_size=2, seed=0, num_threads=2)
    it = iter(loader)

    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=True)
    batch = next(it)
    params = model.init(
        jax.random.PRNGKey(0),
        lrs=batch["lq"], qps=batch["qps"], slices=batch["slices"],
        mvs=batch["mvs"], base_qps=batch["base_qps"], par_map=batch["partitions"],
    )["params"]
    state = create_train_state(params, optax.adam(1e-3))
    step = make_train_step(model, charbonnier_loss, donate=False)
    for _ in range(3):
        state, metrics = step(state, next(it))
    loader.stop()
    assert np.isfinite(float(metrics["loss"]))

    test_ds = CompressTestDataset(
        lq_folder=str(dataset_root / "crf15" / "png"),
        gt_folder=str(dataset_root / "sharp" / "png"),
        qp_slice_file=str(dataset_root / "qp.json"),
        clips=[ClipIndex("000", T_FRAMES)],
        num_input_frames=4,
    )
    assert test_ds.base_qp == 15
    restorer = Restorer(generator=model)
    agg = evaluate_dataset(restorer, state.params, test_ds, verbose=False)
    assert set(agg) == {"PSNR", "SSIM"}
    assert np.isfinite(agg["PSNR"])


def test_eval_chunked_matches_shape(dataset_root):
    import jax
    from pnp_vcve_tpu.models import PnPVCVE
    from pnp_vcve_tpu.train.eval import enhance_clip
    from pnp_vcve_tpu.train.train_step import make_eval_step

    test_ds = CompressTestDataset(
        lq_folder=str(dataset_root / "crf15" / "png"),
        gt_folder=str(dataset_root / "sharp" / "png"),
        qp_slice_file=str(dataset_root / "qp.json"),
        clips=[ClipIndex("000", T_FRAMES)],
        num_input_frames=6,
    )
    sample = test_ds.load_clip(0)
    model = PnPVCVE(mid_channels=8, num_blocks=1, num_experts=2, remat=False)
    batch = {
        k: np.asarray(sample[k][:3])[None]
        for k in ("lq", "qps", "slices", "mvs", "base_qps", "partitions")
    }
    params = model.init(
        jax.random.PRNGKey(0),
        lrs=batch["lq"], qps=batch["qps"], slices=batch["slices"],
        mvs=batch["mvs"], base_qps=batch["base_qps"], par_map=batch["partitions"],
    )["params"]
    step = make_eval_step(model)
    out = enhance_clip(step, params, sample, chunk_t=3)
    assert out.shape == (6, H, W, 3)


def test_ldp_triple_dataset(dataset_root):
    from pnp_vcve_tpu.data.datasets import ClipIndex
    from pnp_vcve_tpu.data.ldp import LDPTripleDataset, find_left_right_pqf

    # slice pattern from the fixture: I P B P B P (i even -> B for i>0 odd=P)
    # fixture: i==0 I; odd P; even>0 B
    def slice_of(i):
        return "I" if i == 0 else ("P" if i % 2 else "B")

    left, right = find_left_right_pqf(slice_of, 2, T_FRAMES)
    assert (left, right) == (1, 3)
    left, right = find_left_right_pqf(slice_of, 4, T_FRAMES)
    assert (left, right) == (3, 5)
    # uncompressed: adjacent frames
    assert find_left_right_pqf(slice_of, 0, T_FRAMES, compressed=False) == (0, 1)

    ds = LDPTripleDataset(
        lq_folder=str(dataset_root / "crf15" / "png"),
        gt_folder=str(dataset_root / "sharp" / "png"),
        cprs15_folder=str(dataset_root / "crf15" / "png"),
        cprs25_folder=str(dataset_root / "crf25" / "png"),
        cprs35_folder=str(dataset_root / "crf35" / "png"),
        qp_slice_file=str(dataset_root / "qp.json"),
        clips=[ClipIndex("000", T_FRAMES), ClipIndex("001", T_FRAMES)],
        centers="nonpqf",
        gt_patch_size=16,
    )
    s = ds.sample(np.random.default_rng(3))
    assert s["lq"].shape == (3, 16, 16, 3)
    assert s["gt"].shape == (1, 16, 16, 3)
    assert 0 <= s["lq"].min() and s["lq"].max() <= 1

    # test iteration covers every non-PQF center
    items = list(ds.iter_test(crf=15))
    # fixture: frames 2 and 4 are B in each of 2 clips
    assert len(items) == 4
    assert items[0]["lq"].shape[0] == 3


def test_center_frame_eval_with_stdf(dataset_root):
    import jax
    from pnp_vcve_tpu.data.datasets import ClipIndex
    from pnp_vcve_tpu.data.ldp import LDPTripleDataset
    from pnp_vcve_tpu.models.baselines import STDFNet
    from pnp_vcve_tpu.models.restorer import (
        CenterFrameRestorer,
        evaluate_center_frame_dataset,
    )

    ds = LDPTripleDataset(
        lq_folder=str(dataset_root / "crf15" / "png"),
        gt_folder=str(dataset_root / "sharp" / "png"),
        cprs15_folder=str(dataset_root / "crf15" / "png"),
        cprs25_folder=str(dataset_root / "crf25" / "png"),
        cprs35_folder=str(dataset_root / "crf35" / "png"),
        qp_slice_file=str(dataset_root / "qp.json"),
        clips=[ClipIndex("000", T_FRAMES)],
        centers="nonpqf",
        gt_patch_size=16,
    )
    model = STDFNet(radius=1, nf_stdf=4, nb_stdf=2, nf_stdf_out=4, nf_qe=4, nb_qe=1)
    s0 = next(iter(ds.iter_test(crf=15)))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(s0["lq"][None]))["params"]
    restorer = CenterFrameRestorer(generator=model)
    agg = evaluate_center_frame_dataset(
        restorer, params, ds.iter_test(crf=15), verbose=False
    )
    assert set(agg) == {"PSNR", "SSIM"}
    assert np.isfinite(agg["PSNR"])


def test_big_dataset_builder(dataset_root):
    """Multi-dataset 'Big' mixture (sr_big_dataset.py:6-87 semantics) +
    EDVR-window pipeline detection."""
    from pnp_vcve_tpu.core.builder import build_dataset

    root = str(dataset_root)
    roots = lambda sub: {"A": f"{root}/{sub}/png", "B": f"{root}/{sub}/png"}
    ds = build_dataset(
        dict(
            type="BigMultipleGTMixCompressDataset",
            lq_folder=roots("crf15"),
            gt_folder={"A": f"{root}/sharp/png", "B": f"{root}/sharp/png"},
            cprs15_folder=roots("crf15"),
            cprs25_folder=roots("crf25"),
            cprs35_folder=roots("crf35"),
            num_input_frames=3,
            sequence_length={"A": T_FRAMES, "B": T_FRAMES},
            pipeline=[
                dict(type="GenerateFrameIndicesEDVR_mix", interval_list=[1]),
                dict(
                    type="LoadImageFromFileList_Mix_Compress_ipb_mixdataset",
                    key="lq",
                    qp_slice_file={"A": str(dataset_root / "qp.json"),
                                   "B": str(dataset_root / "qp.json")},
                    data_ratio=[0.25, 0.5, 0.75, 1.0],
                ),
                dict(type="PairedRandomCrop_mv", gt_patch_size=16),
            ],
            scale=1,
        )
    )
    s = ds.sample(np.random.default_rng(0))
    assert s["lq"].shape == (3, 16, 16, 3)
    assert s["gt"].shape == (3, 16, 16, 3)


def test_ldp_builder_aliases(dataset_root):
    """LDPPQFDataset / LDPNonPQFDataset resolve through the registry with
    the right center class (MFQE two-model protocol, ldp_dataset.py)."""
    from pnp_vcve_tpu.core.builder import build_dataset

    common = dict(
        lq_folder=str(dataset_root / "crf15" / "png"),
        gt_folder=str(dataset_root / "sharp" / "png"),
        cprs15_folder=str(dataset_root / "crf15" / "png"),
        cprs25_folder=str(dataset_root / "crf25" / "png"),
        cprs35_folder=str(dataset_root / "crf35" / "png"),
        sequence_length=T_FRAMES,
        pipeline=[
            dict(type="LoadImageFromFileList_Mix_Compress_ipb", key="lq",
                 qp_slice_file=str(dataset_root / "qp.json")),
            dict(type="PairedRandomCrop_mv", gt_patch_size=16),
        ],
        scale=1,
    )
    pqf = build_dataset(dict(type="LDPPQFDataset", **common))
    non = build_dataset(dict(type="LDPNonPQFDataset", **common))
    assert pqf.centers == "pqf" and non.centers == "nonpqf"
    s = non.sample(np.random.default_rng(0))
    assert s["lq"].shape == (3, 16, 16, 3) and s["gt"].shape == (1, 16, 16, 3)
