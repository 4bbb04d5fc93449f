"""Config-driven pipeline composition: the PIPELINES registry.

The reference builds every pipeline stage through a PIPELINES registry and
errors on unknown stage types (mmedit/datasets/pipelines/compose.py:10-54,
via mmcv ``build_from_cfg``). This module restores that contract for the
TPU rebuild: every stage in a config's ``pipeline=[...]`` list is built by
name from :data:`PIPELINES`; an unknown ``type`` raises ``KeyError`` listing
the known stages, and stage parameters (ratios, keys, patch sizes, order)
are honored as written instead of being keyword-scraped.

Stages run in three phases matching the host-side data flow (all of this is
numpy on the host — nothing here is traced by XLA):

- ``index`` stages produce or reorder the frame-index plan before any IO
  (GenerateSegmentIndices*, GenerateFrameIndicesEDVR_mix, TemporalReverse).
- ``load`` stages are declarative: they configure what the dataset reads
  from disk (which CRF buckets, QP/slice sidecar, MV/partition rasters).
  The dataset executes the IO; these stages carry the knobs.
- ``sample`` stages transform the loaded numpy Sample dict in config order
  (RescaleToZeroOne, PairedRandomCrop_mv, Flip, RandomTransposeHW,
  FramesToTensor, Collect).

Phase membership is a property of the stage type; within a phase, config
order is execution order — reordering or re-parameterizing a config changes
the produced stream, reference-faithfully.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pnp_vcve_tpu.core.registry import Registry
from pnp_vcve_tpu.data.pipeline import (
    RESCALE_KEYS,
    SPATIAL_KEYS,
    Sample,
    flip,
    generate_edvr_window_indices,
    generate_segment_indices,
    paired_random_crop_mv,
    random_transpose_hw,
    rescale_to_zero_one,
)

__all__ = ["PIPELINES", "Compose"]

PIPELINES = Registry("pipelines")

# Reference configs use mmedit's key spelling; the Sample dict is lowercase.
_KEYMAP = {"QPs": "qps", "base_QPs": "base_qps"}


def _map_keys(keys) -> tuple:
    if isinstance(keys, str):
        keys = [keys]
    return tuple(_KEYMAP.get(k, k) for k in keys)


# --------------------------------------------------------------------------
# index phase
# --------------------------------------------------------------------------


@PIPELINES.register(
    name="GenerateSegmentIndices_Mix_Compress",
    aliases=("GenerateSegmentIndices",),
)
class GenerateSegmentIndicesStage:
    """Random temporal window with random interval
    (reference augmentation.py:1450-1541)."""

    phase = "index"

    def __init__(self, interval_list=(1,), start_idx=0, filename_tmpl="{:08d}.png"):
        self.interval_list = tuple(interval_list)
        self.start_idx = start_idx
        self.filename_tmpl = filename_tmpl

    def __call__(self, plan: dict, rng: np.random.Generator) -> dict:
        idxs = generate_segment_indices(
            plan["sequence_length"],
            plan["num_input_frames"],
            rng,
            self.interval_list,
            self.start_idx,
        )
        plan["lq_idxs"] = list(idxs)
        plan["gt_idxs"] = list(idxs)
        return plan


@PIPELINES.register(name="GenerateFrameIndicesEDVR_mix")
class GenerateEDVRWindowStage:
    """EDVR center-frame window with border reroll
    (reference augmentation.py:960-1045)."""

    phase = "index"

    def __init__(self, interval_list=(1,), start_idx=0, filename_tmpl="{:08d}.png"):
        self.interval_list = tuple(interval_list)
        self.start_idx = start_idx
        self.filename_tmpl = filename_tmpl

    def __call__(self, plan: dict, rng: np.random.Generator) -> dict:
        idxs = generate_edvr_window_indices(
            plan["sequence_length"],
            plan["num_input_frames"],
            rng,
            self.interval_list,
            self.start_idx,
        )
        plan["lq_idxs"] = list(idxs)
        plan["gt_idxs"] = list(idxs)
        return plan


@PIPELINES.register(name="GenerateSegmentIndices_LR")
class GenerateTestIndicesStage:
    """Test-time whole-clip indices in order (reference augmentation.py
    GenerateSegmentIndices with the full sequence; used by test pipelines)."""

    phase = "index"

    def __init__(self, interval_list=(1,), start_idx=0, filename_tmpl="{:08d}.png"):
        self.interval_list = tuple(interval_list)
        self.start_idx = start_idx
        self.filename_tmpl = filename_tmpl

    def __call__(self, plan: dict, rng) -> dict:
        n = min(plan["num_input_frames"], plan["sequence_length"])
        idxs = [self.start_idx + i for i in range(n)]
        plan["lq_idxs"] = list(idxs)
        plan["gt_idxs"] = list(idxs)
        return plan


@PIPELINES.register(name="TemporalReverse")
class TemporalReverseStage:
    """Reverse frame lists with probability ``reverse_ratio``
    (reference augmentation.py:1408-1448). Runs on the index plan — before
    loading, like the reference (which reverses the path lists).

    The reference iterates ``keys`` directly, so a config passing a bare
    string (``keys='lq_path'``, as the shipped flagship configs do) would
    iterate characters and crash if ever triggered; it never triggers there
    because those configs set ``reverse_ratio=0``. We normalize a bare
    string to a one-element list instead of replicating the crash.
    """

    phase = "index"

    def __init__(self, keys=("lq_path", "gt_path"), reverse_ratio=0.5):
        self.keys = (keys,) if isinstance(keys, str) else tuple(keys)
        self.reverse_ratio = reverse_ratio

    def __call__(self, plan: dict, rng: np.random.Generator) -> dict:
        # consume the draw unconditionally (reference consumes
        # np.random.random() regardless of outcome)
        reverse = bool(rng.random() < self.reverse_ratio)
        if reverse:
            if "lq_path" in self.keys:
                plan["lq_idxs"] = list(reversed(plan["lq_idxs"]))
            if "gt_path" in self.keys:
                plan["gt_idxs"] = list(reversed(plan["gt_idxs"]))
        plan["reverse"] = reverse
        return plan


# --------------------------------------------------------------------------
# load phase (declarative; the dataset executes the IO)
# --------------------------------------------------------------------------


@PIPELINES.register(
    name="LoadImageFromFileList_Mix_Compress_ipb",
    aliases=("LoadImageFromFileList_ipb", "LoadImageFromFileList",
             "LoadImageFromFileList_Mix_Compress_ipb_mixdataset"),
)
class LoadImageListStage:
    """Frame-list loader config (reference loading.py:723 +
    loading_ipb.py:16-23). Declarative: carries the CRF-mixture ratios,
    QP/slice sidecar path, and which codec priors to load; the dataset
    performs the reads (PNG decode + MV rasterization)."""

    phase = "load"

    def __init__(
        self,
        io_backend="disk",
        key="gt",
        flag="color",
        channel_order="rgb",
        convert_to=None,
        save_original_img=False,
        use_cache=False,
        backend=None,
        random_compress=False,
        compress_ratio=0.5,
        load_qp_slice=False,
        load_base_qp=False,
        load_mv=False,
        qp_slice_file=None,
        dataset="reds",
        use_bi_infor=False,
        load_partition=False,
        replace_qp_withIPB=False,
        drconv=False,
        data_ratio=(0.2, 0.6, 0.85, 1.0),
    ):
        self.key = key
        self.channel_order = channel_order
        self.random_compress = random_compress
        self.load_mv = load_mv
        self.load_qp_slice = load_qp_slice
        self.load_base_qp = load_base_qp
        self.load_partition = load_partition
        self.qp_slice_file = qp_slice_file
        self.replace_qp_with_ipb = replace_qp_withIPB
        self.data_ratio = tuple(data_ratio)

    def __call__(self, sample: Sample, rng, ctx=None) -> Sample:
        return sample  # IO executed by the dataset


# --------------------------------------------------------------------------
# sample phase
# --------------------------------------------------------------------------


@PIPELINES.register(name="RescaleToZeroOne")
class RescaleToZeroOneStage:
    phase = "sample"

    def __init__(self, keys=RESCALE_KEYS):
        self.keys = _map_keys(keys)

    def __call__(self, sample: Sample, rng, ctx=None) -> Sample:
        return rescale_to_zero_one(sample, self.keys)


@PIPELINES.register(name="PairedRandomCrop_mv")
class PairedRandomCropMVStage:
    phase = "sample"

    def __init__(self, gt_patch_size=128):
        self.gt_patch_size = gt_patch_size

    def __call__(self, sample: Sample, rng, ctx=None) -> Sample:
        scale = (ctx or {}).get("scale", 1)
        return paired_random_crop_mv(sample, self.gt_patch_size, scale, rng)


@PIPELINES.register(name="Flip")
class FlipStage:
    phase = "sample"

    def __init__(self, keys=SPATIAL_KEYS, flip_ratio=0.5, direction="horizontal"):
        if direction not in ("horizontal", "vertical"):
            raise ValueError(f"Unknown flip direction {direction!r}")
        self.keys = _map_keys(keys)
        self.flip_ratio = flip_ratio
        self.direction = direction

    def __call__(self, sample: Sample, rng, ctx=None) -> Sample:
        return flip(sample, self.direction, rng, self.flip_ratio, self.keys)


@PIPELINES.register(name="RandomTransposeHW")
class RandomTransposeHWStage:
    """H/W transpose. The reference hardcodes ``transpose=True``
    (augmentation.py:841-842) making the transpose unconditional regardless
    of ``transpose_ratio``; ``always_transpose=True`` (default) replicates
    that quirk. Pass ``always_transpose=False`` in the config to get the
    documented probabilistic behavior instead."""

    phase = "sample"

    def __init__(self, keys=SPATIAL_KEYS, transpose_ratio=0.5, always_transpose=True):
        self.keys = _map_keys(keys)
        self.transpose_ratio = transpose_ratio
        self.always_transpose = always_transpose

    def __call__(self, sample: Sample, rng, ctx=None) -> Sample:
        return random_transpose_hw(
            sample, rng, self.transpose_ratio, self.keys, self.always_transpose
        )


@PIPELINES.register(name="FramesToTensor", aliases=("ImageToTensor", "ToTensor"))
class FramesToTensorStage:
    """No-op data movement: samples are already stacked time-major numpy
    arrays, and the jitted step consumes them directly (the torch
    HWC->CHW tensor conversion has no TPU counterpart — NHWC is the
    layout the compiled program wants). Validates the keys exist."""

    phase = "sample"

    def __init__(self, keys=()):
        self.keys = _map_keys(keys)

    def __call__(self, sample: Sample, rng, ctx=None) -> Sample:
        missing = [k for k in self.keys if k not in sample]
        if missing:
            raise KeyError(f"FramesToTensor: keys {missing} not in sample")
        return sample


@PIPELINES.register(name="Collect")
class CollectStage:
    """Keep only the named keys (+ clip metadata), reference
    formating.py Collect."""

    phase = "sample"

    _META = ("clip_name", "reverse")

    def __init__(self, keys, meta_keys=()):
        self.keys = _map_keys(keys)

    def __call__(self, sample: Sample, rng, ctx=None) -> Sample:
        keep = set(self.keys) | set(self._META)
        return {k: v for k, v in sample.items() if k in keep}


# --------------------------------------------------------------------------
# Compose
# --------------------------------------------------------------------------


class Compose:
    """Build a pipeline list through :data:`PIPELINES` and execute it.

    Unknown stage types raise ``KeyError`` naming the known stages
    (reference behavior: compose.py:10-54 + build_from_cfg). Bare callables
    are accepted as custom sample-phase stages, like the reference accepts
    callables in a pipeline list.
    """

    def __init__(self, pipeline: Sequence):
        self.stages = []
        for cfg in pipeline or []:
            if isinstance(cfg, dict):
                self.stages.append(PIPELINES.build(dict(cfg)))
            elif callable(cfg):
                self.stages.append(cfg)
            else:
                raise TypeError(
                    f"pipeline stage must be a dict or callable, got {type(cfg)}"
                )

    def _phase(self, which: str):
        return [s for s in self.stages if getattr(s, "phase", "sample") == which]

    @property
    def index_stages(self):
        return self._phase("index")

    @property
    def load_stages(self):
        return self._phase("load")

    @property
    def sample_stages(self):
        return self._phase("sample")

    def apply_index(
        self, sequence_length: int, num_input_frames: int, rng: np.random.Generator
    ) -> dict:
        """Run index-phase stages in config order, producing the frame plan
        (lq_idxs / gt_idxs / reverse)."""
        plan = {
            "sequence_length": sequence_length,
            "num_input_frames": num_input_frames,
        }
        for s in self.index_stages:
            plan = s(plan, rng)
        if "lq_idxs" not in plan:
            raise ValueError(
                "pipeline has no index-generation stage "
                "(GenerateSegmentIndices*/GenerateFrameIndicesEDVR_mix)"
            )
        return plan

    def apply_sample(
        self, sample: Sample, rng: np.random.Generator, scale: int = 1
    ) -> Sample:
        """Run sample-phase stages in config order on the loaded Sample."""
        ctx = {"scale": scale}
        for s in self.sample_stages:
            sample = s(sample, rng, ctx) if getattr(s, "phase", None) else s(sample, rng)
        return sample

    # ---- loader-knob extraction (replaces the old keyword scraping; every
    # stage has already been validated against the registry by __init__) ----

    def loader_params(self) -> dict:
        out = dict(
            data_ratio=(0.2, 0.6, 0.85, 1.0),
            replace_qp_with_ipb=False,
            qp_slice_file=None,
            gt_patch_size=128,
            filename_tmpl="{:08d}.png",
            interval_list=(1,),
            window_mode="segment",
        )
        for s in self.stages:
            if isinstance(s, (GenerateSegmentIndicesStage, GenerateTestIndicesStage)):
                out["filename_tmpl"] = s.filename_tmpl
                out["interval_list"] = s.interval_list
            elif isinstance(s, GenerateEDVRWindowStage):
                out["filename_tmpl"] = s.filename_tmpl
                out["interval_list"] = s.interval_list
                out["window_mode"] = "edvr"
            elif isinstance(s, LoadImageListStage) and (
                s.key == "lq" or s.qp_slice_file is not None
            ):
                # the lq loader stage normally carries the codec-prior knobs
                # (every reference config passes key='lq' there), but honor a
                # qp_slice_file wherever a config attaches it — the reference
                # loader loads the sidecar for whichever stage sets it
                out["qp_slice_file"] = s.qp_slice_file or out["qp_slice_file"]
                out["data_ratio"] = s.data_ratio
                out["replace_qp_with_ipb"] = s.replace_qp_with_ipb
            elif isinstance(s, PairedRandomCropMVStage):
                out["gt_patch_size"] = s.gt_patch_size
        return out

    def __repr__(self):
        inner = "\n".join(f"    {type(s).__name__}" for s in self.stages)
        return f"Compose(\n{inner}\n)"
