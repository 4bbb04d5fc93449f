"""Datasets: codec-prior clip sources for REDS / DAVIS style folder layouts.

Folder layout (reference README.md:40-54):

    <root>/crf{15,25,35}/png/<clip>/<frame>.png   compressed frames
    <root>/crf{15,25,35}/mv/<clip>/<frame>.npy    MV record sidecars
    <root>/sharp/png/<clip>/<frame>.png           ground truth
    <root>/<name>.json                            per-frame QP/slice sidecar

Train sampling (reference pipeline, configs/HR_davis_LR_128x128.py:50-106 +
loading_ipb.py:24-215): random clip -> random temporal window -> random CRF
bucket by the ``data_ratio`` CDF -> decode PNG + rasterize MV/partition maps
+ QP/slice lookup -> rescale -> MV-aware paired crop -> flips -> transpose.

Test sampling (LoadImageFromFileList_ipb, loading_ipb.py:221-397): fixed
folder, ``base_qp`` parsed from the path ('crf15' -> 15), full clip, no
augmentation.

REDS train partition: clips 000-269 minus REDS4 {000, 011, 015, 020}
(reference sr_reds_multiple_gt_compress_dataset.py:165-168); DAVIS clips by
folder scan (sr_dsvis_multiple_gt_compress_dataset.py:7-87).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np
from PIL import Image

from .mv_raster import rasterize_clip
from .qp_slice import QpSliceLookup
from .pipeline import (
    Sample,
    flip,
    generate_edvr_window_indices,
    generate_segment_indices,
    paired_random_crop_mv,
    random_transpose_hw,
    rescale_to_zero_one,
)

__all__ = [
    "REDS4_CLIPS",
    "ClipIndex",
    "MixCompressTrainDataset",
    "CompressTestDataset",
    "reds_train_clips",
    "scan_clip_folder",
]

REDS4_CLIPS = ("000", "011", "015", "020")


def reds_train_clips(val_partition: Sequence[str] = REDS4_CLIPS) -> List[str]:
    """270 REDS clips minus the REDS4 validation partition."""
    return [f"{i:03d}" for i in range(270) if f"{i:03d}" not in set(val_partition)]


def scan_clip_folder(folder: str | Path) -> Dict[str, int]:
    """Scan ``folder/<clip>/`` and return {clip_name: num_frames}."""
    out = {}
    for d in sorted(Path(folder).iterdir()):
        if d.is_dir():
            out[d.name] = sum(1 for f in d.iterdir() if f.suffix == ".png")
    return out


def _load_png(path: str | Path) -> np.ndarray:
    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _mv_path(png_path: str) -> str:
    """PNG path -> MV sidecar path (reference loading_ipb.py:144:
    ``filepath.replace('.png', '.npy').replace('png', 'mv')``)."""
    return png_path.replace(".png", ".npy").replace("png", "mv")


@dataclass
class ClipIndex:
    name: str
    sequence_length: int


@dataclass
class MixCompressTrainDataset:
    """Random-CRF-mixture training source for one dataset root."""

    lq_folder: str
    gt_folder: str
    cprs15_folder: str
    cprs25_folder: str
    cprs35_folder: str
    qp_slice_file: Optional[str]
    clips: List[ClipIndex]
    num_input_frames: int = 15
    scale: int = 1
    gt_patch_size: int = 128
    filename_tmpl: str = "{:08d}.png"
    data_ratio: Sequence[float] = (0.2, 0.6, 0.85, 1.0)
    interval_list: Sequence[int] = (1,)
    replace_qp_with_ipb: bool = False
    always_transpose: bool = True
    # 'segment' (GenerateSegmentIndices_Mix_Compress) | 'edvr'
    # (GenerateFrameIndicesEDVR_mix, center-frame window w/ border reroll)
    window_mode: str = "segment"
    # Config-built pipeline (data.compose.Compose). When set, index
    # generation (incl. TemporalReverse) and the transform tail run in
    # config order through the PIPELINES registry; when None, the default
    # fixed order below (rescale -> crop -> flips -> transpose) applies.
    transforms: Optional[object] = None
    _lut: QpSliceLookup = field(init=False, repr=False)

    def __post_init__(self):
        self._lut = QpSliceLookup(self.qp_slice_file, self.replace_qp_with_ipb)

    def _bucket(self, u: float):
        """CRF bucket by CDF (loading_ipb.py:27-40)."""
        r = self.data_ratio
        if u < r[0]:
            return 0, self.lq_folder
        if u < r[1]:
            return 15, self.cprs15_folder
        if u < r[2]:
            return 25, self.cprs25_folder
        return 35, self.cprs35_folder

    def sample(self, rng: np.random.Generator) -> Sample:
        clip = self.clips[int(rng.integers(0, len(self.clips)))]
        if self.transforms is not None:
            plan = self.transforms.apply_index(
                clip.sequence_length, self.num_input_frames, rng
            )
            lq_idxs, gt_idxs = plan["lq_idxs"], plan["gt_idxs"]
        else:
            gen = (
                generate_edvr_window_indices
                if self.window_mode == "edvr"
                else generate_segment_indices
            )
            lq_idxs = gt_idxs = gen(
                clip.sequence_length, self.num_input_frames, rng, self.interval_list
            )
        base_qp, folder = self._bucket(float(rng.random()))

        lq_frames, gt_frames, qps, slice_types, records = [], [], [], [], []
        for i, j in zip(lq_idxs, gt_idxs):
            fname = self.filename_tmpl.format(i)
            lq_png = os.path.join(folder, clip.name, fname)
            lq_frames.append(_load_png(lq_png))
            gt_frames.append(
                _load_png(
                    os.path.join(self.gt_folder, clip.name, self.filename_tmpl.format(j))
                )
            )
            qp, st = self._lut(base_qp, clip.name, i)
            qps.append(qp)
            slice_types.append(st)
            records.append(np.load(_mv_path(lq_png)))

        h, w = lq_frames[0].shape[:2]
        mvs, partitions = rasterize_clip(records, slice_types, h, w)

        sample: Sample = {
            "lq": np.stack(lq_frames).astype(np.float32),
            "gt": np.stack(gt_frames).astype(np.float32),
            "mvs": mvs,
            "partitions": partitions,
            "qps": np.asarray(qps, np.float32),
            "slices": np.asarray([ord(s) for s in slice_types], np.float32),
            "base_qps": np.full(len(lq_idxs), float(base_qp), np.float32),
        }
        if self.transforms is not None:
            return self.transforms.apply_sample(sample, rng, scale=self.scale)
        rescale_to_zero_one(sample)
        paired_random_crop_mv(sample, self.gt_patch_size, self.scale, rng)
        flip(sample, "horizontal", rng)
        flip(sample, "vertical", rng)
        random_transpose_hw(sample, rng, always_transpose=self.always_transpose)
        return sample


@dataclass
class CompressTestDataset:
    """Fixed-folder test source yielding whole clips in order."""

    lq_folder: str
    gt_folder: str
    qp_slice_file: Optional[str]
    clips: List[ClipIndex]
    num_input_frames: int = 100
    scale: int = 1
    filename_tmpl: str = "{:08d}.png"
    replace_qp_with_ipb: bool = False
    # Config-built pipeline (data.compose.Compose); None -> rescale only.
    transforms: Optional[object] = None
    _lut: QpSliceLookup = field(init=False, repr=False)

    def __post_init__(self):
        self._lut = QpSliceLookup(self.qp_slice_file, self.replace_qp_with_ipb)
        m = re.search(r"crf(\d+)", self.lq_folder)
        # base_qp parsed from the path (loading_ipb.py:238-239)
        self.base_qp = int(m.group(1)) if m else 0

    def __len__(self):
        return len(self.clips)

    def load_clip(self, clip_idx: int) -> Sample:
        clip = self.clips[clip_idx]
        n = min(self.num_input_frames, clip.sequence_length)
        lq_frames, gt_frames, qps, slice_types, records = [], [], [], [], []
        for i in range(n):
            fname = self.filename_tmpl.format(i)
            lq_png = os.path.join(self.lq_folder, clip.name, fname)
            lq_frames.append(_load_png(lq_png))
            gt_frames.append(_load_png(os.path.join(self.gt_folder, clip.name, fname)))
            qp, st = self._lut(self.base_qp, clip.name, i)
            qps.append(qp)
            slice_types.append(st)
            records.append(np.load(_mv_path(lq_png)))

        h, w = lq_frames[0].shape[:2]
        mvs, partitions = rasterize_clip(records, slice_types, h, w)
        sample: Sample = {
            "lq": np.stack(lq_frames).astype(np.float32),
            "gt": np.stack(gt_frames).astype(np.float32),
            "mvs": mvs,
            "partitions": partitions,
            "qps": np.asarray(qps, np.float32),
            "slices": np.asarray([ord(s) for s in slice_types], np.float32),
            "base_qps": np.full(n, float(self.base_qp), np.float32),
            "clip_name": clip.name,  # type: ignore[dict-item]
        }
        if self.transforms is not None:
            return self.transforms.apply_sample(sample, rng=None, scale=self.scale)
        rescale_to_zero_one(sample)
        return sample

    def __iter__(self):
        for i in range(len(self.clips)):
            yield self.load_clip(i)
