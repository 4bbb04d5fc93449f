"""Additional benchmark dataset families.

- :class:`KittiPairDataset` — the KITTI optical-flow-assist protocol: fixed
  frame pairs (10.png, 11.png) per sequence (reference
  augmentation.py:1549-1604 GenerateSegmentIndices_Mix_Compress_KITT and
  sr_kitti_multiple_gt_compress_dataset.py:6-150). Enhanced pairs feed RAFT
  downstream.
- :class:`VimeoMixDataset` — Vimeo-90k septuplets with the vimeo-specific
  sidecar layout: frames ``im1..im7.png`` under ``<clip>/<subclip>/``, MV
  sidecars at ``.../mv/<subclip>/0000000{i-1}.npy`` and the 4-level
  qp_slice JSON ``dict[crf][clip][subclip][frame]`` (reference
  loading_ipb.py:104-112,138-142).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from .datasets import ClipIndex, _load_png
from .mv_raster import rasterize_clip
from .pipeline import (
    Sample,
    flip,
    paired_random_crop_mv,
    random_transpose_hw,
    rescale_to_zero_one,
)
from .qp_slice import QpSliceLookup

__all__ = [
    "KittiPairDataset",
    "VimeoMixDataset",
    "VimeoTestDataset",
    "GenerationPairedDataset",
    "GenerationUnpairedDataset",
    "VFIVimeoDataset",
]


@dataclass
class KittiPairDataset:
    """Fixed (10, 11) frame pairs per KITTI sequence, whole-frame eval."""

    lq_folder: str
    gt_folder: str
    qp_slice_file: Optional[str]
    frame_ids: Sequence[int] = (10, 11)
    filename_tmpl: str = "{:02d}.png"

    def __post_init__(self):
        import re

        self._lut = QpSliceLookup(self.qp_slice_file)
        self.clips = sorted(
            d.name for d in Path(self.lq_folder).iterdir() if d.is_dir()
        )
        m = re.search(r"crf(\d+)", self.lq_folder)
        self.base_qp = int(m.group(1)) if m else 0

    def __len__(self):
        return len(self.clips)

    def load_clip(self, idx: int) -> Sample:
        clip = self.clips[idx]
        lq_frames, gt_frames, qps, slice_types, records = [], [], [], [], []
        for i in self.frame_ids:
            fname = self.filename_tmpl.format(i)
            lq_png = os.path.join(self.lq_folder, clip, fname)
            lq_frames.append(_load_png(lq_png))
            gt_frames.append(_load_png(os.path.join(self.gt_folder, clip, fname)))
            qp, st = self._lut(self.base_qp, clip, i)
            qps.append(qp)
            slice_types.append(st)
            mv_path = lq_png.replace(".png", ".npy").replace("png", "mv")
            records.append(
                np.load(mv_path) if os.path.exists(mv_path)
                else np.zeros((0, 10), np.float32)
            )
        h, w = lq_frames[0].shape[:2]
        mvs, partitions = rasterize_clip(records, slice_types, h, w)
        sample: Sample = {
            "lq": np.stack(lq_frames).astype(np.float32),
            "gt": np.stack(gt_frames).astype(np.float32),
            "mvs": mvs,
            "partitions": partitions,
            "qps": np.asarray(qps, np.float32),
            "slices": np.asarray([ord(s) for s in slice_types], np.float32),
            "base_qps": np.full(len(self.frame_ids), float(self.base_qp), np.float32),
            "clip_name": clip,  # type: ignore[dict-item]
        }
        rescale_to_zero_one(sample)
        return sample

    def __iter__(self):
        for i in range(len(self)):
            yield self.load_clip(i)


@dataclass
class VimeoMixDataset:
    """Vimeo-90k septuplet training source with random CRF mixture."""

    lq_folder: str
    gt_folder: str
    cprs15_folder: str
    cprs25_folder: str
    cprs35_folder: str
    qp_slice_file: Optional[str]
    clips: List[str]  # entries '<clip>/<subclip>' e.g. '00001/0266'
    num_input_frames: int = 7
    scale: int = 1
    gt_patch_size: int = 128
    data_ratio: Sequence[float] = (0.2, 0.6, 0.85, 1.0)
    replace_qp_with_ipb: bool = False
    _lut: QpSliceLookup = field(init=False, repr=False)

    def __post_init__(self):
        self._lut = QpSliceLookup(self.qp_slice_file, self.replace_qp_with_ipb)

    def _bucket(self, u: float):
        r = self.data_ratio
        if u < r[0]:
            return 0, self.lq_folder
        if u < r[1]:
            return 15, self.cprs15_folder
        if u < r[2]:
            return 25, self.cprs25_folder
        return 35, self.cprs35_folder

    def _qp_slice(self, crf: int, clip: str, subclip: str, frame_1based: int):
        """vimeo JSON nests one level deeper and keys frames by the im index
        minus one (loading_ipb.py:104-112)."""
        if crf == 0:
            st = "I" if frame_1based == 1 else "P"
            qp = 0.0 if not self.replace_qp_with_ipb else float(ord(st))
            return qp, st
        entry = self._lut._dict[f"crf{crf}"][clip][subclip][str(frame_1based - 1)]
        st = entry["slice"]
        qp = float(entry["QP"]) if not self.replace_qp_with_ipb else float(ord(st))
        return qp, st

    def sample(self, rng: np.random.Generator) -> Sample:
        key = self.clips[int(rng.integers(0, len(self.clips)))]
        clip, subclip = key.split("/")
        base_qp, folder = self._bucket(float(rng.random()))

        lq_frames, gt_frames, qps, slice_types, records = [], [], [], [], []
        for i in range(1, self.num_input_frames + 1):
            lq_png = os.path.join(folder, clip, subclip, f"im{i}.png")
            lq_frames.append(_load_png(lq_png))
            gt_frames.append(
                _load_png(os.path.join(self.gt_folder, clip, subclip, f"im{i}.png"))
            )
            qp, st = self._qp_slice(base_qp, clip, subclip, i)
            qps.append(qp)
            slice_types.append(st)
            # mv path: '<root>/mv/<clip>/<subclip>/0000000{i-1}.npy'
            # (loading_ipb.py:138-142: replace '/imN.png' and 'png'->'mv')
            mv_dir = os.path.join(folder.replace("png", "mv"), clip, subclip)
            mv_path = os.path.join(mv_dir, f"{i - 1:08d}.npy")
            records.append(
                np.load(mv_path) if os.path.exists(mv_path)
                else np.zeros((0, 10), np.float32)
            )

        h, w = lq_frames[0].shape[:2]
        mvs, partitions = rasterize_clip(records, slice_types, h, w)
        sample: Sample = {
            "lq": np.stack(lq_frames).astype(np.float32),
            "gt": np.stack(gt_frames).astype(np.float32),
            "mvs": mvs,
            "partitions": partitions,
            "qps": np.asarray(qps, np.float32),
            "slices": np.asarray([ord(s) for s in slice_types], np.float32),
            "base_qps": np.full(self.num_input_frames, float(base_qp), np.float32),
        }
        rescale_to_zero_one(sample)
        paired_random_crop_mv(sample, self.gt_patch_size, self.scale, rng)
        flip(sample, "horizontal", rng)
        flip(sample, "vertical", rng)
        random_transpose_hw(sample, rng)
        return sample


@dataclass
class VimeoTestDataset:
    """Vimeo-90k septuplet whole-clip test source (reference
    ``SRVimeo90KMultipleGTCompressDataset``,
    sr_vimeo90k_multiple_gt_compress_dataset.py:10-89): one fixed
    compressed folder, ``base_qp`` parsed from its path, keys read from
    the annotation list (``00001/0266 ...`` lines)."""

    cprs_folder: str
    gt_folder: str
    qp_slice_file: Optional[str]
    clips: List[str]  # '<clip>/<subclip>' entries
    num_input_frames: int = 7
    scale: int = 1
    replace_qp_with_ipb: bool = False

    def __post_init__(self):
        import re

        self._lut = QpSliceLookup(self.qp_slice_file, self.replace_qp_with_ipb)
        m = re.search(r"crf(\d+)", self.cprs_folder)
        self.base_qp = int(m.group(1)) if m else 0

    def __len__(self):
        return len(self.clips)

    def load_clip(self, idx: int) -> Sample:
        key = self.clips[idx]
        clip, subclip = key.split("/")
        lq_frames, gt_frames, qps, slice_types, records = [], [], [], [], []
        for i in range(1, self.num_input_frames + 1):
            lq_frames.append(
                _load_png(os.path.join(self.cprs_folder, clip, subclip, f"im{i}.png"))
            )
            gt_frames.append(
                _load_png(os.path.join(self.gt_folder, clip, subclip, f"im{i}.png"))
            )
            if self.base_qp == 0:
                st = "I" if i == 1 else "P"
                qp = float(ord(st)) if self.replace_qp_with_ipb else 0.0
            else:
                entry = self._lut._dict[f"crf{self.base_qp}"][clip][subclip][str(i - 1)]
                st = entry["slice"]
                qp = (
                    float(ord(st))
                    if self.replace_qp_with_ipb
                    else float(entry["QP"])
                )
            qps.append(qp)
            slice_types.append(st)
            mv_path = os.path.join(
                self.cprs_folder.replace("png", "mv"), clip, subclip,
                f"{i - 1:08d}.npy",
            )
            records.append(
                np.load(mv_path) if os.path.exists(mv_path)
                else np.zeros((0, 10), np.float32)
            )

        h, w = lq_frames[0].shape[:2]
        mvs, partitions = rasterize_clip(records, slice_types, h, w)
        sample: Sample = {
            "lq": np.stack(lq_frames).astype(np.float32),
            "gt": np.stack(gt_frames).astype(np.float32),
            "mvs": mvs,
            "partitions": partitions,
            "qps": np.asarray(qps, np.float32),
            "slices": np.asarray([ord(s) for s in slice_types], np.float32),
            "base_qps": np.full(self.num_input_frames, float(self.base_qp), np.float32),
            "clip_name": key.replace("/", "_"),
        }
        rescale_to_zero_one(sample)
        return sample

    def __iter__(self):
        for i in range(len(self)):
            yield self.load_clip(i)


@dataclass
class GenerationPairedDataset:
    """Paired image-generation folder dataset (pix2pix protocol).

    Reference: mmedit/datasets/generation_paired_dataset.py:9-45 +
    pipelines/loading.py:1355-1423 (``LoadPairedImageFromFile``): each file
    under ``dataroot/{train,test}`` holds a pair concatenated along width
    (A|B), split into img_a / img_b; train samples random-crop both sides
    to ``crop_size`` and flip jointly.
    """

    dataroot: str
    test_mode: bool = False
    crop_size: int = 256
    flip: bool = True

    def __post_init__(self):
        sub = "test" if self.test_mode else "train"
        root = os.path.join(self.dataroot, sub)
        if not os.path.isdir(root):
            root = self.dataroot
        self.paths = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if not self.paths:
            raise FileNotFoundError(f"no paired images under {root}")

    def __len__(self):
        return len(self.paths)

    def load_pair(self, idx: int):
        pair = _load_png(self.paths[idx]).astype(np.float32) / 255.0
        w = pair.shape[1] // 2
        return pair[:, :w], pair[:, w:]

    def sample(self, rng: np.random.Generator) -> dict:
        idx = int(rng.integers(0, len(self.paths)))
        a, b = self.load_pair(idx)
        if not self.test_mode:
            h, w = a.shape[:2]
            cs = min(self.crop_size, h, w)
            top = int(rng.integers(0, h - cs + 1))
            left = int(rng.integers(0, w - cs + 1))
            a = a[top : top + cs, left : left + cs]
            b = b[top : top + cs, left : left + cs]
            if self.flip and rng.random() < 0.5:
                a = a[:, ::-1].copy()
                b = b[:, ::-1].copy()
        return {"img_a": a, "img_b": b, "pair_path": self.paths[idx]}

    def __iter__(self):
        for i in range(len(self.paths)):
            a, b = self.load_pair(i)
            yield {"img_a": a, "img_b": b, "pair_path": self.paths[i]}


@dataclass
class GenerationUnpairedDataset:
    """Unpaired image-generation dataset (CycleGAN protocol).

    Reference: mmedit/datasets/generation_unpaired_dataset.py:9-100 —
    domains live in ``dataroot/{train,test}{A,B}``; train samples pick a
    RANDOM image from each domain (B index randomized, matching the
    reference's prepare_train_data idx_b), test iterates both in lockstep
    (cycling the shorter list).
    """

    dataroot: str
    test_mode: bool = False
    crop_size: int = 256
    flip: bool = True

    def __post_init__(self):
        phase = "test" if self.test_mode else "train"
        self.paths_a = self._scan(os.path.join(self.dataroot, phase + "A"))
        self.paths_b = self._scan(os.path.join(self.dataroot, phase + "B"))

    @staticmethod
    def _scan(root):
        if not os.path.isdir(root):
            raise FileNotFoundError(f"no domain folder {root}")
        paths = sorted(
            os.path.join(root, f)
            for f in os.listdir(root)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        if not paths:
            raise FileNotFoundError(f"no images under {root}")
        return paths

    def __len__(self):
        return max(len(self.paths_a), len(self.paths_b))

    def _load(self, path, rng=None):
        img = _load_png(path).astype(np.float32) / 127.5 - 1.0  # [-1, 1]
        if rng is not None:
            h, w = img.shape[:2]
            cs = min(self.crop_size, h, w)
            top = int(rng.integers(0, h - cs + 1))
            left = int(rng.integers(0, w - cs + 1))
            img = img[top : top + cs, left : left + cs]
            if self.flip and rng.random() < 0.5:
                img = img[:, ::-1].copy()
        return img

    def sample(self, rng: np.random.Generator) -> dict:
        ia = int(rng.integers(0, len(self.paths_a)))
        ib = int(rng.integers(0, len(self.paths_b)))  # unpaired: random b
        return {
            "img_a": self._load(self.paths_a[ia], rng),
            "img_b": self._load(self.paths_b[ib], rng),
            "img_a_path": self.paths_a[ia],
            "img_b_path": self.paths_b[ib],
        }

    def __iter__(self):
        for i in range(len(self)):
            yield {
                "img_a": self._load(self.paths_a[i % len(self.paths_a)]),
                "img_b": self._load(self.paths_b[i % len(self.paths_b)]),
                "img_a_path": self.paths_a[i % len(self.paths_a)],
                "img_b_path": self.paths_b[i % len(self.paths_b)],
            }


@dataclass
class VFIVimeoDataset:
    """Vimeo-90k frame-interpolation source (reference
    vfi_vimeo90k_dataset.py: triplets im1/im2/im3, inputs [im1, im3],
    target im2; and vfi_vimeo90k_7frames_dataset.py: septuplets with
    explicit ``input_frames``/``target_frames`` 1-based im indices)."""

    folder: str
    ann_file: str
    input_frames: Sequence[int] = (1, 3)
    target_frames: Sequence[int] = (2,)
    test_mode: bool = False

    def __post_init__(self):
        with open(self.ann_file) as f:
            self.keys = [
                line.strip().split(" ")[0] for line in f if line.strip()
            ]

    def __len__(self):
        return len(self.keys)

    def load_item(self, idx: int) -> dict:
        key = self.keys[idx].replace("/", os.sep)
        load = lambda i: _load_png(  # noqa: E731
            os.path.join(self.folder, key, f"im{i}.png")
        ).astype(np.float32) / 255.0
        inputs = np.stack([load(i) for i in self.input_frames])
        targets = np.stack([load(i) for i in self.target_frames])
        return {
            "inputs": inputs,
            "target": targets[0] if len(self.target_frames) == 1 else targets,
            "key": self.keys[idx],
        }

    def sample(self, rng: np.random.Generator) -> dict:
        item = self.load_item(int(rng.integers(0, len(self.keys))))
        if not self.test_mode and rng.random() < 0.5:
            item["inputs"] = item["inputs"][:, :, ::-1].copy()
            item["target"] = item["target"][..., :, ::-1, :].copy() \
                if item["target"].ndim == 4 else item["target"][:, ::-1].copy()
        return item

    def __iter__(self):
        for i in range(len(self)):
            yield self.load_item(i)
