"""LDP datasets: PQF-triple sampling for the MFQE-protocol baselines.

Reference: mmedit/datasets/ldp_dataset.py:10-661 (LDPPQFDataset /
LDPNonPQFDataset and their test variants). Peak-quality frames (PQFs) are
the I/P slices; each sample is the triple (nearest left PQF, center frame,
nearest right PQF) with the ground-truth at the center. The PQF dataset
centers on PQFs (trains the PQF enhancer), the non-PQF dataset centers on
B frames. For uncompressed inputs the 'PQFs' are simply the adjacent frames
(ldp_dataset.py:61-67).

Samples: lq (3, h, w, 3), gt (1, h, w, 3) [center], base_qps/qps (3,).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from .datasets import ClipIndex, _load_png
from .qp_slice import QpSliceLookup
from .pipeline import Sample, flip, rescale_to_zero_one

__all__ = ["LDPTripleDataset", "find_left_right_pqf"]

PQF_SLICES = ("I", "P")


def find_left_right_pqf(slice_of, idx: int, n_frames: int, compressed: bool = True):
    """Nearest PQF strictly left/right of idx; falls back to idx itself
    (ldp_dataset.py:60-92). ``slice_of(i) -> 'I'|'P'|'B'``."""
    if not compressed:
        left = idx - 1 if idx > 0 else idx
        right = idx + 1 if idx < n_frames - 1 else idx
        return left, right
    left = idx - 1
    while left >= 0 and slice_of(left) not in PQF_SLICES:
        left -= 1
    if left < 0:
        left = idx
    right = idx + 1
    while right <= n_frames - 1 and slice_of(right) not in PQF_SLICES:
        right += 1
    if right > n_frames - 1:
        right = idx
    return left, right


@dataclass
class LDPTripleDataset:
    """Random (left PQF, center, right PQF) triples at a random CRF bucket."""

    lq_folder: str
    gt_folder: str
    cprs15_folder: str
    cprs25_folder: str
    cprs35_folder: str
    qp_slice_file: Optional[str]
    clips: List[ClipIndex]
    centers: str = "pqf"  # 'pqf' | 'nonpqf'
    scale: int = 1
    gt_patch_size: int = 128
    filename_tmpl: str = "{:08d}.png"
    data_ratio: Sequence[float] = (0.2, 0.6, 0.85, 1.0)
    _lut: QpSliceLookup = field(init=False, repr=False)

    def __post_init__(self):
        self._lut = QpSliceLookup(self.qp_slice_file)

    def _bucket(self, u: float):
        r = self.data_ratio
        if u < r[0]:
            return 0, self.lq_folder
        if u < r[1]:
            return 15, self.cprs15_folder
        if u < r[2]:
            return 25, self.cprs25_folder
        return 35, self.cprs35_folder

    def _center_candidates(self, crf: int, clip: ClipIndex):
        want_pqf = self.centers == "pqf"
        out = []
        for i in range(clip.sequence_length):
            _, st = self._lut(crf, clip.name, i)
            if (st in PQF_SLICES) == want_pqf:
                out.append(i)
        return out

    def sample(self, rng: np.random.Generator) -> Sample:
        clip = self.clips[int(rng.integers(0, len(self.clips)))]
        base_qp, folder = self._bucket(float(rng.random()))
        candidates = self._center_candidates(base_qp, clip)
        if not candidates:
            candidates = list(range(clip.sequence_length))
        center = int(candidates[int(rng.integers(0, len(candidates)))])

        left, right = find_left_right_pqf(
            lambda i: self._lut(base_qp, clip.name, i)[1],
            center,
            clip.sequence_length,
            compressed=base_qp != 0,
        )

        frames, qps = [], []
        for i in (left, center, right):
            frames.append(
                _load_png(os.path.join(folder, clip.name, self.filename_tmpl.format(i)))
            )
            qps.append(self._lut(base_qp, clip.name, i)[0])
        gt = _load_png(
            os.path.join(self.gt_folder, clip.name, self.filename_tmpl.format(center))
        )

        sample: Sample = {
            "lq": np.stack(frames).astype(np.float32),
            "gt": gt[None].astype(np.float32),
            "qps": np.asarray(qps, np.float32),
            "base_qps": np.full(3, float(base_qp), np.float32),
        }
        rescale_to_zero_one(sample)
        # crop lq triple + gt center with the same window
        t, h, w = sample["lq"].shape[:3]
        p = self.gt_patch_size // self.scale
        top = int(rng.integers(0, h - p + 1))
        lft = int(rng.integers(0, w - p + 1))
        sample["lq"] = sample["lq"][:, top : top + p, lft : lft + p]
        tg, lg = top * self.scale, lft * self.scale
        g = self.gt_patch_size
        sample["gt"] = sample["gt"][:, tg : tg + g, lg : lg + g]
        flip(sample, "horizontal", rng, keys=("lq", "gt"))
        flip(sample, "vertical", rng, keys=("lq", "gt"))
        return sample

    def iter_test(self, crf: Optional[int] = None):
        """Deterministic test iteration: every center frame of every clip
        (PQF or non-PQF per ``centers``), full resolution."""
        import re

        if crf is None:
            m = re.search(r"crf(\d+)", self.lq_folder)
            crf = int(m.group(1)) if m else 0
        folder = {0: self.lq_folder, 15: self.cprs15_folder,
                  25: self.cprs25_folder, 35: self.cprs35_folder}[crf]
        for clip in self.clips:
            for center in self._center_candidates(crf, clip):
                left, right = find_left_right_pqf(
                    lambda i: self._lut(crf, clip.name, i)[1],
                    center, clip.sequence_length, compressed=crf != 0,
                )
                frames = [
                    _load_png(os.path.join(folder, clip.name, self.filename_tmpl.format(i)))
                    for i in (left, center, right)
                ]
                gt = _load_png(os.path.join(
                    self.gt_folder, clip.name, self.filename_tmpl.format(center)))
                s: Sample = {
                    "lq": np.stack(frames).astype(np.float32),
                    "gt": gt[None].astype(np.float32),
                    "qps": np.zeros(3, np.float32),
                    "base_qps": np.full(3, float(crf), np.float32),
                    "clip_name": f"{clip.name}/{center:08d}",  # type: ignore
                }
                rescale_to_zero_one(s)
                yield s
