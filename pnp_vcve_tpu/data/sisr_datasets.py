"""Single-image SR dataset modes (paired LQ/GT images).

Reference surfaces:
- SRFolderDataset  (mmedit/datasets/sr_folder_dataset.py:9-86): "folder
  mode" — lq/gt folders scanned, pairs matched by ``filename_tmpl``.
- SRAnnotationDataset (sr_annotation_dataset.py:9-77): "annotation mode" —
  one gt image name (+shape) per line; lq name derived via the template.
- SRFolderGTDataset (sr_folder_gt_dataset.py): gt-only folder, for
  degradation-synthesis training (RealSR protocols pair it with
  :mod:`pnp_vcve_tpu.data.degradations`).
- SRLmdbDataset (sr_lmdb_dataset.py:9-101): both sides are ``.lmdb``
  databases keyed by image stem, keys listed in ``meta_info.txt``. Needs
  the ``lmdb`` package at runtime (not bundled here; a clear ImportError
  is raised on first use).

All return float32 [0, 1] HWC arrays. Train-time transforms follow the
reference pipeline for these configs: paired random crop (gt patch =
``gt_patch_size``, lq patch = gt/scale), joint h/v flip + transpose
(pipelines/augmentation.py Flip + RandomTransposeHW).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .datasets import _load_png

__all__ = [
    "SRFolderDataset",
    "SRAnnotationDataset",
    "SRFolderGTDataset",
    "SRLmdbDataset",
    "SRFacialLandmarkDataset",
    "generate_heatmap",
]

_IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


def _list_images(folder: str):
    try:
        names = sorted(os.listdir(folder))
    except FileNotFoundError:
        raise FileNotFoundError(f"image folder not found: {folder}")
    paths = [
        os.path.join(folder, n) for n in names if n.lower().endswith(_IMG_EXTS)
    ]
    if not paths:
        raise FileNotFoundError(f"no images under {folder}")
    return paths


def _paired_crop_aug(
    lq: np.ndarray,
    gt: np.ndarray,
    scale: int,
    gt_patch_size: int,
    rng: np.random.Generator,
):
    """Paired random crop + joint flips/transpose (train pipeline of the
    sisr configs, e.g. reference configs' PairedRandomCrop + Flip +
    RandomTransposeHW)."""
    lp = gt_patch_size // scale
    h, w = lq.shape[:2]
    if h < lp or w < lp:
        raise ValueError(f"lq {h}x{w} smaller than patch {lp}")
    top = int(rng.integers(0, h - lp + 1))
    left = int(rng.integers(0, w - lp + 1))
    lq = lq[top : top + lp, left : left + lp]
    gt = gt[
        top * scale : top * scale + gt_patch_size,
        left * scale : left * scale + gt_patch_size,
    ]
    if rng.random() < 0.5:  # horizontal
        lq, gt = lq[:, ::-1], gt[:, ::-1]
    if rng.random() < 0.5:  # vertical
        lq, gt = lq[::-1], gt[::-1]
    if rng.random() < 0.5:  # transpose
        lq, gt = lq.transpose(1, 0, 2), gt.transpose(1, 0, 2)
    return np.ascontiguousarray(lq), np.ascontiguousarray(gt)


class _PairedSRBase:
    """Shared train/test protocol over a list of (lq_path, gt_path)."""

    pairs: list
    scale: int
    test_mode: bool
    gt_patch_size: int

    def __len__(self):
        return len(self.pairs)

    def _load(self, idx: int):
        lq_path, gt_path = self.pairs[idx]
        lq = _load_png(lq_path).astype(np.float32) / 255.0
        gt = _load_png(gt_path).astype(np.float32) / 255.0
        return lq, gt, lq_path, gt_path

    def sample(self, rng: np.random.Generator) -> dict:
        idx = int(rng.integers(0, len(self.pairs)))
        lq, gt, lq_path, gt_path = self._load(idx)
        if not self.test_mode:
            lq, gt = _paired_crop_aug(lq, gt, self.scale, self.gt_patch_size, rng)
        return {"lq": lq, "gt": gt, "lq_path": lq_path, "gt_path": gt_path}

    def __iter__(self):
        for i in range(len(self.pairs)):
            lq, gt, lq_path, gt_path = self._load(i)
            yield {"lq": lq, "gt": gt, "lq_path": lq_path, "gt_path": gt_path}


@dataclass
class SRFolderDataset(_PairedSRBase):
    """Folder mode: gt names drive the pairing; the lq name is
    ``filename_tmpl.format(stem) + ext`` (reference
    sr_folder_dataset.py:62-86, which asserts equal folder sizes)."""

    lq_folder: str
    gt_folder: str
    scale: int
    filename_tmpl: str = "{}"
    test_mode: bool = False
    gt_patch_size: int = 128

    def __post_init__(self):
        lq_paths = _list_images(self.lq_folder)
        gt_paths = _list_images(self.gt_folder)
        if len(lq_paths) != len(gt_paths):
            raise ValueError(
                f"gt and lq folders differ in size: {len(gt_paths)} vs "
                f"{len(lq_paths)}"
            )
        lq_set = {os.path.basename(p) for p in lq_paths}
        self.pairs = []
        for gt_path in gt_paths:
            stem, ext = os.path.splitext(os.path.basename(gt_path))
            lq_name = f"{self.filename_tmpl.format(stem)}{ext}"
            if lq_name not in lq_set:
                raise FileNotFoundError(
                    f"{lq_name} missing from {self.lq_folder}"
                )
            self.pairs.append((os.path.join(self.lq_folder, lq_name), gt_path))


@dataclass
class SRAnnotationDataset(_PairedSRBase):
    """Annotation mode: each line ``<gt_name> (h,w,c)``; lq derived via the
    template (reference sr_annotation_dataset.py:55-77)."""

    lq_folder: str
    gt_folder: str
    ann_file: str
    scale: int
    filename_tmpl: str = "{}"
    test_mode: bool = False
    gt_patch_size: int = 128

    def __post_init__(self):
        self.pairs = []
        with open(self.ann_file) as fin:
            for line in fin:
                line = line.strip()
                if not line:
                    continue
                gt_name = line.split(" ")[0]
                stem, ext = os.path.splitext(os.path.basename(gt_name))
                lq_name = f"{self.filename_tmpl.format(stem)}{ext}"
                self.pairs.append(
                    (
                        os.path.join(self.lq_folder, lq_name),
                        os.path.join(self.gt_folder, gt_name),
                    )
                )
        if not self.pairs:
            raise ValueError(f"empty annotation file {self.ann_file}")


@dataclass
class SRFolderGTDataset:
    """GT-only folder for degradation-synthesis training (reference
    sr_folder_gt_dataset.py); pair with data/degradations.py to make lq."""

    gt_folder: str
    scale: int = 1
    test_mode: bool = False
    gt_patch_size: int = 128

    def __post_init__(self):
        self.paths = _list_images(self.gt_folder)

    def __len__(self):
        return len(self.paths)

    def sample(self, rng: np.random.Generator) -> dict:
        idx = int(rng.integers(0, len(self.paths)))
        gt = _load_png(self.paths[idx]).astype(np.float32) / 255.0
        if not self.test_mode:
            ps = self.gt_patch_size
            h, w = gt.shape[:2]
            if h < ps or w < ps:
                raise ValueError(f"gt {h}x{w} smaller than patch {ps}")
            top = int(rng.integers(0, h - ps + 1))
            left = int(rng.integers(0, w - ps + 1))
            gt = np.ascontiguousarray(gt[top : top + ps, left : left + ps])
        return {"gt": gt, "gt_path": self.paths[idx]}

    def __iter__(self):
        for p in self.paths:
            yield {"gt": _load_png(p).astype(np.float32) / 255.0, "gt_path": p}


@dataclass
class SRLmdbDataset(_PairedSRBase):
    """LMDB mode: lq/gt ``.lmdb`` databases with matching keys (image stems
    from gt's ``meta_info.txt``, reference sr_lmdb_dataset.py:78-101).
    Requires the ``lmdb`` package (not bundled in this environment)."""

    lq_folder: str
    gt_folder: str
    scale: int
    test_mode: bool = False
    gt_patch_size: int = 128

    def __post_init__(self):
        if not (
            self.gt_folder.endswith(".lmdb") and self.lq_folder.endswith(".lmdb")
        ):
            raise ValueError(
                "gt and lq folders must both be .lmdb, got "
                f"{self.gt_folder} / {self.lq_folder}"
            )
        self.keys = []
        with open(os.path.join(self.gt_folder, "meta_info.txt")) as fin:
            for line in fin:
                if line.strip():
                    self.keys.append(line.split(" ")[0].split(".")[0])
        self.pairs = [(k, k) for k in self.keys]
        self._envs: Optional[tuple] = None

    def _env(self):
        if self._envs is None:
            try:
                import lmdb
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "SRLmdbDataset needs the 'lmdb' package; convert the "
                    "database to folders or install lmdb"
                ) from e
            self._envs = tuple(
                lmdb.open(
                    f, readonly=True, lock=False, readahead=False, meminit=False
                )
                for f in (self.lq_folder, self.gt_folder)
            )
        return self._envs

    def _load(self, idx: int):
        import io

        from PIL import Image

        key = self.keys[idx]
        lq_env, gt_env = self._env()
        out = []
        for env in (lq_env, gt_env):
            with env.begin(write=False) as txn:
                buf = txn.get(key.encode("ascii"))
            with Image.open(io.BytesIO(buf)) as im:
                img = np.asarray(im.convert("RGB"), dtype=np.uint8)
            out.append(img.astype(np.float32) / 255.0)
        return out[0], out[1], key, key


def generate_heatmap(
    landmarks: np.ndarray, ori_size, target_size, sigma: float = 1.0
) -> np.ndarray:
    """Gaussian landmark heatmaps (reference
    pipelines/generate_assistant.py GenerateHeatmap:10-73): one (h, w) map
    per keypoint, stacked channel-last."""
    if isinstance(ori_size, int):
        ori_size = (ori_size, ori_size)
    if isinstance(target_size, int):
        target_size = (target_size, target_size)
    ry = target_size[0] / ori_size[0]
    rx = target_size[1] / ori_size[1]
    w, h = target_size[1], target_size[0]
    gx, gy = np.meshgrid(np.arange(w), np.arange(h))
    maps = []
    for kp in landmarks:
        x, y = kp[0] * rx, kp[1] * ry
        dist2 = (gx - x) ** 2 + (gy - y) ** 2
        maps.append(np.exp(-dist2 / (2.0 * sigma * sigma)))
    return np.stack(maps, axis=2).astype(np.float32)


@dataclass
class SRFacialLandmarkDataset:
    """Facial image + landmark annotation dataset (reference
    sr_facial_landmark_dataset.py:11-66): a ``.npy`` annotation file holding
    a list of dicts ``{gt_path, bbox, shape, landmark}``; gt paths are
    joined onto ``gt_folder``.

    The DIC training protocol (reference restorers/dic.py train_step +
    dic_net.py's hardcoded 128px faces): gt resized to ``gt_size``,
    landmarks rescaled with it, lq = MATLAB-like bicubic downscale by
    ``scale``, heatmap = 68 Gaussian maps at ``gt_size/4``
    (GenerateHeatmap ori_size=128 target_size=32, sigma=1).
    """

    gt_folder: str
    ann_file: str
    scale: int = 8
    gt_size: int = 128
    sigma: float = 1.0
    test_mode: bool = False

    def __post_init__(self):
        infos = np.load(self.ann_file, allow_pickle=True)
        self.data_infos = []
        for info in infos:
            info = dict(info)
            info["gt_path"] = os.path.join(self.gt_folder, info["gt_path"])
            self.data_infos.append(info)

    def __len__(self):
        return len(self.data_infos)

    def load_index(self, idx: int) -> dict:
        from PIL import Image

        from .degradations import matlab_like_resize

        info = self.data_infos[idx]
        gt = _load_png(info["gt_path"]).astype(np.float32) / 255.0
        h0, w0 = gt.shape[:2]
        landmark = np.asarray(info["landmark"], np.float32)
        if (h0, w0) != (self.gt_size, self.gt_size):
            with Image.open(info["gt_path"]) as im:
                gt = (
                    np.asarray(
                        im.convert("RGB").resize(
                            (self.gt_size, self.gt_size), Image.BICUBIC
                        ),
                        np.float32,
                    )
                    / 255.0
                )
            landmark = landmark * np.asarray(
                [self.gt_size / w0, self.gt_size / h0], np.float32
            )
        lq = matlab_like_resize(gt, 1.0 / self.scale)
        heatmap = generate_heatmap(
            landmark,
            ori_size=self.gt_size,
            target_size=self.gt_size // 4,
            sigma=self.sigma,
        )
        return {
            "lq": lq.astype(np.float32),
            "gt": gt,
            "heatmap": heatmap,
            "landmark": landmark,
            "gt_path": info["gt_path"],
        }

    def sample(self, rng: np.random.Generator) -> dict:
        return self.load_index(int(rng.integers(0, len(self))))

    def __iter__(self):
        for i in range(len(self)):
            yield self.load_index(i)
