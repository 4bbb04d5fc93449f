"""Evaluation harness: full-clip enhancement + sequence metrics.

Equivalent of the reference test path (tools/test.py ->
mmedit/apis/test.py:13-126 -> BasicVSR.forward_test,
restorers/basicvsr.py:155-233): per clip, run the generator over the whole
sequence, compute per-frame PSNR/SSIM on uint8-quantized frames, average
per clip then over the dataset, optionally dump PNGs as
``<save_path>/<clip>/<i:08d>.png``.

Memory note: the recurrence carries a ``(1, t, h, w, c)`` feature buffer in
HBM (the reference holds the same as a Python list of CUDA tensors). For
long 720p clips that exceeds a single chip's HBM; ``chunk_t`` splits the
clip into independent windows (each window's first/last frames are forced
keyframes, like any clip boundary). Full-clip parity eval requires enough
HBM or the multi-chip sequence-parallel path.
"""

from __future__ import annotations

import time
from pathlib import Path
from typing import Dict, Iterable, Optional

import jax
import numpy as np
from PIL import Image

from pnp_vcve_tpu.metrics import tensor2img
from pnp_vcve_tpu.models.restorer import Restorer, average_clip_metrics
from pnp_vcve_tpu.train.train_step import make_eval_step

__all__ = ["evaluate_dataset", "enhance_clip"]


def _save_frames(frames_u8: np.ndarray, clip_name: str, save_path: str):
    out_dir = Path(save_path) / clip_name
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, f in enumerate(frames_u8):
        Image.fromarray(f).save(out_dir / f"{i:08d}.png")


def enhance_clip(eval_step, params, sample: dict, chunk_t: Optional[int] = None):
    """Run the generator over one clip sample; returns (t, h, w, 3) float."""
    t = sample["lq"].shape[0]
    spans = (
        [(0, t)]
        if not chunk_t or chunk_t >= t
        else [(s, min(s + chunk_t, t)) for s in range(0, t, chunk_t)]
    )
    outs = []
    for s, e in spans:
        batch = {
            k: np.asarray(sample[k][s:e])[None]
            for k in ("lq", "qps", "slices", "mvs", "base_qps", "partitions")
        }
        outs.append(np.asarray(jax.device_get(eval_step(params, batch))[0]))
    return np.concatenate(outs, axis=0)


def evaluate_dataset(
    restorer: Restorer,
    params,
    dataset: Iterable[dict],
    save_path: Optional[str] = None,
    save_image: bool = False,
    chunk_t: Optional[int] = None,
    verbose: bool = True,
) -> Dict[str, float]:
    eval_step = make_eval_step(restorer.generator)
    per_clip = []
    for sample in dataset:
        t0 = time.perf_counter()
        out = enhance_clip(eval_step, params, sample, chunk_t=chunk_t)
        dt = time.perf_counter() - t0
        clip_name = sample.get("clip_name", f"clip{len(per_clip):03d}")
        metrics = restorer.evaluate_clip(out, sample["gt"])
        per_clip.append(metrics)
        if verbose:
            msg = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(f"[eval] {clip_name}: {msg} ({out.shape[0]} frames, {dt:.2f}s)")
        if save_image and save_path:
            _save_frames(
                np.stack([tensor2img(f) for f in out]), clip_name, save_path
            )
    agg = average_clip_metrics(per_clip)
    if verbose and agg:
        print("[eval] dataset mean: " + " ".join(f"{k}={v:.4f}" for k, v in agg.items()))
    return agg
