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

__all__ = [
    "evaluate_dataset",
    "enhance_clip",
    "enhance_clip_frame_parallel",
    "is_mirror_extended",
]


def _save_frames(frames_u8: np.ndarray, clip_name: str, save_path: str):
    out_dir = Path(save_path) / clip_name
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, f in enumerate(frames_u8):
        Image.fromarray(f).save(out_dir / f"{i:08d}.png")


def is_mirror_extended(lq: np.ndarray) -> bool:
    """Host-side mirror-extension check (reference check_if_mirror_extended,
    basicvsr_net.py:69-83): the i-th frame equals the (t-1-i)-th."""
    t = lq.shape[0]
    if t % 2:
        return False
    half = np.asarray(lq[: t // 2])
    return bool(np.array_equal(half, np.asarray(lq[::-1][: t // 2])))


def enhance_clip(eval_step, params, sample: dict, chunk_t: Optional[int] = None):
    """Run the generator over one clip sample; returns (t, h, w, 3) float."""
    t = sample["lq"].shape[0]
    spans = (
        [(0, t)]
        if not chunk_t or chunk_t >= t
        else [(s, min(s + chunk_t, t)) for s in range(0, t, chunk_t)]
    )
    mirror = len(spans) == 1 and is_mirror_extended(sample["lq"])
    outs = []
    for s, e in spans:
        batch = {
            k: np.asarray(sample[k][s:e])[None]
            for k in ("lq", "qps", "slices", "mvs", "base_qps", "partitions")
        }
        kw = {"is_mirror_extended": True} if mirror else {}
        outs.append(np.asarray(jax.device_get(eval_step(params, batch, **kw))[0]))
    return np.concatenate(outs, axis=0)


def evaluate_dataset(
    restorer: Restorer,
    params,
    dataset: Iterable[dict],
    save_path: Optional[str] = None,
    save_image: bool = False,
    chunk_t: Optional[int] = None,
    verbose: bool = True,
    cascade=None,
    distributed: bool = False,
    frame_parallel: Optional[str] = None,
    stream_clips: int = 1,
) -> Dict[str, float]:
    """``cascade``: optional (step_fn, params, restorer) triple — enhanced
    frames are fed plug-and-play to a downstream VSR model and the metrics
    are computed on ITS output (reference tools/test.py:121-134).

    ``frame_parallel='exact'``: run each clip through the EXACT chunked
    two-sweep pipeline over all local devices (parallel/seqpar.py) —
    numerically identical to the single-device scan, unlike the
    overlapped-window approximation of enhance_clip_frame_parallel.
    ``stream_clips=B>1`` batches same-shape consecutive clips through the
    B/(B+D-1) streaming schedule (enhance_clips_exact_stream) instead of
    paying the fill/drain bubble per clip; metrics are unchanged
    (bitwise-equal outputs), only throughput improves.

    ``distributed=True``: each process evaluates its rank-strided clip
    shard and the dataset mean is the exact count-weighted cross-host
    reduction (parallel/multihost.py — replaces the reference's pickle
    gathers, apis/test.py:129-234). Images are saved host-locally."""
    eval_step = make_eval_step(restorer.generator)
    per_clip = []
    if frame_parallel == "exact":
        from jax.sharding import Mesh

        from pnp_vcve_tpu.parallel.seqpar import (
            enhance_clip_exact_pipeline,
            enhance_clips_exact_stream,
            largest_divisor_chunks,
        )

        devices = np.array(jax.devices())
    if distributed:
        from pnp_vcve_tpu.parallel.multihost import shard_clips

        n = len(dataset)  # type: ignore[arg-type]
        idxs = shard_clips(n, jax.process_index(), jax.process_count())
        samples = (dataset.load_clip(i) for i in idxs)  # type: ignore[attr-defined]
    else:
        samples = dataset
    def _enhanced():
        """Yield (sample, out, seconds-per-clip) in dataset order."""
        if frame_parallel == "exact" and stream_clips > 1:
            buf = []

            def flush():
                if not buf:
                    return
                t0 = time.perf_counter()
                d = largest_divisor_chunks(buf[0]["lq"].shape[0], len(devices))
                outs = enhance_clips_exact_stream(
                    restorer.generator, params, buf,
                    Mesh(devices[:d], ("sp",)),
                )
                dt = (time.perf_counter() - t0) / len(buf)
                for pair in zip(list(buf), outs):
                    yield (*pair, dt)
                buf.clear()

            for sample in samples:
                if buf and (
                    len(buf) >= stream_clips
                    or sample["lq"].shape != buf[0]["lq"].shape
                ):
                    yield from flush()
                buf.append(sample)
            yield from flush()
            return
        for sample in samples:
            t0 = time.perf_counter()
            if frame_parallel == "exact":
                t_clip = sample["lq"].shape[0]
                d = largest_divisor_chunks(t_clip, len(devices))
                out = enhance_clip_exact_pipeline(
                    restorer.generator, params, sample,
                    Mesh(devices[:d], ("sp",)),
                )
            else:
                out = enhance_clip(eval_step, params, sample, chunk_t=chunk_t)
            yield sample, out, time.perf_counter() - t0

    for sample, out, dt in _enhanced():
        if cascade is not None:
            casc_step, casc_params, _ = cascade
            out = np.asarray(jax.device_get(casc_step(casc_params, out[None]))[0])
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
    if distributed:
        from pnp_vcve_tpu.parallel.multihost import allreduce_clip_metrics

        agg = allreduce_clip_metrics(per_clip)
    else:
        agg = average_clip_metrics(per_clip)
    if verbose and agg:
        print("[eval] dataset mean: " + " ".join(f"{k}={v:.4f}" for k, v in agg.items()))
    return agg


def evaluate_dataset_mfqe_joint(
    pqf_model,
    pqf_variables,
    nonpqf_model,
    nonpqf_variables,
    dataset: Iterable[dict],
    restorer: Restorer,
    save_path: Optional[str] = None,
    save_image: bool = False,
    verbose: bool = True,
) -> Dict[str, float]:
    """The MFQE two-model joint test protocol over a clip dataset
    (reference mmedit/models/restorers/mfqev2_restorer.py:14- + the MFQE
    2.0 cascade): enhance PQFs first with the PQF checkpoint, then each
    non-PQF referencing the ENHANCED neighboring PQFs, per clip; metrics
    as in the standard eval path.

    ``*_variables`` are FULL variable dicts (params + batch_stats — the
    MFQE nets carry BatchNorm running stats)."""
    from pnp_vcve_tpu.models.baselines.mfqev2 import mfqe_joint_enhance

    pqf_apply = jax.jit(lambda lrs: pqf_model.apply(pqf_variables, lrs))
    nonpqf_apply = jax.jit(lambda lrs: nonpqf_model.apply(nonpqf_variables, lrs))
    per_clip = []
    for sample in dataset:
        t0 = time.perf_counter()
        frames = np.asarray(sample["lq"], np.float32)
        letters = [chr(int(round(float(c)))) for c in np.asarray(sample["slices"])]
        out = mfqe_joint_enhance(pqf_apply, nonpqf_apply, frames, letters)
        dt = time.perf_counter() - t0
        clip_name = sample.get("clip_name", f"clip{len(per_clip):03d}")
        metrics = restorer.evaluate_clip(out, sample["gt"])
        per_clip.append(metrics)
        if verbose:
            msg = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            print(
                f"[mfqe-joint] {clip_name}: {msg} "
                f"({out.shape[0]} frames, {dt:.2f}s)"
            )
        if save_image and save_path:
            _save_frames(
                np.stack([tensor2img(f) for f in out]), clip_name, save_path
            )
    agg = average_clip_metrics(per_clip)
    if verbose and agg:
        print(
            "[mfqe-joint] dataset mean: "
            + " ".join(f"{k}={v:.4f}" for k, v in agg.items())
        )
    return agg


def enhance_clip_frame_parallel(
    eval_step,
    params,
    sample: dict,
    mesh,
    chunk_t: int,
    halo_t: int = 2,
):
    """Frame-parallel clip enhancement across a device mesh.

    The bidirectional recurrence is sequential in time, so exact multi-chip
    scaling of ONE clip is a pipeline with no single-clip speedup. Instead
    the clip is split into overlapped windows (each window = chunk + halo_t
    context frames on each side, first/last window frames acting as forced
    keyframes exactly like any clip boundary), the windows are batched and
    sharded over the mesh's dp axis, and each device runs the full two-sweep
    propagation on its window; the halo frames are dropped on stitch.

    This generalizes chunked eval (halo_t=0 == ``enhance_clip(chunk_t=...)``)
    with approximation error that decays in halo_t; it has no reference
    counterpart (the reference runs 100-frame clips sequentially on one GPU,
    SURVEY §5.7).
    """
    from pnp_vcve_tpu.parallel.sharding import batch_sharding

    keys = ("lq", "qps", "slices", "mvs", "base_qps", "partitions")
    t = sample["lq"].shape[0]
    n_dev = mesh.devices.size

    starts = list(range(0, t, chunk_t))
    windows = []
    spans = []
    for s in starts:
        e = min(s + chunk_t, t)
        ws = max(0, s - halo_t)
        we = min(t, e + halo_t)
        windows.append((ws, we))
        spans.append((s - ws, e - ws))

    # pad the window list to a multiple of the device count and pad every
    # window to a common length (repeat-edge padding on the time axis)
    wlen = max(we - ws for ws, we in windows)
    while len(windows) % n_dev:
        windows.append(windows[-1])
        spans.append((0, 0))  # contributes nothing

    batch = {}
    for k in keys:
        arrs = []
        for ws, we in windows:
            a = np.asarray(sample[k][ws:we])
            if a.shape[0] < wlen:  # repeat-edge pad
                pad = [(0, wlen - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
                a = np.pad(a, pad, mode="edge")
            arrs.append(a)
        batch[k] = jax.device_put(
            np.stack(arrs), batch_sharding(mesh, ndim=np.stack(arrs).ndim)
        )

    out = np.asarray(jax.device_get(eval_step(params, batch)))
    pieces = []
    for i, (s0, e0) in enumerate(spans):
        if e0 > s0:
            pieces.append(out[i, s0:e0])
    return np.concatenate(pieces, axis=0)
