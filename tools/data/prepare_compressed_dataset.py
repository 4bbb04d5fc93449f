#!/usr/bin/env python
"""Prepare a compressed-video-enhancement dataset from sharp PNG clips.

Produces the layout the reference distributes pre-built (GoogleDrive; see
/root/reference/README.md:38-55) and that our datasets scan:

    out_root/
      sharp/png/<clip>/........png      (copied/linked ground truth)
      crf{15,25,35}/
        png/<clip>/%08d.png             (decoded compressed frames)
        mv/<clip>/%08d.npy              (per-frame MV records, (N, 10))
      qp.json                           (qp + slice type per crf/clip/frame)

Backends (auto-detected, overridable):
  - encode/decode: the ffmpeg CLI (libx264, zerolatency LDP GOP to match
    the reference's low-delay-P streams).
  - qp/slice: parsed from the x264 verbose per-frame log lines
    ("frame=   7 QP=23.51 ... type:P'" style) — pure-python parser, unit
    tested; works with any ffmpeg build.
  - motion vectors: PyAV (`av` package) reading the decoder's
    MOTION_VECTORS side data (+export_mvs). `--mv-backend zero` writes
    empty records instead (models then run with zero-motion priors) for
    environments without PyAV.

The synthetic generator (make_synthetic_dataset.py) produces the same
layout without any codec, for tests and smoke runs.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

import numpy as np

# x264 verbose frame line, e.g.:
#   x264 [debug]: frame=   0 QP=20.85 NAL=3 Slice:I Poc:0   I:3600 ...
_X264_FRAME_RE = re.compile(
    r"frame=\s*(\d+)\s+QP=([\d.]+)\s+NAL=\d+\s+Slice:([IPB])"
)


def parse_x264_frame_log(text: str):
    """x264 verbose stderr -> {frame_index: (qp, slice_type)}; pure."""
    out = {}
    for m in _X264_FRAME_RE.finditer(text):
        out[int(m.group(1))] = (float(m.group(2)), m.group(3))
    return out


def mv_records_from_sidedata(mvs, slice_type: str) -> np.ndarray:
    """AVMotionVector-like side data -> our (N, 10) rasterizer rows:
    ``(direction, w, h, x_w, y_w, x, y, motion_x, motion_y, scale)``
    (data/mv_raster.py:86-90). FFmpeg reports block CENTERS; the
    rasterizer expects top-left corners. direction = AVMotionVector.source
    (<0: predicted from the past -> the forward channels); pure."""
    rows = []
    for mv in mvs:
        w, h = int(mv.w), int(mv.h)
        rows.append(
            (
                float(mv.source),
                float(w),
                float(h),
                float(mv.src_x - w // 2),
                float(mv.src_y - h // 2),
                float(mv.dst_x - w // 2),
                float(mv.dst_y - h // 2),
                float(mv.motion_x),
                float(mv.motion_y),
                float(getattr(mv, "motion_scale", 4) or 4),
            )
        )
    if not rows:
        return np.zeros((0, 10), np.float32)
    return np.asarray(rows, np.float32)


def _require(cmd: str):
    if shutil.which(cmd) is None:
        raise SystemExit(
            f"'{cmd}' not found on PATH. This tool drives the ffmpeg CLI "
            "for encoding/decoding; install ffmpeg (with libx264) or "
            "prepare the dataset on a machine that has it. For codec-free "
            "smoke datasets use tools/data/make_synthetic_dataset.py."
        )


def _encode_clip(png_dir: str, out_mp4: str, crf: int, fps: int) -> str:
    """Encode a %08d.png sequence as low-delay-P x264; returns the stderr
    (carrying the per-frame QP/slice log)."""
    cmd = [
        "ffmpeg", "-y", "-v", "verbose", "-framerate", str(fps),
        "-i", os.path.join(png_dir, "%08d.png"),
        "-c:v", "libx264", "-crf", str(crf),
        # low-delay P (the reference's LDP streams): no B frames,
        # keyframes every 4th frame like the bitstream-prior protocol
        "-x264opts", "bframes=0:keyint=4:min-keyint=4:log=3",
        "-pix_fmt", "yuv420p", out_mp4,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg encode failed:\n{proc.stderr[-2000:]}")
    return proc.stderr


def _decode_clip(mp4: str, out_dir: str):
    os.makedirs(out_dir, exist_ok=True)
    proc = subprocess.run(
        ["ffmpeg", "-y", "-i", mp4, os.path.join(out_dir, "%08d.png"),
         "-start_number", "0"],
        capture_output=True, text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg decode failed:\n{proc.stderr[-2000:]}")


def _extract_mvs_pyav(mp4: str, out_dir: str, slice_types: dict):
    try:
        import av
    except ImportError:
        raise SystemExit(
            "PyAV ('av') is required for MV extraction; rerun with "
            "--mv-backend zero to write empty MV records instead."
        )
    os.makedirs(out_dir, exist_ok=True)
    with av.open(mp4) as container:
        stream = container.streams.video[0]
        ctx = stream.codec_context
        ctx.options = {"flags2": "+export_mvs"}
        for i, frame in enumerate(container.decode(stream)):
            side = frame.side_data.get("MOTION_VECTORS")
            st = slice_types.get(i, (0.0, "P"))[1]
            rec = mv_records_from_sidedata(side or [], st)
            np.save(os.path.join(out_dir, f"{i:08d}.npy"), rec)


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("sharp_root", help="dir of <clip>/<%%08d>.png GT clips")
    ap.add_argument("out_root")
    ap.add_argument("--crfs", type=int, nargs="+", default=[15, 25, 35])
    ap.add_argument("--fps", type=int, default=25)
    ap.add_argument(
        "--mv-backend", choices=["pyav", "zero"], default="pyav",
        help="'zero' writes empty MV records (zero-motion priors)",
    )
    args = ap.parse_args()

    _require("ffmpeg")
    clips = sorted(
        d for d in os.listdir(args.sharp_root)
        if os.path.isdir(os.path.join(args.sharp_root, d))
    )
    if not clips:
        raise SystemExit(f"no clip dirs under {args.sharp_root}")

    qp_json: dict = {}
    sharp_out = os.path.join(args.out_root, "sharp", "png")
    os.makedirs(sharp_out, exist_ok=True)
    for clip in clips:
        dst = os.path.join(sharp_out, clip)
        if not os.path.exists(dst):
            shutil.copytree(os.path.join(args.sharp_root, clip), dst)

    for crf in args.crfs:
        key = f"crf{crf}"
        qp_json[key] = {}
        for clip in clips:
            png_in = os.path.join(args.sharp_root, clip)
            work = os.path.join(args.out_root, key)
            mp4 = os.path.join(work, f"{clip}.mp4")
            os.makedirs(work, exist_ok=True)
            log = _encode_clip(png_in, mp4, crf, args.fps)
            frames = parse_x264_frame_log(log)
            # loader schema (data/qp_slice.py): unpadded index keys,
            # {"QP": float, "slice": "I"|"P"|"B"}
            qp_json[key][clip] = {
                str(i): {"QP": qp, "slice": st}
                for i, (qp, st) in sorted(frames.items())
            }
            _decode_clip(mp4, os.path.join(work, "png", clip))
            mv_dir = os.path.join(work, "mv", clip)
            if args.mv_backend == "pyav":
                _extract_mvs_pyav(mp4, mv_dir, frames)
            else:
                os.makedirs(mv_dir, exist_ok=True)
                for i in range(len(frames)):
                    np.save(
                        os.path.join(mv_dir, f"{i:08d}.npy"),
                        np.zeros((0, 10), np.float32),
                    )
            os.remove(mp4)
            print(f"[{key}] {clip}: {len(frames)} frames")

    with open(os.path.join(args.out_root, "qp.json"), "w") as f:
        json.dump(qp_json, f)
    print(f"wrote {args.out_root} ({len(clips)} clips x {len(args.crfs)} crfs)")


if __name__ == "__main__":
    main()
