#!/usr/bin/env python
"""Protocol-scale end-to-end eval: the reference's regression protocol
(100-frame 720p clips -> per-clip PSNR/SSIM + PNG dump,
``/root/reference/tools/test.py:175-182``,
``mmedit/models/restorers/basicvsr.py:155-233``) run at full scale through
THIS repo's ``tools/dist_test.sh``, recorded as a JSON artifact.

Legs (each optional):

1. ``chip``  — full flagship shape (mid=64/nb=8/K=6) with the recorded
   full-shape parity weights (tests/fixtures/parity/state_dict.npz,
   converted through core/convert.py), 4 clips x --frames x 720p on the
   real TPU via ``--chunk-t`` (a full 720p clip's backward-feature buffer
   exceeds one chip's HBM; chunking is the designed single-chip protocol
   path, train/eval.py).
2. ``cpu`` — the SAME protocol geometry on the 8-virtual-device CPU mesh
   with a reduced-channel model: the UNCHUNKED whole-clip scan vs the
   exact multi-chip two-sweep pipeline (``--frame-parallel exact``),
   cross-checked for bitwise-equal PNGs and equal metrics. (``--chunk-t``
   windows are independent — carries reset at boundaries — so the exact
   pipeline's bit-equality reference is the unchunked scan.) This is the
   protocol-scale exactness proof for the multi-chip path
   (parallel/seqpar.py). Channel width is reduced because this host has
   ONE core (full shape runs ~33 s/frame at 720p on it); the protocol
   GEOMETRY (720p, 100 frames, pipeline chunking, halo carries) is kept.

Usage (records PROTOCOL_r05.json at the repo root):
  python tools/protocol_eval.py --root /tmp/pnp_protocol \
      --out PROTOCOL_r05.json
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EVAL_RE = re.compile(
    r"\[eval\] (\S+): PSNR=([\d.]+) SSIM=([\d.]+) \((\d+) frames, ([\d.]+)s\)"
)


def ensure_fixture(root: Path, clips, frames, height, width) -> None:
    spec = dict(clips=list(clips), frames=frames, height=height, width=width)
    spec_file = root / "fixture_spec.json"
    if (root / "qp.json").exists() and spec_file.exists():
        if json.loads(spec_file.read_text()) == spec:
            print(f"[protocol] fixture reused at {root}")
            return
    sys.path.insert(0, str(REPO / "tools" / "data"))
    from make_protocol_fixture import write_fixture

    t0 = time.time()
    write_fixture(root, clips=clips, frames=frames, height=height, width=width)
    spec_file.write_text(json.dumps(spec))
    print(f"[protocol] fixture written in {time.time() - t0:.0f}s")


def convert_parity_weights(out_dir: Path) -> tuple[Path, dict]:
    """tests/fixtures/parity/state_dict.npz -> orbax ckpt dir; returns
    (ckpt_path, spec)."""
    fdir = REPO / "tests" / "fixtures" / "parity"
    spec = json.loads((fdir / "spec.json").read_text())["spec"]
    ckpt = out_dir / "ckpt" / "0"
    if ckpt.exists():
        return ckpt, spec

    from pnp_vcve_tpu.core.checkpoint import CheckpointManager
    from pnp_vcve_tpu.core.convert import convert_generator_state_dict

    with np.load(fdir / "state_dict.npz") as z:
        sd = {k: z[k].astype(np.float32) for k in z.files}
    params = convert_generator_state_dict(sd, num_blocks=spec["num_blocks"])
    mgr = CheckpointManager(out_dir)
    mgr.save(0, params, wait=True)
    mgr.close()
    return ckpt, spec


def write_full_config(path: Path, root: Path, spec: dict) -> Path:
    """REDS4-protocol config (SRREDSMultipleGTCompressDataset, the exact
    reference eval dataset type) at the parity-fixture model shape."""
    path.write_text(f"""
from pnp_vcve_tpu.core.presets import flagship_data, flagship_model

exp_name = "protocol_eval_full"
model = flagship_model(
    mid_channels={spec["mid_channels"]}, num_blocks={spec["num_blocks"]},
    num_experts={spec["num_experts"]})
test_cfg = dict(metrics=["PSNR", "SSIM"], crop_border=0)
data = flagship_data(
    test_lq=r"{root}/crf15/png",
    test_gt=r"{root}/sharp/png",
    test_qp_json=r"{root}/qp.json",
)
""")
    return path


def write_cpu_config(path: Path, root: Path, mid: int, nb: int, k: int,
                     num_frames: int) -> Path:
    """Folder-scanning config (so the CPU leg can evaluate a clip subset)
    with the reduced-channel flagship; the same Compose pipeline stages as
    the REDS4 protocol config."""
    path.write_text(f"""
from pnp_vcve_tpu.core.presets import flagship_model

exp_name = "protocol_eval_cpu"
model = flagship_model(mid_channels={mid}, num_blocks={nb}, num_experts={k})
test_cfg = dict(metrics=["PSNR", "SSIM"], crop_border=0)
test_pipeline = [
    dict(type="GenerateSegmentIndices_LR", interval_list=[1]),
    dict(
        type="LoadImageFromFileList_ipb", key="lq", channel_order="rgb",
        random_compress=False, load_mv=True, load_qp_slice=True,
        load_base_qp=True, load_partition=True, drconv=True,
        qp_slice_file=r"{root}/qp.json",
    ),
    dict(type="LoadImageFromFileList", key="gt", channel_order="rgb"),
    dict(type="RescaleToZeroOne",
         keys=["lq", "gt", "base_QPs", "QPs", "partitions"]),
]
data = dict(
    test=dict(
        type="DAVISMultipleGTCompressDataset",
        lq_folder=r"{root}/cpu_view/crf15/png",
        gt_folder=r"{root}/cpu_view/sharp/png",
        num_input_frames={num_frames},
        pipeline=test_pipeline,
        scale=1,
        test_mode=True,
    ),
)
""")
    return path


def make_cpu_view(root: Path, clips) -> None:
    """Symlink the first N clips into a pruned folder view (the
    folder-scanning dataset evaluates whatever directories exist)."""
    for src_parts, dst in (
        (("crf15", "png"), root / "cpu_view" / "crf15" / "png"),
        (("sharp", "png"), root / "cpu_view" / "sharp" / "png"),
    ):
        dst.mkdir(parents=True, exist_ok=True)
        for c in clips:
            link = dst / c
            if not link.exists():
                link.symlink_to(root / src_parts[0] / src_parts[1] / c)
    mv = root / "cpu_view" / "crf15" / "mv"
    if not mv.exists():
        mv.symlink_to(root / "crf15" / "mv")


def run_leg(cfg: Path, ckpt: str, extra: list[str], save: Path,
            env_over: dict | None = None) -> dict:
    env = dict(os.environ)
    env.update(env_over or {})
    cmd = [
        "bash", str(REPO / "tools" / "dist_test.sh"), str(cfg), ckpt, "1",
        "--save-path", str(save), "--save-image",
    ] + extra
    print("[protocol] run:", " ".join(cmd), flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True)
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-6000:])
        raise RuntimeError(f"leg failed rc={proc.returncode}")
    per_clip = {
        m.group(1): dict(PSNR=float(m.group(2)), SSIM=float(m.group(3)),
                         frames=int(m.group(4)), seconds=float(m.group(5)))
        for m in EVAL_RE.finditer(proc.stdout)
    }
    if not per_clip:
        raise RuntimeError("no per-clip [eval] lines parsed:\n"
                           + proc.stdout[-2000:])
    return dict(per_clip=per_clip, wall_seconds=round(wall, 2))


def compare_outputs(dir_a: Path, dir_b: Path) -> dict:
    """Max uint8 diff over all saved PNGs common to both runs."""
    from PIL import Image

    worst, n = 0, 0
    for pa in sorted(dir_a.glob("*/*.png")):
        pb = dir_b / pa.parent.name / pa.name
        if not pb.exists():
            continue
        a = np.asarray(Image.open(pa), np.int16)
        b = np.asarray(Image.open(pb), np.int16)
        worst = max(worst, int(np.abs(a - b).max()))
        n += 1
    return dict(frames_compared=n, max_uint8_diff=worst)


def run_protocol(args) -> dict:
    root = Path(args.root)
    clips = tuple(args.clips.split(","))
    ensure_fixture(root, clips, args.frames, args.height, args.width)

    artifact = dict(
        fixture=dict(clips=list(clips), frames=args.frames,
                     height=args.height, width=args.width),
        protocol="reference tools/test.py 100-frame clip eval "
                 "(per-clip PSNR/SSIM + PNG dump)",
    )

    # degradation floor so enhancement deltas are readable
    from PIL import Image

    from pnp_vcve_tpu.metrics.quality import psnr as _psnr

    lq0 = np.asarray(Image.open(
        root / "crf15" / "png" / clips[0] / "00000000.png"), np.float32)
    gt0 = np.asarray(Image.open(
        root / "sharp" / "png" / clips[0] / "00000000.png"), np.float32)
    artifact["input_psnr_frame0"] = round(float(_psnr(lq0, gt0)), 4)

    if not args.skip_chip:
        ckpt, spec = convert_parity_weights(root / "converted_full")
        cfg = write_full_config(root / "cfg_full.py", root, spec)
        res = run_leg(
            cfg, str(ckpt),
            ["--chunk-t", str(args.chunk_t), "--cfg-options",
             f"data.test.num_input_frames={args.frames}"],
            root / "out_chip")
        total_frames = sum(c["frames"] for c in res["per_clip"].values())
        eval_seconds = sum(c["seconds"] for c in res["per_clip"].values())
        res["frames_per_second_eval"] = round(total_frames / eval_seconds, 3)
        res["chunk_t"] = args.chunk_t
        res["note"] = (
            "chunk_t windows are independent (carries reset at chunk "
            "boundaries) — the designed single-chip HBM path; the exact "
            "full-context path is --frame-parallel exact on a mesh "
            "(cpu_mesh_exactness leg)")
        res["weights"] = (
            "tests/fixtures/parity state_dict (full flagship shape, "
            "torch-oracle-anchored; synthetic weights — PSNR is a plumbing "
            "check, not a quality claim)")
        artifact["chip_chunked_full_shape"] = res

    if not args.skip_cpu:
        cpu_clips = clips[: args.cpu_clips]
        make_cpu_view(root, cpu_clips)
        cfg = write_cpu_config(root / "cfg_cpu.py", root, args.cpu_mid,
                               args.cpu_blocks, args.cpu_experts,
                               args.cpu_frames or args.frames)
        env = {
            "PNP_PLATFORM": "cpu",
            "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8",
        }
        # NO --chunk-t here: chunked windows are independent (carries reset
        # at chunk boundaries — the documented single-chip HBM workaround),
        # so the bit-equality reference for the exact pipeline is the
        # UNCHUNKED whole-clip scan, which host RAM can hold.
        a = run_leg(cfg, "-", [], root / "out_cpu_scan", env_over=env)
        b = run_leg(cfg, "-", ["--frame-parallel", "exact",
                               "--stream-clips", str(args.stream_clips)],
                    root / "out_cpu_exact", env_over=env)
        cmp = compare_outputs(root / "out_cpu_scan", root / "out_cpu_exact")
        for clip, m in a["per_clip"].items():
            mb = b["per_clip"][clip]
            if (m["PSNR"], m["SSIM"]) != (mb["PSNR"], mb["SSIM"]):
                raise AssertionError(f"metrics differ for {clip}: {m} vs {mb}")
        if cmp["frames_compared"] == 0 or cmp["max_uint8_diff"] != 0:
            raise AssertionError(f"exact-pipeline outputs differ: {cmp}")
        artifact["cpu_mesh_exactness"] = dict(
            model=(f"mid={args.cpu_mid}/nb={args.cpu_blocks}"
                   f"/K={args.cpu_experts}"),
            clips=list(cpu_clips),
            whole_clip_scan=a, exact_pipeline=b, cross_check=cmp,
            verdict="exact pipeline bitwise-equal to the single-device "
                    "scan at protocol geometry",
        )
    return artifact


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="/tmp/pnp_protocol")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--clips", default="000,011,015,020")
    p.add_argument("--chunk-t", type=int, default=20)
    p.add_argument("--skip-chip", action="store_true")
    p.add_argument("--skip-cpu", action="store_true")
    p.add_argument("--cpu-mid", type=int, default=16)
    p.add_argument("--cpu-blocks", type=int, default=2)
    p.add_argument("--cpu-experts", type=int, default=3)
    p.add_argument("--cpu-clips", type=int, default=2,
                   help="CPU legs evaluate the first N clips")
    p.add_argument("--cpu-frames", type=int, default=None,
                   help="override frame count for the CPU legs")
    p.add_argument("--stream-clips", type=int, default=2)
    p.add_argument("--out", default=None, help="JSON artifact path")
    args = p.parse_args()

    artifact = run_protocol(args)
    if args.out:
        Path(args.out).write_text(json.dumps(artifact, indent=1))
        print(f"[protocol] artifact -> {args.out}")
    print(json.dumps(artifact, indent=1)[:3000])


if __name__ == "__main__":
    main()
