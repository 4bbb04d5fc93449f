#!/usr/bin/env python
"""Record the checkpoint-parity fixture: full-flagship-shape torch-oracle
outputs on the synthetic compressed-clip dataset.

The reference's de-facto regression check is running its ``tools/test.py``
with the released checkpoint and reading PSNR/SSIM
(/root/reference/tools/test.py:175-182). No released ``.pth`` is reachable
from this environment, so this script ARMS the gate with a recorded
fixture instead:

1. regenerate the deterministic synthetic dataset
   (tools/data/make_synthetic_dataset.write_dataset — same spec the gate
   regenerates at check time, so no PNG trees are committed);
2. build the reference's ACTUAL model code at the FULL flagship shape
   (mid_channels=64, num_blocks=8, K=6 — the shape the released
   checkpoint ships; the torch-oracle tests only cover NB=2/K=3) via the
   tests/oracle mmcv shim, weights from a fixed torch seed, rounded
   through fp16 so the stored npz is byte-exact the weights the oracle
   ran with;
3. run the torch model over every test clip loaded through OUR data
   pipeline (the same arrays the gate will feed the JAX model), recording
   per-clip outputs (fp16) + PSNR/SSIM computed with our cv2-oracle-tested
   metrics;
4. write tests/fixtures/parity/{state_dict.npz, expected.npz, spec.json}.

The gate (tools/parity_check.py --fixture, run in CI by
tests/test_parity_gate.py) converts the recorded state_dict through
core/convert.py, evaluates with the JAX model, and asserts both the
metric values and max|output diff| — its assert path now executes on
every CI run and fails on any converter/layout/numerics regression.

Usage:  python tools/record_parity_fixture.py [--out tests/fixtures/parity]
"""

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# deterministic spec, shared with the gate via spec.json
SPEC = {
    "clips": ["000", "011", "015", "020"],  # REDS4 partition names
    "frames": 8,
    "hw": [64, 64],
    "dataset_seed": 123,
    "weight_seed": 42,
    "mid_channels": 64,
    "num_blocks": 8,
    "num_experts": 6,
}


def build_dataset_from_spec(spec, root):
    from tools.data.make_synthetic_dataset import write_dataset

    write_dataset(
        root, spec["clips"], spec["frames"], *spec["hw"],
        seed=spec["dataset_seed"],
    )


def load_test_clips(spec, root):
    """Load every clip through our real test data pipeline (datasets.py
    CompressTestDataset: PNG + MV rasterizer + QP/slice lookup + /255)."""
    from pnp_vcve_tpu.core.builder import build_dataset
    from pnp_vcve_tpu.core.presets import flagship_data

    cfg = dict(flagship_data(
        test_lq=f"{root}/crf35/png",
        test_gt=f"{root}/sharp/png",
        test_qp_json=f"{root}/qp.json",
    )["test"])
    cfg["num_input_frames"] = spec["frames"]
    ds = build_dataset(cfg)
    return [ds.load_clip(i) for i in range(len(ds))]


def reference_generator(spec, torch):
    from tests.oracle.loader import load_ref

    mod = load_ref("mmedit.models.backbones.sr_backbones.iconvsr_ipb_par")
    torch.manual_seed(spec["weight_seed"])
    gen = mod.IconVSR_restore_wo_refill_mv_ipb_fast_domain_dynamic_with_par(
        mid_channels=spec["mid_channels"], num_blocks=spec["num_blocks"],
        num_experts=spec["num_experts"], padding=3, with_cat=True,
        use_base_qp=True, expert_softmax=True, init_weight=True,
        with_bias=True, with_se=True, with_par=True, one_layer=True,
        blocktype="drt", channel_first=True, sparse_val=False,
        align_key=True, vsr=False,
    )
    gen.eval()
    # round-trip fp16 so the stored npz carries the EXACT weights the
    # oracle ran with (fp32 would double the committed fixture size)
    sd = {k: v.detach().half().float() for k, v in gen.state_dict().items()}
    gen.load_state_dict(sd)
    return gen, {k: v.half().numpy() for k, v in sd.items()}


def torch_forward(gen, sample, torch):
    nchw = lambda a: torch.from_numpy(a).movedim(-1, 1)[None].float()
    scal = lambda a: torch.from_numpy(a)[None, :, None, None, None].float()
    with torch.no_grad():
        out = gen(
            nchw(sample["lq"]), scal(sample["qps"]), scal(sample["slices"]),
            nchw(sample["mvs"]), scal(sample["base_qps"]),
            nchw(sample["partitions"]),
        )
    return out[0].movedim(1, -1).numpy()  # (t, h, w, 3)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="tests/fixtures/parity")
    args = ap.parse_args()

    import numpy as np
    import torch

    from pnp_vcve_tpu.models.restorer import Restorer

    out_dir = Path(args.out)
    out_dir.mkdir(parents=True, exist_ok=True)

    with tempfile.TemporaryDirectory() as root:
        build_dataset_from_spec(SPEC, root)
        clips = load_test_clips(SPEC, root)
    gen, sd_f16 = reference_generator(SPEC, torch)

    restorer = Restorer(
        generator=None,
        test_cfg={"metrics": ["PSNR", "SSIM"], "crop_border": 0},
    )
    expected, metrics = {}, {}
    for sample in clips:
        name = sample["clip_name"]
        out = torch_forward(gen, sample, torch)
        expected[name] = out.astype(np.float16)
        metrics[name] = restorer.evaluate_clip(out, sample["gt"])
        print(f"{name}: " + ", ".join(
            f"{k}={v:.6f}" for k, v in metrics[name].items()))

    mean = {
        k: float(np.mean([m[k] for m in metrics.values()]))
        for k in next(iter(metrics.values()))
    }
    np.savez_compressed(out_dir / "state_dict.npz", **sd_f16)
    np.savez_compressed(out_dir / "expected.npz", **expected)
    (out_dir / "spec.json").write_text(json.dumps(
        {
            "spec": SPEC,
            "per_clip_metrics": {
                n: {k: float(v) for k, v in m.items()}
                for n, m in metrics.items()
            },
            "mean_metrics": mean,
            "torch_version": torch.__version__,
        },
        indent=2,
    ))
    sizes = {
        p.name: os.path.getsize(p) for p in out_dir.iterdir()
    }
    print(f"mean: {mean}")
    print(f"wrote {out_dir}: " + ", ".join(
        f"{n}={s/1e6:.1f}MB" for n, s in sorted(sizes.items())))


if __name__ == "__main__":
    main()
