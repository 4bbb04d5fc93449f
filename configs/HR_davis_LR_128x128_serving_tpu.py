"""Flagship serving config: the TPU fast path for test/deploy runs.

Same weights/architecture as configs/HR_davis_LR_128x128.py, with the
TPU-only serving knobs on:
- ``use_pallas_kernels``: fused packed-PF DRT stack + fused input conv
  and reconstruction head (kernels/drt_stack.py).
- ``warp_impl='pf'``: PF-resident pipeline — recurrent carries stay in
  the packed PF layout and the MV warp runs as the banded selection-
  matmul kernel (kernels/warp_pf.py). Serving contract: exact for
  8x8-block-constant MV maps (what data/mv_raster.py rasterizes from the
  bitstream) with |MV| <= 16 px (the H.264 search range; larger motion
  clamps). For cropped or non-rasterized inputs use the base config
  (train_step refuses these modes outright).

Use with tools/dist_test.sh / tools/deploy_test.py; training on this
config is rejected by design.

Batch recommendation: b=1. Measured on the round-4 kernels (v5e chip):
b=1 20.14 f/s, b=2 20.24 f/s aggregate — +0.5% throughput for 2x the
per-clip latency, so concurrent clips only pay off when latency is
irrelevant. Full input contract: docs/serving_contract.md.
"""

_base_ = ["./HR_davis_LR_128x128.py"]

exp_name = "HR_davis_LR_128x128_serving_tpu"

model = dict(
    generator=dict(
        use_pallas_kernels=True,
        warp_impl="pf",
    )
)

work_dir = f"./work_dirs/{exp_name}"
