"""pnp_vcve_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
Plug-and-Play Versatile Compressed Video Enhancement (CVPR 2025).

A from-scratch rebuild of the capabilities of the reference PyTorch/mmedit
implementation (ZeldaM1/PnP-VCVE), designed TPU-first:

- NHWC layouts, bf16-friendly compute, static shapes, ``lax.scan`` recurrence.
- Codec priors (H.264 motion vectors, per-frame QP / slice type, macroblock
  partition maps) are rasterized on the host and fed to the device as dense
  tensors; all data-dependent control flow (keyframe routing) is hoisted to
  host-precomputed index arrays.
- Parallelism via ``jax.sharding.Mesh`` + ``jit`` sharding annotations
  (data-parallel batch axis + spatial axis with XLA-managed halo exchange),
  not per-process NCCL.

Subpackages
-----------
core      config system (python-file configs, ``--cfg-options`` merge), registry
ops       warp / dynamic (MoE) conv / partition conv — jax ops + Pallas kernels
kernels   Pallas TPU kernels backing the hot ops
data      host-side codec-prior pipeline (MV rasterizer, datasets, loaders)
models    CAA hyper-network + BAE enhancement network + restorer wrappers
train     train/eval loops, optimizer, schedules, checkpointing
metrics   PSNR/SSIM with bit-parity to the reference protocol
parallel  mesh construction and sharding rules
apis      one-call inference helpers (reference ``mmedit/apis`` analog)
"""

__version__ = "0.1.0"
