#!/usr/bin/env python
"""Convert a reference PyTorch .pth checkpoint to an orbax param checkpoint.

Usage:
    python tools/convert_checkpoint.py ref.pth out_dir [--num-blocks 8] [--vsr]

torch is used only to deserialize the .pth; the framework itself never
imports it.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("src", help=".pth checkpoint (reference format)")
    p.add_argument("dst", help="output orbax checkpoint dir")
    p.add_argument("--num-blocks", type=int, default=8)
    p.add_argument("--vsr", action="store_true")
    args = p.parse_args()

    import numpy as np
    import torch

    from pnp_vcve_tpu.core.convert import convert_generator_state_dict
    from pnp_vcve_tpu.core.checkpoint import save_params

    ckpt = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}
    params = convert_generator_state_dict(sd, num_blocks=args.num_blocks, vsr=args.vsr)
    save_params(args.dst, params)
    n = sum(int(np.prod(v.shape)) for v in _leaves(params))
    print(f"converted {n/1e6:.2f}M params -> {args.dst}")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
