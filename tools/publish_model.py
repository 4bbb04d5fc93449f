#!/usr/bin/env python
"""Publish a checkpoint: strip optimizer state, tag with a content hash
(reference tools/publish_model.py:18-31).

Usage: python tools/publish_model.py in_ckpt out_prefix
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pnp_vcve_tpu.utils import apply_platform_override
apply_platform_override()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("in_ckpt", help="checkpoint dir (train-state or params)")
    p.add_argument("out_prefix", help="output path prefix; -<hash8> appended")
    args = p.parse_args()

    from pnp_vcve_tpu.core.checkpoint import load_params, publish_params, save_params

    restored = load_params(args.in_ckpt)
    # strip optimizer state if this is a full train state
    params = restored.get("params", restored) if isinstance(restored, dict) else restored
    tmp = Path(args.out_prefix + "-tmp")
    save_params(tmp, params)
    dst = publish_params(tmp, args.out_prefix)
    import shutil

    shutil.rmtree(tmp)
    print(f"published -> {dst}")


if __name__ == "__main__":
    main()
