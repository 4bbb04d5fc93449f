#!/usr/bin/env python
"""Package a (config, checkpoint) pair into a self-contained servable
directory — the TPU-native analog of the reference's
tools/deployment/mmedit2torchserve.py:15-66 (which builds a torchserve
`.mar`). There is no torchserve on TPU; the servable is a plain directory
the serving handler (tools/deployment/serving_handler.py) loads:

    <output-folder>/<model-name>/
        MANIFEST.json     model name/version, entry config, ckpt pointer
        config.py         the frozen config (copied verbatim)
        params/           the orbax/msgpack checkpoint payload (copied)

Usage (CLI mirrors the reference packager):
    python tools/deployment/pnp2servable.py CONFIG CHECKPOINT \
        --output-folder DIR [--model-name NAME] [--model-version 1.0] [--force]

``CHECKPOINT`` may be '-' for a random-init servable (smoke/deploy tests).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def pnp2servable(
    config_file: str,
    checkpoint: str,
    output_folder: str,
    model_name: str | None = None,
    model_version: str = "1.0",
    force: bool = False,
) -> Path:
    cfg_path = Path(config_file)
    if not cfg_path.is_file():
        raise FileNotFoundError(f"config not found: {cfg_path}")
    name = model_name or cfg_path.stem
    out = Path(output_folder) / name
    if out.exists():
        if not force:
            raise FileExistsError(f"{out} exists (use --force to overwrite)")
        shutil.rmtree(out)
    out.mkdir(parents=True)

    shutil.copy2(cfg_path, out / "config.py")
    if checkpoint != "-":
        src = Path(checkpoint)
        if not src.exists():
            raise FileNotFoundError(f"checkpoint not found: {src}")
        if src.is_dir():  # orbax checkpoint directory
            shutil.copytree(src, out / "params")
        else:  # single-file (msgpack/published) payload
            (out / "params").mkdir()
            shutil.copy2(src, out / "params" / src.name)

    manifest = {
        "model": {
            "modelName": name,
            "modelVersion": model_version,
            "configFile": "config.py",
            "serializedFile": "params" if checkpoint != "-" else None,
        },
        "runtime": "jax",
    }
    (out / "MANIFEST.json").write_text(json.dumps(manifest, indent=2))
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config")
    p.add_argument("checkpoint", help="orbax ckpt dir, published file, or '-'")
    p.add_argument("--output-folder", required=True)
    p.add_argument("--model-name", default=None)
    p.add_argument("--model-version", default="1.0")
    p.add_argument("-f", "--force", action="store_true")
    args = p.parse_args()
    out = pnp2servable(
        args.config, args.checkpoint, args.output_folder,
        args.model_name, args.model_version, args.force,
    )
    print(f"servable written to {out}")


if __name__ == "__main__":
    main()
