"""Checkpointing via Orbax (reference: mmcv CheckpointHook every 2000 iters
with optimizer state, configs/HR_davis_LR_128x128.py:226; resume_from /
load_from semantics, mmedit/apis/train.py:235-238)."""

from __future__ import annotations

import hashlib
import shutil
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["CheckpointManager", "save_params", "load_params", "publish_params"]


class CheckpointManager:
    """Step-indexed checkpoint dir: <workdir>/ckpt/<step>/ with retention."""

    def __init__(self, workdir: str | Path, max_to_keep: int = 5):
        self.path = Path(workdir).absolute() / "ckpt"
        self.path.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.path,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any, wait: bool = False):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None):
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(path: str | Path, params: Any):
    """Save a bare param pytree (weights-only, 'load_from' style)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str | Path, template: Any = None):
    path = Path(path).absolute()
    # CheckpointManager step dirs nest the pytree under the 'default' item
    if (path / "default").is_dir():
        path = path / "default"
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, template) if template is not None else ckptr.restore(path)


def publish_params(src: str | Path, dst_prefix: str | Path) -> Path:
    """Weights-only publish with content-hash suffix
    (reference tools/publish_model.py:18-31: strip optimizer, sha256 tag)."""
    src = Path(src)
    hasher = hashlib.sha256()
    for f in sorted(src.rglob("*")):
        if f.is_file():
            hasher.update(f.read_bytes())
    tag = hasher.hexdigest()[:8]
    dst = Path(f"{dst_prefix}-{tag}")
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(src, dst)
    return dst
