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

__all__ = [
    "CheckpointManager",
    "save_params",
    "load_params",
    "restore_train_state",
    "publish_params",
]


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
    """Load a weight pytree from a checkpoint dir.

    Accepts both bare-params checkpoints and full-train-state payloads
    (``{'step', 'params'[, 'opt_state']}`` as written by the training loop) —
    the latter are unwrapped to their ``params`` item, mirroring the
    reference's load_checkpoint reading the ``state_dict`` key of a .pth."""
    path = Path(path).absolute()
    # CheckpointManager step dirs nest the pytree under the 'default' item
    if (path / "default").is_dir():
        path = path / "default"
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path)
    if isinstance(restored, dict) and "params" in restored and "step" in restored:
        restored = restored["params"]
    if template is not None:
        import jax.numpy as jnp

        return jax.tree_util.tree_map(
            lambda t, v: jnp.asarray(v, getattr(t, "dtype", None)),
            template,
            restored,
        )
    return restored


def restore_train_state(path: str | Path, state: Any):
    """Restore a FULL TrainState (params + opt_state + step) saved by the
    training loop, so a resumed run continues the Adam moments and the
    LR-schedule position exactly (reference resume_from semantics,
    mmedit/apis/train.py:235-238). Falls back to weights-only when the
    checkpoint predates optimizer saving. Returns ``(new_state, start_iter)``.

    ``path`` may be a work dir (containing ``ckpt/``), a ``ckpt/`` root, or a
    single step dir.
    """
    import jax.numpy as jnp

    from pnp_vcve_tpu.train.loop import state_payload

    path = Path(path).absolute()
    if (path / "ckpt").is_dir():
        workdir = path
    elif path.name == "ckpt":
        workdir = path.parent
    else:
        # a single step dir (or a bare StandardCheckpointer dir): weights only
        params = load_params(path, template=jax.device_get(state.params))
        return state.replace(params=params), 0

    mgr = CheckpointManager(workdir)
    step = mgr.latest_step()
    if step is None:
        return state, 0
    template = state_payload(state, save_optimizer=True)
    try:
        restored = mgr.restore(step, template=template)
        return (
            state.replace(
                step=jnp.asarray(restored["step"]),
                params=restored["params"],
                opt_state=restored["opt_state"],
            ),
            int(restored["step"]),
        )
    except Exception:
        params = load_params(mgr.path / str(step), template=template["params"])
        return state.replace(params=params, step=jnp.asarray(step)), step


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
