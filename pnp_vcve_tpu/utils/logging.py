"""Logging & environment reporting.

Reference surface: ``get_root_logger`` with per-rank silencing
(mmedit/utils/logger.py:7-27), ``collect_env`` startup report
(tools/train.py:119-123), TextLoggerHook/TensorboardLoggerHook
(configs/HR_davis_LR_128x128.py:229-234). ``setup_multi_processes``
(utils/setup_env.py:10-47) clamps cv2/OMP threads for fork-based torch
dataloader workers — our loader is threaded in-process, so only the OMP
clamp carries over (optional).
"""

from __future__ import annotations

import logging
import sys
import time
from pathlib import Path
from typing import Optional

__all__ = ["get_root_logger", "collect_env", "TensorboardWriter"]

_LOGGER_NAME = "pnp_vcve_tpu"
_initialized = False


def get_root_logger(
    log_file: Optional[str] = None, log_level: int = logging.INFO
) -> logging.Logger:
    """Timestamped root logger; non-zero ranks are silenced to ERROR
    (reference logger.py:7-27 semantics)."""
    global _initialized
    logger = logging.getLogger(_LOGGER_NAME)
    if _initialized:
        return logger
    _initialized = True

    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file is not None:
        Path(log_file).parent.mkdir(parents=True, exist_ok=True)
        fh = logging.FileHandler(log_file)
        fh.setFormatter(fmt)
        logger.addHandler(fh)

    try:
        import jax

        rank = jax.process_index()
    except Exception:
        rank = 0
    logger.setLevel(log_level if rank == 0 else logging.ERROR)
    logger.propagate = False
    return logger


def collect_env() -> dict:
    """Environment report (reference collect_env, printed at train start)."""
    import platform

    info = {
        "python": sys.version.replace("\n", " "),
        "platform": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["jax_backend"] = jax.default_backend()
        info["devices"] = ", ".join(str(d) for d in jax.devices())
        info["process_count"] = jax.process_count()
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable ({e})"
    for mod in ("flax", "optax", "orbax.checkpoint", "numpy"):
        try:
            import importlib

            info[mod] = importlib.import_module(mod).__version__
        except Exception:
            pass
    return info


class TensorboardWriter:
    """Scalar writer on tensorboardX (the reference's commented-out
    TensorboardLoggerHook, config :229-234); no-ops when tensorboardX is
    unavailable or on non-zero ranks."""

    def __init__(self, log_dir: str):
        self._w = None
        try:
            import jax

            if jax.process_index() != 0:
                return
        except Exception:
            pass
        try:
            from tensorboardX import SummaryWriter

            self._w = SummaryWriter(log_dir)
        except Exception:
            pass

    def scalars(self, step: int, **values: float):
        if self._w is None:
            return
        for k, v in values.items():
            self._w.add_scalar(k, v, step)

    def close(self):
        if self._w is not None:
            self._w.close()
