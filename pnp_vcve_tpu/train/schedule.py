"""LR schedules.

:func:`cosine_restart_schedule` matches mmcv's CosineRestartLrUpdaterHook as
configured by the flagship config (configs/HR_davis_LR_128x128.py:219-224:
periods=[300000], restart_weights=[1], min_lr=1e-7): within each period,
``lr = min_lr + (base*wt - min_lr) * 0.5 * (1 + cos(pi * frac))``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import optax

__all__ = ["cosine_restart_schedule"]


def cosine_restart_schedule(
    base_lr: float,
    periods: Sequence[int],
    restart_weights: Sequence[float] = (1.0,),
    min_lr: float = 0.0,
) -> optax.Schedule:
    if len(periods) != len(restart_weights):
        raise ValueError("periods and restart_weights length mismatch")
    schedules = []
    for period, wt in zip(periods, restart_weights):
        peak = base_lr * wt
        # optax cosine_decay_schedule: peak * ((1-alpha) * cosine + alpha)
        schedules.append(
            optax.cosine_decay_schedule(peak, period, alpha=min_lr / peak)
        )
    boundaries = list(np.cumsum(periods)[:-1])
    return optax.join_schedules(schedules, boundaries)
