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

__all__ = ["cosine_restart_schedule", "linear_schedule", "reduce_on_plateau"]


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


def linear_schedule(base_lr: float, target_ratio=(1.0, 0.01), total_iters: int = 300_000):
    """mmedit LinearLrUpdaterHook (core/scheduler/lr_updater.py:6-52):
    linear ramp between base_lr*start and base_lr*end over total_iters."""
    start, end = target_ratio

    def fn(step):
        import jax.numpy as jnp

        frac = jnp.clip(step / total_iters, 0.0, 1.0)
        return base_lr * (start + (end - start) * frac)

    return fn


def reduce_on_plateau(base_lr: float, factor: float = 0.5, min_lr: float = 0.0):
    """mmedit ReduceLrUpdaterHook surface (core/scheduler/lr_updater.py:55-304):
    host-side controller — call .step(metric) each eval; .lr feeds an optax
    inject_hyperparams optimizer."""

    class _Controller:
        def __init__(self):
            self.lr = base_lr
            self.best = None
            self.bad = 0
            self.patience = 10

        def step(self, metric, mode="min"):
            better = (
                self.best is None
                or (metric < self.best if mode == "min" else metric > self.best)
            )
            if better:
                self.best = metric
                self.bad = 0
            else:
                self.bad += 1
                if self.bad > self.patience:
                    self.lr = max(self.lr * factor, min_lr)
                    self.bad = 0
            return self.lr

    return _Controller()
