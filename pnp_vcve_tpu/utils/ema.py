"""Exponential moving average of parameters (reference
mmedit/core/hooks/ema.py:12-113 ExponentialMovingAverageHook: momentum
update every ``interval`` iterations; not enabled in the shipped PnP
configs but part of the hook surface)."""

from __future__ import annotations

import jax

__all__ = ["ema_update", "EmaState"]


def ema_update(ema_params, params, momentum: float = 0.999):
    """ema <- momentum * ema + (1 - momentum) * params (jittable)."""
    return jax.tree_util.tree_map(
        lambda e, p: momentum * e + (1.0 - momentum) * p, ema_params, params
    )


class EmaState:
    """Host-side EMA tracker mirroring the interval semantics of the
    reference hook."""

    def __init__(self, params, momentum: float = 0.999, interval: int = 1):
        self.params = params
        self.momentum = momentum
        self.interval = interval
        self._fn = jax.jit(lambda e, p: ema_update(e, p, momentum))

    def update(self, step: int, params):
        if step % self.interval == 0:
            self.params = self._fn(self.params, params)
        return self.params
