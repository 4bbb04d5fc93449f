"""Exponential-moving-average of model parameters.

Reference surface: mmedit/core/hooks/ema.py:12-113
(``ExponentialMovingAverageHook``): every ``interval`` train iters,
``ema = lerp(param, ema, momentum) = param + (ema - param) * momentum``;
before ``start_iter`` the EMA tracks the raw weights exactly.

TPU-native shape: a pure pytree transform usable inside a jitted train
step (no module mutation) — keep ``ema_params`` beside the TrainState and
fold :func:`ema_update` into the step or call it on the host between
steps. ``lerp``'s argument order matches the reference (note the
reference interpolates TOWARD the ema with weight ``momentum``, i.e. the
NEW weight's coefficient is ``1 - momentum``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["EmaState", "ema_init", "ema_update"]


def ema_init(params: Any) -> Any:
    """EMA pytree initialised to a copy of the live params."""
    return jax.tree_util.tree_map(jnp.asarray, params)


def ema_update(
    ema_params: Any,
    params: Any,
    step: jnp.ndarray | int,
    momentum: float = 0.999,
    interval: int = 1,
    start_iter: int = 0,
) -> Any:
    """One EMA tick (reference after_train_iter semantics).

    - step < start_iter: copy the live params (ema == params);
    - else, on every ``interval``-th iter: lerp(param, ema, momentum);
    - off-interval steps leave the ema unchanged.
    Fully traceable: usable inside a jitted train step.
    """
    step = jnp.asarray(step)
    warm = step < start_iter
    tick = (
        jnp.equal(jnp.mod(step + 1 - start_iter, interval), 0)
        if interval > 0
        else jnp.asarray(False)
    )

    def leaf(e, p):
        lerped = p + (e - p) * jnp.asarray(momentum, e.dtype)
        upd = jnp.where(tick, lerped, e)
        return jnp.where(warm, p, upd)

    return jax.tree_util.tree_map(leaf, ema_params, params)


class EmaState:
    """Host-side convenience wrapper mirroring the reference hook's usage:
    ``ema = EmaState(params); ema.update(params, step)``; read
    ``ema.params`` for eval/publish."""

    def __init__(self, params, momentum: float = 0.999, interval: int = 1,
                 start_iter: int = 0):
        self.params = ema_init(params)
        self.momentum = momentum
        self.interval = interval
        self.start_iter = start_iter

    def update(self, params, step):
        self.params = ema_update(
            self.params, params, step, self.momentum, self.interval,
            self.start_iter,
        )
        return self.params
