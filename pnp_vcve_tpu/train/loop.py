"""Iteration-based training loop.

Equivalent of the reference's mmcv ``IterBasedRunner`` + hook stack
(mmedit/apis/train.py:75-239): LR schedule folded into optax, periodic text
logging (TextLoggerHook interval=100), checkpointing (CheckpointHook
interval=2000), periodic validation (DistEvalIterHook interval=5000) —
config keys preserved (configs/HR_davis_LR_128x128.py:218-234).
"""

from __future__ import annotations

import time
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from pnp_vcve_tpu.core.checkpoint import CheckpointManager
from pnp_vcve_tpu.train.state import TrainState

__all__ = ["train_loop", "state_payload"]


def state_payload(state: TrainState, save_optimizer: bool = True) -> dict:
    """Checkpoint payload: full train state (step + params + opt_state) so a
    resumed run continues the Adam moments and the LR-schedule position
    exactly (reference CheckpointHook saves optimizer state,
    configs/HR_davis_LR_128x128.py:226; resume semantics apis/train.py:235).
    ``save_optimizer=False`` matches the reference's weights-only publish."""
    payload = {
        "step": jax.device_get(state.step),
        "params": jax.device_get(state.params),
    }
    if save_optimizer:
        payload["opt_state"] = jax.device_get(state.opt_state)
    return payload


def train_loop(
    state: TrainState,
    train_step: Callable,
    loader: Iterable,
    total_iters: int,
    log_interval: int = 100,
    checkpoint_interval: int = 2000,
    eval_interval: int = 0,
    eval_fn: Optional[Callable] = None,
    ckpt_manager: Optional[CheckpointManager] = None,
    logger: Callable[[str], None] = print,
    start_iter: int = 0,
    save_optimizer: bool = True,
    metrics_writer=None,
    visual_fn: Optional[Callable] = None,
) -> TrainState:
    it = iter(loader)
    losses = []
    t_last = time.perf_counter()
    for step in range(start_iter, total_iters):
        batch = next(it)
        state, metrics = train_step(state, batch)
        losses.append(metrics["loss"])

        if visual_fn is not None:
            # VisualizationHook analog (reference core/hooks/
            # visualization.py); the hook itself gates on its interval
            visual_fn(step, batch, state)

        if (step + 1) % log_interval == 0:
            loss = float(np.mean(jax.device_get(losses)))
            losses.clear()
            dt = time.perf_counter() - t_last
            t_last = time.perf_counter()
            ips = log_interval / dt
            logger(
                f"iter {step + 1}/{total_iters} loss={loss:.5f} "
                f"({ips:.2f} it/s)"
            )
            if metrics_writer is not None:
                metrics_writer.scalars(step + 1, loss=loss, iters_per_sec=ips)

        if ckpt_manager is not None and (step + 1) % checkpoint_interval == 0:
            ckpt_manager.save(step + 1, state_payload(state, save_optimizer))

        if eval_fn is not None and eval_interval and (step + 1) % eval_interval == 0:
            metrics = eval_fn(state.params)
            logger(
                f"iter {step + 1} eval: "
                + " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
            )
            if metrics_writer is not None:
                metrics_writer.scalars(
                    step + 1, **{f"val/{k}": v for k, v in metrics.items()}
                )
    if ckpt_manager is not None:
        ckpt_manager.save(
            total_iters, state_payload(state, save_optimizer), wait=True
        )
    return state
