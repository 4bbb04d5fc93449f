"""jitted train / eval steps with mesh sharding.

One compiled function per run replaces the reference's
IterBasedRunner-driven per-iteration Python (mmedit/apis/train.py:75-239,
mmedit/models/restorers/basicvsr.py:84-117): forward, Charbonnier loss,
grads, optax update. Data parallelism is expressed with sharding
annotations — the gradient all-reduce the reference gets from DDP's backward
hooks (distributed_wrapper.py) is emitted by XLA as psums over the mesh.

``fix_iter`` support (train_cfg fix_iter=5000, basicvsr.py:95-103): the
reference freezes SPyNet/EDVR for the first N iterations. The flagship
MV-driven generator has no such submodule, so the mask is empty for it, but
the mechanism is provided for baseline models via ``freeze_prefixes``:
gradients for matching top-level param subtrees are zeroed while
``step < fix_iter``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from .losses import charbonnier_loss
from .state import TrainState

__all__ = ["make_train_step", "make_eval_step"]

MODEL_INPUT_KEYS = ("lq", "qps", "slices", "mvs", "base_qps", "partitions")


def _model_inputs(batch):
    return dict(
        lrs=batch["lq"],
        qps=batch["qps"],
        slices=batch["slices"],
        mvs=batch["mvs"],
        base_qps=batch["base_qps"],
        par_map=batch["partitions"],
    )


def make_train_step(
    model,
    loss_fn: Callable = charbonnier_loss,
    fix_iter: int = 0,
    freeze_prefixes: Sequence[str] = (),
    donate: bool = True,
):
    """Build the jitted train step: (TrainState, batch) -> (TrainState, metrics)."""

    # block8 warp exactness is conditional on 8x8-block-constant flows
    # (models/pnp_vcve.py warp_impl docstring). Training data is randomly
    # CROPPED (PairedRandomCrop_mv), which misaligns the macroblock grid,
    # so a block8-configured model would train on silently-wrong warps.
    if getattr(model, "warp_impl", None) in ("block8", "pf"):
        raise ValueError(
            f"warp_impl={model.warp_impl!r} is a serving-only optimization "
            "(exact only on uncropped rasterized MV maps; 'pf' additionally "
            "has no VJP through the warp kernel); train with 'padgather'"
        )

    def train_step(state: TrainState, batch):
        def compute_loss(params):
            out = model.apply({"params": params}, **_model_inputs(batch))
            return loss_fn(out, batch["gt"])

        loss, grads = jax.value_and_grad(compute_loss)(state.params)

        if fix_iter and freeze_prefixes:
            frozen = state.step < fix_iter

            def mask_grad(path, g):
                top = path[0].key if path else ""
                if any(top.startswith(p) for p in freeze_prefixes):
                    return jnp.where(frozen, jnp.zeros_like(g), g)
                return g

            grads = jax.tree_util.tree_map_with_path(mask_grad, grads)

        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss}

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model, is_mirror_extended: bool = False):
    """Build the jitted eval forward: (params, batch) -> enhanced frames.

    ``is_mirror_extended`` may also be passed per call (host-detected from
    the clip, reference check_if_mirror_extended basicvsr_net.py:69-83);
    each value compiles its own specialization."""

    default_mirror = is_mirror_extended

    @partial(jax.jit, static_argnames=("is_mirror_extended",))
    def eval_step(params, batch, is_mirror_extended=default_mirror):
        return model.apply(
            {"params": params},
            **_model_inputs(batch),
            is_mirror_extended=is_mirror_extended,
        )

    return eval_step
