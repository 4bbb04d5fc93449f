"""EXACT multi-chip two-sweep scan (the frame-parallel north star,
SURVEY §7.3.9).

The bidirectional recurrence is sequential in time, so an exact
multi-device decomposition is a two-phase PIPELINE over time-chunks with
boundary-carry exchange (not an approximation like the overlapped-window
halo path in train/eval.py):

- The clip's ``t`` frames are split into ``D`` equal chunks, one per
  device on a 1-D mesh axis.
- Phase A sweeps backward: at pipeline step ``s`` the device holding
  chunk ``D-1-s`` runs its chunk's backward scan seeded by the carry
  ``ppermute``d from its right neighbour; the scan's O(1) carry
  ``(prev_out, last_keyframe_out, prev_was_key)`` is exactly the state a
  full-clip scan would have at that chunk boundary, so the chunked sweep
  is numerically identical to the single-device sweep.
- Phase B mirrors it forward, consuming the locally stored backward
  features and emitting the reconstructed frames.

Chunk boundaries are NOT clip boundaries: the first/last-frame keyframe
forcing (reference iconvsr_ipb_par.py:60-62) is applied once to the GLOBAL
mask and chunked, via the model's ``keyframe_mask`` override.

For a single clip each pipeline step keeps one device busy (the classic
fill/drain bubble); with a stream of clips the same schedule reaches
``B/(B+D-1)`` utilization. This module implements the exactness
contract + the schedule; both phases run every device SPMD each step and
select the active result (simple, collective-free control flow).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["enhance_clip_exact_pipeline", "largest_divisor_chunks"]


def largest_divisor_chunks(t: int, max_chunks: int) -> int:
    """Largest D <= max_chunks with t % D == 0 (exactness needs equal
    static chunks; see module docstring)."""
    for d in range(max_chunks, 0, -1):
        if t % d == 0:
            return d
    return 1


def _tree_where(pred, a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(
            pred.reshape((-1,) + (1,) * (x.ndim - 1)) if x.ndim else pred, x, y
        )
        if x.ndim
        else jnp.where(pred, x, y),
        a,
        b,
    )


def enhance_clip_exact_pipeline(
    model,
    params,
    sample: dict,
    mesh,
    axis: str = "sp",
    feature_dtype=jnp.float32,
):
    """Run one clip through the exact chunked two-sweep pipeline.

    Args:
      model: a PnPVCVE instance (must support the sweep/carry API).
      sample: dict with time-first arrays ``lq (t,h,w,3)``, ``qps``,
        ``slices``, ``mvs``, ``base_qps``, ``partitions``.
      mesh: jax Mesh whose ``axis`` dimension sizes the pipeline. t must
        be divisible by the axis size (use :func:`largest_divisor_chunks`).

    Returns: (t, h, w, 3) numpy output, numerically identical to the
    single-device full scan.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    D = mesh.shape[axis]
    t = sample["lq"].shape[0]
    if t % D:
        raise ValueError(f"t={t} not divisible by pipeline depth {D}")
    ct = t // D

    def chunked(x):  # (t, ...) -> (D, 1, ct, ...): leading batch dim b=1
        x = np.asarray(x)
        return x.reshape(D, ct, *x.shape[1:])[:, None]

    inputs = {
        "lrs": chunked(sample["lq"]),
        "qps": chunked(sample["qps"]),
        "slices": chunked(sample["slices"]),
        "mvs": chunked(sample["mvs"]),
        "base_qps": chunked(sample["base_qps"]),
        "par_map": chunked(sample["partitions"]),
    }
    # global keyframe mask with clip-level first/last forcing, then chunked
    from pnp_vcve_tpu.models.pnp_vcve import keyframe_indices

    keyframe, _, _ = keyframe_indices(jnp.asarray(sample["slices"])[None])
    inputs["keyframe"] = chunked(np.asarray(keyframe[0]))

    h, w = sample["lq"].shape[1:3]
    c = model.mid_channels

    spec_in = jax.tree_util.tree_map(lambda _: P(axis), inputs)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec_in),
        out_specs=P(axis),
        check_rep=False,
    )
    def run(p, xs):
        local = jax.tree_util.tree_map(lambda v: v[0], xs)  # (1, ct, ...)
        key_mask = local.pop("keyframe")
        idx = jax.lax.axis_index(axis)

        def zero_carry():
            return (
                jnp.zeros((1, h, w, c), feature_dtype),
                jnp.zeros((1, h, w, c), feature_dtype),
                jnp.zeros((1,), bool),
            )

        bwd_perm = [(d, d - 1) for d in range(1, D)]
        fwd_perm = [(d, d + 1) for d in range(D - 1)]

        # ---- phase A: backward sweep, right-to-left pipeline
        def bwd_step(s, state):
            feats, carry = state
            out, carry_out = model.apply(
                {"params": p}, **local, sweep="backward", carry=carry,
                keyframe_mask=key_mask,
            )
            active = idx == (D - 1 - s)
            feats = jnp.where(active, out, feats)
            carry_keep = _tree_where(
                jnp.asarray(active)[None], carry_out, carry
            )
            carry_next = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, bwd_perm), carry_keep
            )
            return feats, carry_next

        feats0 = jnp.zeros((1, ct, h, w, c), feature_dtype)
        feats, _ = jax.lax.fori_loop(
            0, D, lambda s, st: bwd_step(s, st), (feats0, zero_carry())
        )

        # ---- phase B: forward sweep + heads, left-to-right pipeline
        def fwd_step(s, state):
            ys, carry = state
            out, carry_out = model.apply(
                {"params": p}, **local, sweep="forward", carry=carry,
                bwd_feats=feats, keyframe_mask=key_mask,
            )
            active = idx == s
            ys = jnp.where(active, out.astype(ys.dtype), ys)
            carry_keep = _tree_where(
                jnp.asarray(active)[None], carry_out, carry
            )
            carry_next = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, fwd_perm), carry_keep
            )
            return ys, carry_next

        ys0 = jnp.zeros((1, ct, h, w, 3), jnp.float32)
        ys, _ = jax.lax.fori_loop(
            0, D, lambda s, st: fwd_step(s, st), (ys0, zero_carry())
        )
        return ys  # (1, ct, h, w, 3) per device -> (D, ct, ...) stitched

    sharded_in = jax.device_put(
        inputs,
        jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(axis)), inputs
        ),
    )
    out = run(params, sharded_in)
    return np.asarray(out).reshape(t, h, w, 3)
