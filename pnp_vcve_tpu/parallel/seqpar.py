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
fill/drain bubble); :func:`enhance_clips_exact_stream` streams B clips
through the same schedule at ``B/(B+D-1)`` utilization (the reference
streams clips strictly sequentially: mmedit/apis/test.py:61-126). Both
phases run every device SPMD each step and select the active result
(simple, collective-free control flow).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "enhance_clip_exact_pipeline", "enhance_clips_exact_stream",
    "largest_divisor_chunks",
]


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


def _chunked_inputs(sample: dict, D: int) -> dict:
    """Per-clip model inputs chunked to (D, 1, ct, ...) with the GLOBAL
    first/last-frame keyframe forcing applied before chunking (a chunk
    boundary is not a clip boundary)."""
    t = sample["lq"].shape[0]
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
    from pnp_vcve_tpu.models.pnp_vcve import keyframe_indices

    keyframe, _, _ = keyframe_indices(jnp.asarray(sample["slices"])[None])
    inputs["keyframe"] = chunked(np.asarray(keyframe[0]))
    return inputs


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
    inputs = _chunked_inputs(sample, D)
    h, w = sample["lq"].shape[1:3]
    feat_shape = model.carry_feature_shape(h, w)

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
                jnp.zeros((1, *feat_shape), feature_dtype),
                jnp.zeros((1, *feat_shape), feature_dtype),
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

        feats0 = jnp.zeros((1, ct, *feat_shape), feature_dtype)
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


def enhance_clips_exact_stream(
    model,
    params,
    samples: Sequence[dict],
    mesh,
    axis: str = "sp",
    feature_dtype=jnp.float32,
):
    """Stream B same-shape clips through the D-deep two-sweep pipeline.

    The single-clip pipeline keeps one device busy per step (1/D
    utilization, fill/drain bubble). This is the B/(B+D-1) streaming
    schedule promised in the module docstring: per sweep, B+D-1 pipeline
    steps where at step ``s`` device ``d`` runs the backward chunk of
    clip ``k = s-(D-1-d)`` (phase B mirrors it with ``k = s-d``). New
    clips enter at the edge device each step with the zero boundary
    carry ``ppermute`` delivers to ring edges, so clip boundaries need no
    special-casing; each device simply forwards its fresh carry every
    step because the receiving neighbour continues the SAME clip
    diagonal next step. Total device-synchronous applies: 2(B+D-1) for B
    clips vs 2BD run clip-by-clip.

    Numerics are identical to B independent
    :func:`enhance_clip_exact_pipeline` runs (asserted bitwise in
    tests/test_seqpar_exact.py). Memory: each device holds the backward
    features of ALL B in-flight clips — (B, ct, h, w, c) — so callers
    size the streaming window to HBM (tools/test.py --stream-clips).

    Args:
      samples: B clip dicts (keys as in
        :func:`enhance_clip_exact_pipeline`) with identical t/h/w.

    Returns: list of B (t, h, w, 3) numpy outputs.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    B = len(samples)
    D = mesh.shape[axis]
    t, h, w = samples[0]["lq"].shape[:3]
    if t % D:
        raise ValueError(f"t={t} not divisible by pipeline depth {D}")
    ct = t // D
    feat_shape = model.carry_feature_shape(h, w)

    # (B, D, 1, ct, ...) per key, chunk axis sharded over the pipeline
    inputs = jax.tree_util.tree_map(
        lambda *xs: np.stack(xs), *[_chunked_inputs(s, D) for s in samples]
    )
    spec_in = jax.tree_util.tree_map(lambda _: P(None, axis), inputs)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec_in),
        out_specs=P(None, axis),
        check_rep=False,
    )
    def run(p, xs):
        local = jax.tree_util.tree_map(lambda v: v[:, 0], xs)  # (B, 1, ct, ...)
        idx = jax.lax.axis_index(axis)

        def zero_carry():
            return (
                jnp.zeros((1, *feat_shape), feature_dtype),
                jnp.zeros((1, *feat_shape), feature_dtype),
                jnp.zeros((1,), bool),
            )

        bwd_perm = [(d, d - 1) for d in range(1, D)]
        fwd_perm = [(d, d + 1) for d in range(D - 1)]

        def clip_inputs(k):
            xs_k = jax.tree_util.tree_map(
                lambda v: jax.lax.dynamic_index_in_dim(v, k, 0, keepdims=False),
                local,
            )
            return xs_k, xs_k.pop("keyframe")

        def place(buf, k, valid, out):
            cur = jax.lax.dynamic_index_in_dim(buf, k, 0, keepdims=False)
            new = jnp.where(valid, out.astype(buf.dtype), cur)
            return jax.lax.dynamic_update_index_in_dim(buf, new, k, 0)

        # ---- phase A: backward sweep, clips pipelined right-to-left
        def bwd_step(s, state):
            feats, carry = state
            k = s - (D - 1 - idx)
            kc = jnp.clip(k, 0, B - 1)
            xs_k, key_mask = clip_inputs(kc)
            out, carry_out = model.apply(
                {"params": p}, **xs_k, sweep="backward", carry=carry,
                keyframe_mask=key_mask,
            )
            feats = place(feats, kc, (k >= 0) & (k < B), out)
            carry_next = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, bwd_perm), carry_out
            )
            return feats, carry_next

        feats0 = jnp.zeros((B, 1, ct, *feat_shape), feature_dtype)
        feats, _ = jax.lax.fori_loop(
            0, B + D - 1, bwd_step, (feats0, zero_carry())
        )

        # ---- phase B: forward sweep + heads, clips pipelined left-to-right
        def fwd_step(s, state):
            ys, carry = state
            k = s - idx
            kc = jnp.clip(k, 0, B - 1)
            xs_k, key_mask = clip_inputs(kc)
            bf = jax.lax.dynamic_index_in_dim(feats, kc, 0, keepdims=False)
            out, carry_out = model.apply(
                {"params": p}, **xs_k, sweep="forward", carry=carry,
                bwd_feats=bf, keyframe_mask=key_mask,
            )
            ys = place(ys, kc, (k >= 0) & (k < B), out)
            carry_next = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, fwd_perm), carry_out
            )
            return ys, carry_next

        ys0 = jnp.zeros((B, 1, ct, h, w, 3), jnp.float32)
        ys, _ = jax.lax.fori_loop(
            0, B + D - 1, fwd_step, (ys0, zero_carry())
        )
        return ys[:, None]  # (B, 1(D), ct, h, w, 3) per device

    sharded_in = jax.device_put(
        inputs,
        jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P(None, axis)), inputs
        ),
    )
    out = np.asarray(run(params, sharded_in))  # (B, D, ct, h, w, 3)
    return [out[k].reshape(t, h, w, 3) for k in range(B)]
