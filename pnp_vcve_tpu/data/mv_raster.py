"""H.264 motion-vector sidecar rasterizer.

Turns per-frame MV record arrays (the ``mv/*.npy`` sidecars) into dense
``(h, w, 4)`` flow maps (channels: forward x, forward y, backward x,
backward y) and ``(h, w, 3)`` macroblock-partition one-hot maps
(16x16 / 16x8+8x16 / 8x8 by block area 256 / 128 / 64).

Record layout (one row per block):
``(direction, w, h, x_w, y_w, x, y, motion_x, motion_y, scale)``
where (x, y) is the block center in the current frame, (x_w, y_w) the
matched block center in the reference frame, and motion is in units of
1/scale pixels (reference: mmedit/datasets/pipelines/loading_ipb.py:156-158).

Semantics replicated exactly from the reference loader
(loading_ipb.py:137-185) — these are parity-critical quirks:

- ``direction < 0``: forward MV, written into the *current* frame's
  channels 0:2 over the block rectangle.
- ``direction > 0`` on a B frame: backward MV into channels 2:4.
- ``direction > 0`` on a P frame: the forward MV is *negated* and scattered
  into the backward channels of the frame ``p_offset`` steps back (the P
  frame's reference frame), at the *matched* block location (x_w, y_w).
  ``p_offset`` counts 1 + the length of the preceding run of B frames.
- Later records overwrite earlier ones where rectangles overlap
  (sequential writes), and partition writes happen for every record.
- Rectangles are ``[y - h//2, y + h//2) x [x - w//2, x + w//2)``; negative
  starts follow Python slice semantics (clamped, possibly empty), as in the
  reference's raw ndarray slicing.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

__all__ = ["rasterize_frame_mvs", "rasterize_clip"]

# block area -> partition channel (loading_ipb.py:152)
_PARTITION_CH = {256: 0, 128: 1, 64: 2}


def _rect(arr_h: int, arr_w: int, x: int, y: int, w: int, h: int):
    """Python-slice rectangle [y-h//2, y+h//2) x [x-w//2, x+w//2).

    Negative starts are treated like ndarray slicing with negative indices
    resolved by the reference's direct ``a[lo:hi]`` usage: numpy interprets
    a negative ``lo`` as wrapping. We reproduce numpy slice semantics by
    delegating to ``slice`` objects on the caller side; this helper only
    builds them.
    """
    return (slice(y - h // 2, y + h // 2), slice(x - w // 2, x + w // 2))


def rasterize_frame_mvs(
    records: np.ndarray,
    height: int,
    width: int,
    is_b_frame: bool,
    prev_mvs: list[np.ndarray],
    p_offset: int,
    load_partition: bool = True,
    drconv: bool = True,
):
    """Rasterize one frame's MV records.

    Args:
      records: (N, 10) float array (possibly empty).
      height, width: frame size.
      is_b_frame: whether this frame's slice type is B.
      prev_mvs: dense MV maps of preceding frames *in this clip*, mutated in
        place by P-frame reversal writes.
      p_offset: current reversal offset (see module docstring).
      load_partition: also rasterize the partition map.
      drconv: 3-channel one-hot partitions (flagship) vs single-channel
        ``255/(area)*64`` (loading_ipb.py:176-180).

    Returns:
      (mv (h,w,4) float32, partition (h,w,3)|(h,w,1)|None)
    """
    mv = np.zeros((height, width, 4), np.float32)
    partition = None
    if load_partition:
        partition = np.zeros((height, width, 3 if drconv else 1), np.float32)

    records = np.asarray(records, np.float32).reshape(-1, 10)
    for rec in records:
        direction, w, h, x_w, y_w, x, y, motion_x, motion_y, scale = rec
        x, y, w, h = int(x), int(y), int(w), int(h)
        x_w, y_w = int(x_w), int(y_w)
        motion_x = float(motion_x) / float(scale)
        motion_y = float(motion_y) / float(scale)
        ys, xs = _rect(height, width, x, y, w, h)
        if direction < 0:
            mv[ys, xs, 0] = motion_x
            mv[ys, xs, 1] = motion_y
        elif direction > 0 and is_b_frame:
            mv[ys, xs, 2] = motion_x
            mv[ys, xs, 3] = motion_y
        elif direction > 0:
            # P frame: reverse the forward MV into the reference frame's
            # backward channels at the matched location (loading_ipb.py:169-172)
            target = prev_mvs[-p_offset]
            ys_w, xs_w = _rect(height, width, x_w, y_w, w, h)
            target[ys_w, xs_w, 2] = -motion_x
            target[ys_w, xs_w, 3] = -motion_y
        else:
            raise ValueError("MV record with direction == 0")

        if load_partition:
            if drconv:
                partition[ys, xs, _PARTITION_CH[w * h]] = 1.0
            else:
                partition[ys, xs, 0] = 255.0 / (w * h) * 64.0

    return mv, partition


def rasterize_clip(
    records_per_frame: Sequence[np.ndarray],
    slice_types: Sequence[str],
    height: int,
    width: int,
    load_partition: bool = True,
    drconv: bool = True,
):
    """Rasterize a whole clip, threading the P-frame reversal offset.

    ``p_offset`` update rule (loading_ipb.py:185):
    after a B frame it increments, after any other frame it resets to 1.

    Returns:
      (mvs (t,h,w,4) float32, partitions (t,h,w,3) float32 or None)
    """
    from pnp_vcve_tpu.native import native_rasterizer, rasterize_frame_native

    raster = (
        rasterize_frame_native if native_rasterizer() is not None
        else rasterize_frame_mvs
    )
    mvs: list[np.ndarray] = []
    partitions: list[np.ndarray] = []
    p_offset = 0
    for records, st in zip(records_per_frame, slice_types):
        is_b = st == "B"
        mv, par = raster(
            records, height, width, is_b, mvs, p_offset,
            load_partition=load_partition, drconv=drconv,
        )
        mvs.append(mv)
        if load_partition:
            partitions.append(par)
        p_offset = p_offset + 1 if is_b else 1
    out_mvs = np.stack(mvs, axis=0)
    out_par = np.stack(partitions, axis=0) if load_partition else None
    return out_mvs, out_par
