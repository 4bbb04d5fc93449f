"""Native (C) runtime components, loaded via ctypes.

The reference repo's host-side hot paths live in compiled libraries (mmcv /
cv2); here the data loader's MV rasterization inner loop (thousands of
block-rectangle writes per frame) is a small C library compiled on first
use with the system gcc — no pip, no pybind11. The numpy implementation
(data/mv_raster.py) remains the authoritative semantics and the fallback
when no compiler is available (PNP_NATIVE=0 forces the fallback).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["native_rasterizer", "rasterize_frame_native"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = Path(__file__).parent / "rasterizer.c"
    cache = Path(tempfile.gettempdir()) / "pnp_vcve_native"
    cache.mkdir(exist_ok=True)
    lib_path = cache / "librasterizer.so"
    if not lib_path.exists() or lib_path.stat().st_mtime < src.stat().st_mtime:
        cmd = ["gcc", "-O3", "-shared", "-fPIC", str(src), "-o", str(lib_path)]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(str(lib_path))
    lib.rasterize_frame.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.rasterize_frame.restype = None
    return lib


def native_rasterizer() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if os.environ.get("PNP_NATIVE", "1") == "0":
        return None
    if not _TRIED:
        _TRIED = True
        try:
            _LIB = _build()
        except Exception:
            _LIB = None
    return _LIB


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def rasterize_frame_native(
    records: np.ndarray,
    height: int,
    width: int,
    is_b_frame: bool,
    prev_mvs: list,
    p_offset: int,
    load_partition: bool = True,
    drconv: bool = True,
):
    """ctypes front-end with the signature of data.mv_raster.rasterize_frame_mvs."""
    lib = native_rasterizer()
    assert lib is not None
    records = np.ascontiguousarray(records, np.float32).reshape(-1, 10)
    mv = np.zeros((height, width, 4), np.float32)
    par_ch = 3 if drconv else 1
    partition = (
        np.zeros((height, width, par_ch), np.float32) if load_partition else None
    )
    prev = prev_mvs[-p_offset] if (prev_mvs and p_offset > 0) else None
    null = ctypes.POINTER(ctypes.c_float)()
    lib.rasterize_frame(
        _fptr(records), records.shape[0], height, width, int(is_b_frame),
        _fptr(mv),
        _fptr(partition) if partition is not None else null,
        par_ch,
        _fptr(prev) if prev is not None else null,
    )
    return mv, partition
