"""Native (C++) fast paths, loaded via ctypes.

Builds on first use with g++ if the shared library is missing (cached next
to the sources).  Set INFERCNV_TPU_NO_NATIVE=1 to force the pure-Python
fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libleiden.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_DIR, "leiden.cpp")
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_leiden_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None:
        return _lib
    if _tried or os.environ.get("INFERCNV_TPU_NO_NATIVE"):
        return _lib
    _tried = True
    src = os.path.join(_DIR, "leiden.cpp")
    stale = (os.path.exists(_LIB_PATH) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH))
    if not os.path.exists(_LIB_PATH) or stale:
        if not _build() and not os.path.exists(_LIB_PATH):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.leiden_partition.restype = ctypes.c_int
    lib.leiden_partition.argtypes = [
        ctypes.POINTER(ctypes.c_int64),   # indptr
        ctypes.POINTER(ctypes.c_int32),   # indices
        ctypes.POINTER(ctypes.c_double),  # data
        ctypes.c_int32,                   # n
        ctypes.c_int32,                   # use_cpm
        ctypes.c_double,                  # resolution
        ctypes.c_uint64,                  # seed
        ctypes.c_int32,                   # max_levels
        ctypes.POINTER(ctypes.c_int32),   # membership_out
    ]
    _lib = lib
    return _lib


def leiden_native(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                  n: int, objective: str, resolution: float, seed: int,
                  max_levels: int = 10) -> Optional[np.ndarray]:
    """Run the C++ Leiden; returns membership or None if unavailable."""
    lib = get_leiden_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float64)
    out = np.zeros(n, np.int32)
    rc = lib.leiden_partition(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        np.int32(n), np.int32(1 if objective == "CPM" else 0),
        float(resolution), np.uint64(seed if seed else 1), np.int32(max_levels),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return out.astype(np.int64)
