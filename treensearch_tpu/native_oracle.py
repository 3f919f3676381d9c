"""ctypes bindings for the native CPU grid search (native/nsgrid.cpp).

Provides ``grid_search_pair`` — a fast, exact CPU neighbor search used to
validate the TPU engine at sizes where the O(n^2) numpy oracle is
infeasible (e.g. the 1M-point BASELINE configs), and usable as a CPU
runtime fallback.  Falls back to None if no C++ toolchain is available.
"""

from __future__ import annotations

import ctypes
import os
import sys
from typing import Optional

import numpy as np

_LIB = None


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    try:
        from native.build import ensure_built
    except ImportError:
        return None
    path = ensure_built()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.nsgrid_search.restype = ctypes.c_int64
    lib.nsgrid_search.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
    ]
    lib.nsgrid_free.restype = None
    lib.nsgrid_free.argtypes = [ctypes.POINTER(ctypes.c_int32)]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def grid_search_pair(pts_i: np.ndarray, pts_j: np.ndarray,
                     radius: float = 0.0,
                     radii_i: Optional[np.ndarray] = None,
                     radii_j: Optional[np.ndarray] = None,
                     symmetric: bool = False,
                     same_set: bool = False,
                     cell: Optional[float] = None):
    """Exact neighbor lists of one (i -> j) pair.

    Returns (counts (n_i,), offsets (n_i+1,), nbrs (total,)) — CSR with
    set_j-local indices, unsorted within a row.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native nsgrid library is not available")
    pi = np.ascontiguousarray(pts_i, np.float32).reshape(-1, 3)
    pj = np.ascontiguousarray(pts_j, np.float32).reshape(-1, 3)
    n_i, n_j = pi.shape[0], pj.shape[0]
    counts = np.zeros(n_i, np.int32)
    if n_i == 0 or n_j == 0:
        return counts, np.zeros(n_i + 1, np.int64), np.zeros(0, np.int32)

    variable = radii_i is not None
    ri = np.ascontiguousarray(radii_i, np.float32) if variable else None
    rj = np.ascontiguousarray(radii_j, np.float32) \
        if radii_j is not None else None
    reach_extra = float(rj.max()) if (variable and symmetric
                                      and rj is not None) else 0.0
    if cell is None:
        base = float(ri.min()) if variable else float(radius)
        cell = 1.5 * base if base > 0 else 1.0

    fp = ctypes.POINTER(ctypes.c_float)
    out = ctypes.POINTER(ctypes.c_int32)()
    total = lib.nsgrid_search(
        pi.ctypes.data_as(fp), n_i, pj.ctypes.data_as(fp), n_j,
        ri.ctypes.data_as(fp) if variable else None,
        rj.ctypes.data_as(fp) if rj is not None else None,
        ctypes.c_float(radius), ctypes.c_float(reach_extra),
        ctypes.c_float(cell),
        int(bool(symmetric)), int(bool(same_set)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(out))
    if total < 0:
        raise RuntimeError("nsgrid_search failed")
    nbrs = np.ctypeslib.as_array(out, shape=(max(total, 1),))[:total].copy()
    lib.nsgrid_free(out)
    offsets = np.zeros(n_i + 1, np.int64)
    np.cumsum(counts, out=offsets[1:])
    return counts, offsets, nbrs
