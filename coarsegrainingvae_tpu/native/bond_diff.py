"""ctypes wrapper for the C++ cell-list bond-graph diff
(native/bond_diff.cpp). The dense numpy path lives in eval/metrics.py and
stays the small-N default; eval auto-routes here past a size threshold."""
from __future__ import annotations

import ctypes
from typing import Tuple

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        from coarsegrainingvae_tpu.native.build import build

        lib = ctypes.CDLL(build("bond_diff.cpp"))
        lib.bond_graph_diff.restype = None
        lib.bond_graph_diff.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ]
        lib.bond_graph_extract.restype = ctypes.c_int64
        lib.bond_graph_extract.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def bond_graph_extract(
    xyz: np.ndarray, radii: np.ndarray, scale: float = 1.3
) -> np.ndarray:
    """(i < j) covalent bond pairs of one structure -- O(N) cell list."""
    lib = _load()
    assert lib is not None
    xyz = np.ascontiguousarray(xyz, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    n = xyz.shape[0]
    cap = max(4 * n, 64)
    while True:
        edges = np.zeros((cap, 2), np.int32)
        count = int(lib.bond_graph_extract(
            _ptr(xyz, ctypes.c_float), n, _ptr(radii, ctypes.c_float),
            ctypes.c_float(scale), _ptr(edges, ctypes.c_int32), cap,
        ))
        if count <= cap:
            return edges[:count]
        cap = count


def bond_graph_diff(
    xyz: np.ndarray, radii: np.ndarray, ref_edges: np.ndarray,
    scale: float = 1.3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-structure (missing, spurious) covalent-edge counts vs the
    reference (i < j) edge set. xyz: (S, N, 3)."""
    lib = _load()
    assert lib is not None
    xyz = np.ascontiguousarray(xyz, np.float32)
    radii = np.ascontiguousarray(radii, np.float32)
    s, n = xyz.shape[:2]
    ref = np.asarray(ref_edges, np.int64)
    lo = np.minimum(ref[:, 0], ref[:, 1])
    hi = np.maximum(ref[:, 0], ref[:, 1])
    keys = np.ascontiguousarray(np.sort(lo * n + hi))
    missing = np.zeros((s,), np.int64)
    spurious = np.zeros((s,), np.int64)
    lib.bond_graph_diff(
        _ptr(xyz, ctypes.c_float), s, n, _ptr(radii, ctypes.c_float),
        ctypes.c_float(scale), _ptr(keys, ctypes.c_int64), keys.shape[0],
        _ptr(missing, ctypes.c_int64), _ptr(spurious, ctypes.c_int64),
    )
    return missing, spurious
