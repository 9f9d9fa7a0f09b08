"""ctypes wrapper for the C++ cell-list radius-graph builder
(native/cell_list.cpp). Numpy fallback lives in data/neighbors.py."""
from __future__ import annotations

import ctypes
from typing import Optional, Tuple

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

        lib = ctypes.CDLL(build("cell_list.cpp"))
        lib.radius_graph_frames_cell.restype = ctypes.c_int
        lib.radius_graph_frames_cell.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.radius_graph_frames_count.restype = ctypes.c_int64
        lib.radius_graph_frames_count.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, ctypes.c_int,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def radius_graph_frames(
    frames: np.ndarray,
    cutoff: float,
    max_edges: Optional[int] = None,
    directed: bool = True,
    bucket: int = 128,
) -> Tuple[np.ndarray, np.ndarray]:
    """Same contract as data.neighbors.radius_graph_frames, C++ backend."""
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, dtype=np.float32)
    f, n, _ = frames.shape

    if max_edges is None:
        m = int(lib.radius_graph_frames_count(
            _ptr(frames, ctypes.c_float), f, n, ctypes.c_float(cutoff),
            int(directed),
        ))
        max_edges = ((m + bucket - 1) // bucket) * bucket if m else bucket

    # padding = (n-1, n-1) self-loops so the receiver column stays sorted
    # (the C++ emits edges in ascending-receiver order by construction)
    edges = np.full((f, max_edges, 2), n - 1, dtype=np.int32)
    mask = np.zeros((f, max_edges), dtype=np.uint8)
    counts = np.zeros((f,), dtype=np.int64)
    rc = lib.radius_graph_frames_cell(
        _ptr(frames, ctypes.c_float), f, n, ctypes.c_float(cutoff),
        max_edges, int(directed),
        _ptr(edges, ctypes.c_int32), _ptr(mask, ctypes.c_uint8),
        _ptr(counts, ctypes.c_int64),
    )
    if rc != 0:
        raise ValueError(
            f"edge budget {max_edges} exceeded (max needed {counts.max()})"
        )
    return edges, mask.astype(bool)
