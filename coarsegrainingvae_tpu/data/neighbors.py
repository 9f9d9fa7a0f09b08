"""Neighbor-list construction (host-side preprocessing).

The reference builds an O(N^2) dense radius graph per frame in a Python loop
(get_neighbor_list, data.py:65-82 in /root/reference) -- the preprocessing
hot spot (SURVEY.md section 3.1). Here the same computation is vectorized
over frames in numpy and emitted directly as fixed-shape padded edge arrays.
A C++ cell-list backend (ctypes) accelerates large systems when built; see
coarsegrainingvae_tpu/native.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def make_directed(edges: np.ndarray) -> np.ndarray:
    """Ensure an edge list contains both directions (conv.py:10-20).

    If the list is already directed (contains some i>j and some j>i rows) it
    is returned unchanged; otherwise the flipped copy is appended.
    """
    if edges.shape[0] == 0:
        return edges.reshape(0, 2).astype(np.int32)
    gtr_ij = bool((edges[:, 0] > edges[:, 1]).any())
    gtr_ji = bool((edges[:, 1] > edges[:, 0]).any())
    if gtr_ij and gtr_ji:
        return edges.astype(np.int32)
    return np.concatenate([edges, edges[:, ::-1]], axis=0).astype(np.int32)


def radius_graph_dense(
    xyz: np.ndarray, cutoff: float, undirected: bool = True
) -> np.ndarray:
    """Radius graph of one frame via the dense pairwise matrix
    (data.py:65-82). xyz: (N, 3) -> (e, 2) int32."""
    dist = np.sqrt(((xyz[None] - xyz[:, None]) ** 2).sum(-1))
    mask = dist <= cutoff
    np.fill_diagonal(mask, False)
    pairs = np.argwhere(mask)
    if undirected:
        pairs = pairs[pairs[:, 1] > pairs[:, 0]]
    return pairs.astype(np.int32)


def radius_graph_frames(
    frames: np.ndarray,
    cutoff: float,
    max_edges: Optional[int] = None,
    directed: bool = True,
    bucket: int = 128,
    chunk: int = 512,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized padded radius graphs for a stack of frames.

    Args:
      frames: (F, N, 3) float coordinates.
      cutoff: radius in the same units.
      max_edges: static per-frame edge budget; None -> max over frames
        rounded up to `bucket` (a conservative bucket avoids recompiles if
        more data is added later).
      directed: emit both (i,j) and (j,i) -- what the models consume.
      chunk: frames processed per numpy block to bound peak host memory.

    Returns:
      edges: (F, E_max, 2) int32, zero-padded.
      mask:  (F, E_max) bool.
    """
    frames = np.asarray(frames, dtype=np.float32)
    f, n, _ = frames.shape

    try:
        from coarsegrainingvae_tpu.native import cell_list as _cl
        if _cl.available() and n >= 256:
            return _cl.radius_graph_frames(frames, cutoff, max_edges, directed, bucket)
    except Exception:
        pass

    per_frame_pairs = []
    counts = np.zeros(f, dtype=np.int64)
    iu, ju = np.triu_indices(n, k=1)
    for lo in range(0, f, chunk):
        hi = min(lo + chunk, f)
        blk = frames[lo:hi]  # (c, N, 3)
        d2 = ((blk[:, :, None, :] - blk[:, None, :, :]) ** 2).sum(-1)
        adj = d2[:, iu, ju] <= cutoff * cutoff  # (c, P) upper-tri pairs
        for k in range(hi - lo):
            sel = np.flatnonzero(adj[k])
            pairs = np.stack([iu[sel], ju[sel]], axis=1).astype(np.int32)
            if directed:
                pairs = np.concatenate([pairs, pairs[:, ::-1]], axis=0)
            # RECEIVER-SORTED invariant: segment sums on the device pass
            # indices_are_sorted=True (XLA TPU serializes unsorted scatters)
            pairs = pairs[np.argsort(pairs[:, 0], kind="stable")]
            per_frame_pairs.append(pairs)
            counts[lo + k] = pairs.shape[0]

    if max_edges is None:
        max_edges = int(counts.max()) if f else 0
        max_edges = ((max_edges + bucket - 1) // bucket) * bucket if max_edges else bucket

    # pad with (n-1, n-1) self-loops (zero payload via the mask) so the
    # receiver column stays sorted through the padding tail
    edges = np.full((f, max_edges, 2), n - 1, dtype=np.int32)
    mask = np.zeros((f, max_edges), dtype=bool)
    for k, pairs in enumerate(per_frame_pairs):
        e = pairs.shape[0]
        if e > max_edges:
            raise ValueError(
                f"frame {k} has {e} edges > budget {max_edges}; raise max_edges"
            )
        edges[k, :e] = pairs
        mask[k, :e] = True
    return edges, mask
