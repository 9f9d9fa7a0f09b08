"""Fixed-shape packed graph batches.

The reference batches by concatenating variable-length per-frame tensors and
offsetting indices in Python (CG_collate, data.py:255-289 in /root/reference)
-- every batch has a different shape, which would force an XLA recompile per
step. Here a batch is a pytree of **statically-shaped** arrays:

  node arrays   (B, N, ...)   + atom_mask  (B, N)
  CG arrays     (B, M, ...)   + cg_mask    (B, M)
  edge arrays   (B, E, 2)     + *_mask     (B, E)

For the dominant single-topology case (same molecule every frame,
datasets.py:459) padding waste is ~0 and one compilation serves the run.
Models flatten to global node ids with `flatten_ids` (pure arithmetic, traced
once) and use segment ops with static num_segments = B*N.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class CGBatch:
    """One training batch. All arrays statically shaped; see module docstring.

    Index conventions (all local, per-sample; models add offsets):
      mapping[b, i]   = CG bead of atom i           (cgvae.py get_inputs)
      channel_idx[b,i]= per-bead channel of atom i  (CG2ChannelIdx, cgvae.py:451-460,
                        precomputed per-topology on host -- it only depends on
                        the mapping, which is fixed per fold)
      nbrs / cg_nbrs  = DIRECTED edge lists (both directions present;
                        make_directed is applied on host, conv.py:10-20)
      bonds           = undirected bonded (+ high-order) edges for the graph
                        loss (utils.py:127-133)
    """

    z: jnp.ndarray            # (B, N) int32 atomic numbers; 0 = padding
    xyz: jnp.ndarray          # (B, N, 3) float32
    atom_mask: jnp.ndarray    # (B, N) bool
    cg_z: jnp.ndarray         # (B, M) int32 bead ids (reference embeds bead index)
    cg_xyz: jnp.ndarray       # (B, M, 3) float32
    cg_mask: jnp.ndarray      # (B, M) bool
    mapping: jnp.ndarray      # (B, N) int32
    channel_idx: jnp.ndarray  # (B, N) int32
    nbrs: jnp.ndarray         # (B, E, 2) int32
    nbr_mask: jnp.ndarray     # (B, E) bool
    cg_nbrs: jnp.ndarray      # (B, Ec, 2) int32
    cg_nbr_mask: jnp.ndarray  # (B, Ec) bool
    bonds: jnp.ndarray        # (B, Eb, 2) int32
    bond_mask: jnp.ndarray    # (B, Eb) bool

    @property
    def batch_size(self) -> int:
        return self.z.shape[0]

    @property
    def n_atoms(self) -> int:
        return self.z.shape[1]

    @property
    def n_cgs(self) -> int:
        return self.cg_z.shape[1]


def flatten_ids(local: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Local per-sample indices (B, ...) -> global flat indices (B*..., ).

    global[b, k] = local[b, k] + b * stride. Pure arithmetic; replaces the
    host-side cumulative offsetting of CG_collate (data.py:259-270).
    """
    b = local.shape[0]
    offsets = jnp.arange(b, dtype=local.dtype) * stride
    offsets = offsets.reshape((b,) + (1,) * (local.ndim - 1))
    out = local + offsets
    return out.reshape((-1,) + local.shape[2:]) if local.ndim > 2 else out.reshape(-1)


def pad_edges(edges: np.ndarray, max_edges: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad an (e, 2) int edge list to (max_edges, 2) with zeros + mask."""
    e = edges.shape[0]
    if e > max_edges:
        raise ValueError(f"edge list of size {e} exceeds budget {max_edges}")
    out = np.zeros((max_edges, 2), dtype=np.int32)
    mask = np.zeros((max_edges,), dtype=bool)
    out[:e] = edges
    mask[:e] = True
    return out, mask
