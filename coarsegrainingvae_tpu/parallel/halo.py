"""Atom-sharded message passing with halo exchange (shard_map).

SURVEY.md section 2.11's stretch row: beyond ~100k atoms a single chip
cannot hold the message-passing working set, and data parallelism does
not help (it shards FRAMES, not a frame's atoms). This module shards the
ATOM axis over the mesh -- classic MD domain decomposition mapped onto
TPU ICI (the reference is strictly single-GPU and has no analogue):

1. Host-side, once per topology (`plan_halo`): spatially sort the atoms
   along the frame's longest box axis so each device owns a contiguous
   slab. With a radius graph whose cutoff is much smaller than the slab
   width, every cross-shard edge connects ADJACENT slabs only -- a ring.
   Each shard's working set is [left halo | local | right halo] with a
   fixed, padded halo width H; per-shard edge lists are remapped into
   that extended index space, receiver-sorted, and padded to one static
   shape (the CGBatch discipline, data/batch.py).
2. Device-side (`halo_message`): a `shard_map` over ('atoms',) that
   `ppermute`s the two boundary slabs to ring neighbors, runs the
   unmodified sparse message block (models/conv.py) on the extended node
   array, and keeps only the local receivers. ICI traffic per step is
   O(H * F) per device -- boundary-proportional -- instead of the
   O(N * F) an all_gather of node features would move.

Production note: the prototype exchanges RAW node features and lets each
shard recompute the per-node MLP on its 2H halo rows (duplicate FLOPs
~2H/P). The speed-of-light variant runs the MLP locally and exchanges
the post-MLP activations instead; at H << P the difference is noise, so
the simpler contract wins here.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

shard_map = jax.shard_map  # top-level since jax 0.4.35


@dataclasses.dataclass(frozen=True)
class HaloPlan:
    """Host-side atom partition for one topology (all numpy, static)."""

    n_shards: int
    shard_size: int          # P: atoms per shard (of the PADDED count)
    halo: int                # H: boundary atoms exchanged with each neighbor
    order: np.ndarray        # (Np,) sharded index -> original (ghosts -> n)
    inv_order: np.ndarray    # (N,) original index -> sharded index
    edges: np.ndarray        # (D, E, 2) int32 per-shard [recv_ext, send_ext]
    edge_mask: np.ndarray    # (D, E) bool, False on padding
    n_atoms: int = 0         # N: real atoms (Np = n_shards * shard_size)

    @property
    def ext_size(self) -> int:
        return self.shard_size + 2 * self.halo

    @property
    def n_padded(self) -> int:
        return self.n_shards * self.shard_size

    def pad(self, x: np.ndarray) -> np.ndarray:
        """(N, ...) array in ORIGINAL order -> (Np, ...) in sharded order
        (ghost rows zero). Inverse: take [inv_order] of the result."""
        x = np.asarray(x)
        out = np.zeros((self.n_padded,) + x.shape[1:], x.dtype)
        real = self.order < self.n_atoms
        out[real] = x[self.order[real]]
        return out


def plan_halo(
    xyz: np.ndarray, edges: np.ndarray, n_shards: int, halo: int
) -> HaloPlan:
    """Partition one frame's atoms into n_shards contiguous spatial slabs.

    xyz: (N, 3) representative coordinates (any frame -- the partition
    only needs rough locality; the radius graph `edges` (E, 2) directed
    [receiver, sender] decides correctness). N that does not divide by
    n_shards is padded with edge-less ghost atoms sorted last (zero rows
    via `plan.pad`). Raises if any edge would reach beyond the
    +-1-neighbor halo -- the caller must raise `halo` or lower the
    cutoff (the check is exact, not heuristic).
    """
    xyz = np.asarray(xyz)
    n = xyz.shape[0]
    n_pad = (-n) % n_shards
    axis = int(np.argmax(xyz.max(0) - xyz.min(0)))
    order = np.argsort(xyz[:, axis], kind="stable").astype(np.int32)
    if n_pad:
        # ghost atoms (index n) sort last: they own no edges, so the only
        # constraint is that they do not displace real atoms across slab
        # boundaries, which appending at the tail guarantees
        order = np.concatenate([order, np.full(n_pad, n, np.int32)])
    p = (n + n_pad) // n_shards
    if halo > p:
        raise ValueError(f"halo {halo} exceeds shard size {p}")
    inv_order = np.empty(n, np.int32)
    inv_order[order[:n]] = np.arange(n, dtype=np.int32)  # ghosts sit at the tail

    e = inv_order[np.asarray(edges, np.int64)]  # edges in sharded space
    recv_shard = e[:, 0] // p
    span = np.abs(e[:, 1] - e[:, 0])
    # exact reachability: a sender must live inside its receiver's
    # extended window [d*p - halo, (d+1)*p + halo)
    lo = recv_shard * p - halo
    hi = (recv_shard + 1) * p + halo
    bad = (e[:, 1] < lo) | (e[:, 1] >= hi)
    if bad.any():
        worst = int(span[bad].max())
        raise ValueError(
            f"{int(bad.sum())} edges reach beyond the halo "
            f"(max span {worst} atoms, halo {halo}, shard {p}); raise "
            "`halo` or use a smaller cutoff/denser shards"
        )

    per_shard = []
    for d in range(n_shards):
        sel = recv_shard == d
        ed = e[sel]
        base = d * p - halo  # extended-space origin of this shard
        recv_ext = ed[:, 0] - base
        send_ext = ed[:, 1] - base
        o = np.argsort(recv_ext, kind="stable")  # receiver-sorted invariant
        per_shard.append(np.stack([recv_ext[o], send_ext[o]], 1))
    e_max = max(len(x) for x in per_shard) if per_shard else 1
    out = np.full((n_shards, e_max, 2), 0, np.int32)
    mask = np.zeros((n_shards, e_max), bool)
    for d, ed in enumerate(per_shard):
        out[d, : len(ed)] = ed
        # sorted-tail padding: self-loop on the LAST local atom keeps the
        # receiver-sorted invariant (data/neighbors.py discipline)
        out[d, len(ed):] = halo + p - 1
        mask[d, : len(ed)] = True
    return HaloPlan(
        n_shards=n_shards, shard_size=p, halo=halo, order=order,
        inv_order=inv_order, edges=out, edge_mask=mask, n_atoms=n,
    )


def _exchange(x: jnp.ndarray, halo: int, n_shards: int, axis: str):
    """[left halo | local | right halo] for one shard's block: two
    ppermutes move the boundary slabs along the ring; the open ends
    receive zeros (ppermute's missing-source semantics), which is correct
    because plan_halo guarantees no edge references them."""
    left_halo = jax.lax.ppermute(
        x[-halo:], axis, [(i, i + 1) for i in range(n_shards - 1)]
    )
    right_halo = jax.lax.ppermute(
        x[:halo], axis, [(i, i - 1) for i in range(1, n_shards)]
    )
    return jnp.concatenate([left_halo, x, right_halo], axis=0)


def halo_message(
    module,
    params,
    s: jnp.ndarray,      # (N, F)     sharded-order scalar features
    v: jnp.ndarray,      # (N, 3, F)  sharded-order vector features
    xyz: jnp.ndarray,    # (N, 3)     sharded-order coordinates
    plan: HaloPlan,
    mesh: Mesh,
    axis: str = "atoms",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sparse message pass (models/conv.py block, e.g.
    EquiMessageBlock) over atom-sharded inputs. Inputs are in the plan's
    sharded (spatially sorted) order -- apply `plan.pad` host-side once
    per dataset (for N divisible by n_shards it reduces to `x[plan.order]`;
    for uneven N it also zero-fills the ghost rows -- indexing with
    plan.order directly would hit the ghost sentinel). Returns (ds, dv)
    with the same sharded order; recover original order via
    `out[plan.inv_order]`.
    """
    h, p_sz, d = plan.halo, plan.shard_size, plan.n_shards
    edges = jnp.asarray(plan.edges)
    emask = jnp.asarray(plan.edge_mask)

    def run(prm, s_blk, v_blk, xyz_blk, e_blk, m_blk):
        # shard_map passes (1, E, 2) leading-mesh-dim blocks for the
        # per-shard edge tables; drop that axis
        e_blk = e_blk[0]
        m_blk = m_blk[0]
        s_ext = _exchange(s_blk, h, d, axis)
        v_ext = _exchange(v_blk, h, d, axis)
        xyz_ext = _exchange(xyz_blk, h, d, axis)
        r_ij = xyz_ext[e_blk[:, 1]] - xyz_ext[e_blk[:, 0]]
        ds_ext, dv_ext = module.apply(
            {"params": prm}, s_ext, v_ext, r_ij, e_blk, m_blk
        )
        return ds_ext[h : h + p_sz], dv_ext[h : h + p_sz]

    sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        # the per-shard edge tables make the body value-dependent on the
        # shard index, which the varying-manual-axes checker can't prove
        check_vma=False,
    )
    return sharded(params, s, v, xyz, edges, emask)


def make_atom_mesh(n_devices: int, axis: str = "atoms") -> Mesh:
    return Mesh(np.array(jax.devices()[:n_devices]), (axis,))


# ---------------------------------------------------------------------------
# Multi-layer atom-sharded encoder stack
#
# One halo exchange per message layer (features change between layers, so
# halos must be refreshed); the PaiNN node update is per-node and runs on
# local rows only. ICI traffic per step: O(n_conv * H * F) per device.
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402  (after the lightweight helpers)

from coarsegrainingvae_tpu.models.conv import (  # noqa: E402
    EquiMessageBlock,
    UpdateBlock,
)


class EquiStack(nn.Module):
    """Unsharded n_conv x (message + update) residual PaiNN stack.

    The single-device mirror of HaloEquiStack: identical submodule
    creation order, hence an IDENTICAL parameter tree -- init this one
    (no mesh axis needed) and apply either. Functional form matches the
    reference encoder's conv loop (cgvae.py:194-331) minus the CG
    contraction, which stays frame-global (it pools onto n_cgs beads,
    tiny -- a psum_scatter concern only far beyond 100k atoms).
    """

    n_conv: int
    feat_dim: int
    n_rbf: int
    activation: str
    cutoff: float

    @nn.compact
    def __call__(self, s, v, xyz, edges, edge_mask=None):
        r_ij = xyz[edges[:, 1]] - xyz[edges[:, 0]]
        for _ in range(self.n_conv):
            ds, dv = EquiMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff, edges_sorted=True,
            )(s, v, r_ij, edges, edge_mask)
            s = s + ds
            v = v + dv
            us, uv = UpdateBlock(
                feat_dim=self.feat_dim, activation=self.activation,
            )(s, v)
            s = s + us
            v = v + uv
        return s, v


class HaloEquiStack(nn.Module):
    """Atom-sharded body of EquiStack: runs INSIDE shard_map on one
    shard's local block, ppermute-refreshing the halos before each
    message layer. Submodule creation order matches EquiStack exactly,
    so EquiStack.init params apply verbatim."""

    n_conv: int
    feat_dim: int
    n_rbf: int
    activation: str
    cutoff: float
    halo: int
    n_shards: int
    axis: str = "atoms"

    @nn.compact
    def __call__(self, s, v, xyz, edges, edge_mask):
        h, p = self.halo, s.shape[0]
        xyz_ext = _exchange(xyz, h, self.n_shards, self.axis)
        r_ij = xyz_ext[edges[:, 1]] - xyz_ext[edges[:, 0]]
        for _ in range(self.n_conv):
            s_ext = _exchange(s, h, self.n_shards, self.axis)
            v_ext = _exchange(v, h, self.n_shards, self.axis)
            ds, dv = EquiMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff, edges_sorted=True,
            )(s_ext, v_ext, r_ij, edges, edge_mask)
            s = s + ds[h : h + p]
            v = v + dv[h : h + p]
            us, uv = UpdateBlock(
                feat_dim=self.feat_dim, activation=self.activation,
            )(s, v)
            s = s + us
            v = v + uv
        return s, v


def halo_stack_apply(
    stack_kwargs: dict,
    params,
    s: jnp.ndarray,      # (N, F)     sharded-order scalar features
    v: jnp.ndarray,      # (N, 3, F)  sharded-order vector features
    xyz: jnp.ndarray,    # (N, 3)     sharded-order coordinates
    plan: HaloPlan,
    mesh: Mesh,
    axis: str = "atoms",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the n_conv-layer stack atom-sharded over `mesh`.

    stack_kwargs: the EquiStack field dict (n_conv/feat_dim/n_rbf/
    activation/cutoff); params from EquiStack.init on the full graph
    (or any graph with the same shapes -- parameters are shape-only).
    Inputs in plan-sharded order; returns (s, v) in the same order.
    """
    module = HaloEquiStack(
        **stack_kwargs, halo=plan.halo, n_shards=plan.n_shards, axis=axis
    )
    edges = jnp.asarray(plan.edges)
    emask = jnp.asarray(plan.edge_mask)

    def run(prm, s_blk, v_blk, xyz_blk, e_blk, m_blk):
        return module.apply(
            {"params": prm}, s_blk, v_blk, xyz_blk, e_blk[0], m_blk[0]
        )

    sharded = shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return sharded(params, s, v, xyz, edges, emask)
