"""SE(3)-equivariant message-passing blocks (flax.linen).

TPU-native redesign of the reference conv layer zoo (conv.py:31-876 in
/root/reference). Differences from the reference that matter on TPU:

* Vector features are stored as ``(nodes, 3, F)`` -- the feature axis lands
  in the 128-wide TPU lanes, so elementwise vector updates and the
  UpdateBlock channel-mixing matmuls tile densely. (The reference uses
  (N, F, 3), which wastes ~97% of each vector register on TPU.)
* Edge aggregation is ``jax.ops.segment_sum`` over a fixed-size padded edge
  list with a mask; there is no host sync anywhere in the forward (the
  reference calls ``.cpu()`` on indices mid-forward, conv.py:68,379,525).
* All blocks operate on flat node arrays (batch samples pre-offset into one
  graph by the model), so a whole batch is one segment-sum.

Message convention (matches the reference): edges are directed pairs
``(i, j) = (receiver, sender)``; messages gather sender features at
``edges[:, 1]`` and scatter-add to ``edges[:, 0]``.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from coarsegrainingvae_tpu.models.modules import Dense, DistanceEmbed
from coarsegrainingvae_tpu.ops.geometry import preprocess_r
from coarsegrainingvae_tpu.ops.segment import segment_sum

Array = jnp.ndarray


def _gather(x: Array, idx: Array) -> Array:
    return jnp.take(x, idx, axis=0)


def cross3(a: Array, b: Array) -> Array:
    """Cross product over the length-3 axis of (E, 3, F) arrays.

    Written as explicit rolls on axis 1 (cheap relayouts) instead of
    jnp.cross on a trailing axis, keeping F in lanes.
    """
    a1, a2, a3 = a[:, 0], a[:, 1], a[:, 2]
    b1, b2, b3 = b[:, 0], b[:, 1], b[:, 2]
    return jnp.stack(
        [a2 * b3 - a3 * b2, a3 * b1 - a1 * b3, a1 * b2 - a2 * b1], axis=1
    )


class InvariantMessage(nn.Module):
    """phi(s_j) gathered at senders x RBF distance filter -> per-edge
    invariant message (conv.py:31-75)."""

    in_feat_dim: int
    out_feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s: Array, dist: Array, edges: Array) -> Array:
        # per-node MLP first (N-sized matmul), gather per-edge after
        phi = Dense(self.in_feat_dim, activation=self.activation, dtype=self.dtype)(s)
        phi = Dense(self.out_feat_dim, dtype=self.dtype)(phi)
        phi_j = _gather(phi, edges[:, 1])
        w_s = DistanceEmbed(
            n_rbf=self.n_rbf, cutoff=self.cutoff, feat_dim=self.out_feat_dim,
            dtype=self.dtype,
        )(dist)
        return phi_j * w_s


class EquiMessageBlock(nn.Module):
    """Standard PaiNN message (conv.py:487-563): 3-way split ->
    dv = a*unit + b*v_j, ds = c."""

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    degree_norm: bool = False  # rsqrt(deg) message scaling for
    # large/high-degree graphs (reference has none; its graphs are small)
    edges_sorted: bool = True  # data pipeline emits receiver-sorted
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        s: Array,            # (N, F)
        v: Array,            # (N, 3, F)
        r_ij: Array,         # (E, 3)
        edges: Array,        # (E, 2) int32
        edge_mask: Optional[Array] = None,  # (E,)
        edge_wgt: Optional[Array] = None,   # (E,)
    ) -> Tuple[Array, Array]:
        num_nodes = s.shape[0]
        dist, unit = preprocess_r(r_ij)
        inv = InvariantMessage(
            in_feat_dim=self.feat_dim, out_feat_dim=3 * self.feat_dim,
            activation=self.activation, n_rbf=self.n_rbf, cutoff=self.cutoff,
            dtype=self.dtype,
        )(s, dist, edges)
        inv = inv.reshape(-1, 3, self.feat_dim)
        a, b, c = inv[:, 0], inv[:, 1], inv[:, 2]

        dv_ij = c[:, None, :] * unit[:, :, None] + a[:, None, :] * _gather(v, edges[:, 1])
        ds_ij = b
        if edge_wgt is not None:
            dv_ij = dv_ij * edge_wgt[:, None, None]
            ds_ij = ds_ij * edge_wgt[:, None]
        dv = segment_sum(dv_ij, edges[:, 0], num_nodes, edge_mask,
                         indices_are_sorted=self.edges_sorted)
        ds = segment_sum(ds_ij, edges[:, 0], num_nodes, edge_mask,
                         indices_are_sorted=self.edges_sorted)
        if self.degree_norm:
            ones = jnp.ones(edges.shape[0], ds.dtype)
            deg = segment_sum(ones, edges[:, 0], num_nodes, edge_mask,
                              indices_are_sorted=self.edges_sorted)
            scale = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
            ds = ds * scale[:, None]
            dv = dv * scale[:, None, None]
        return ds, dv


class EquiMessageCross(nn.Module):
    """PaiNN message + v x v cross term (conv.py:343-402), 4-way split."""

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    degree_norm: bool = False  # rsqrt(deg) message scaling for
    # large/high-degree graphs (reference has none; its graphs are small)
    edges_sorted: bool = True  # data pipeline emits receiver-sorted
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        s: Array,
        v: Array,
        r_ij: Array,
        edges: Array,
        edge_mask: Optional[Array] = None,
        edge_wgt: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        num_nodes = s.shape[0]
        dist, unit = preprocess_r(r_ij)
        inv = InvariantMessage(
            in_feat_dim=self.feat_dim, out_feat_dim=4 * self.feat_dim,
            activation=self.activation, n_rbf=self.n_rbf, cutoff=self.cutoff,
            dtype=self.dtype,
        )(s, dist, edges)
        inv = inv.reshape(-1, 4, self.feat_dim)
        s0, s1, s2, s3 = inv[:, 0], inv[:, 1], inv[:, 2], inv[:, 3]

        v_i = _gather(v, edges[:, 0])
        v_j = _gather(v, edges[:, 1])
        dv_ij = (
            s2[:, None, :] * unit[:, :, None]
            + s0[:, None, :] * v_j
            + s3[:, None, :] * cross3(v_i, v_j)
        )
        ds_ij = s1
        if edge_wgt is not None:
            dv_ij = dv_ij * edge_wgt[:, None, None]
            ds_ij = ds_ij * edge_wgt[:, None]
        dv = segment_sum(dv_ij, edges[:, 0], num_nodes, edge_mask,
                         indices_are_sorted=self.edges_sorted)
        ds = segment_sum(ds_ij, edges[:, 0], num_nodes, edge_mask,
                         indices_are_sorted=self.edges_sorted)
        if self.degree_norm:
            ones = jnp.ones(edges.shape[0], ds.dtype)
            deg = segment_sum(ones, edges[:, 0], num_nodes, edge_mask,
                              indices_are_sorted=self.edges_sorted)
            scale = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
            ds = ds * scale[:, None]
            dv = dv * scale[:, None, None]
        return ds, dv


class EquiMessagePseudo(nn.Module):
    """Chirality-aware message block (conv.py:165-242): maintains
    (s, sbar pseudoscalar, v, vbar pseudovector); 9-way split with cross
    products v x vbar, v x v, vbar x vbar and the v.vbar dot."""

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    edges_sorted: bool = True  # data pipeline emits receiver-sorted
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        s: Array,      # (N, F)
        sbar: Array,   # (N, F)
        v: Array,      # (N, 3, F)
        vbar: Array,   # (N, 3, F)
        r_ij: Array,
        edges: Array,
        edge_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array, Array]:
        num_nodes = s.shape[0]
        dist, unit = preprocess_r(r_ij)
        inv = InvariantMessage(
            in_feat_dim=self.feat_dim, out_feat_dim=9 * self.feat_dim,
            activation=self.activation, n_rbf=self.n_rbf, cutoff=self.cutoff,
            dtype=self.dtype,
        )(s, dist, edges)
        inv = inv.reshape(-1, 9, self.feat_dim)
        sp = [inv[:, k] for k in range(9)]

        i_idx, j_idx = edges[:, 0], edges[:, 1]
        s_i = _gather(s, i_idx)
        sbar_i = _gather(sbar, i_idx)
        v_i, v_j = _gather(v, i_idx), _gather(v, j_idx)
        vbar_i, vbar_j = _gather(vbar, i_idx), _gather(vbar, j_idx)

        # conv.py:207-219 term by term (note: reference indexes s_j/sbar_j at
        # nbrs[:,0], i.e. the receiver -- preserved)
        ds_ij = sp[0] * s_i
        dsbar_ij = jnp.sum(v_i * vbar_j, axis=1)  # dot over the 3-axis -> (E, F)

        dv_ij = (
            sp[1][:, None, :] * unit[:, :, None]
            + sp[2][:, None, :] * v_j
            + sp[3][:, None, :] * cross3(v_i, vbar_j)
            + sp[4][:, None, :] * sbar_i[:, None, :] * vbar_j
        )
        dvbar_ij = (
            sp[5][:, None, :] * vbar_j
            + sp[6][:, None, :] * sbar_i[:, None, :] * v_j
            + sp[7][:, None, :] * cross3(v_i, v_j)
            + sp[8][:, None, :] * cross3(vbar_i, vbar_j)
        )

        srt = self.edges_sorted
        ds = segment_sum(ds_ij, i_idx, num_nodes, edge_mask, indices_are_sorted=srt)
        dsbar = segment_sum(dsbar_ij, i_idx, num_nodes, edge_mask, indices_are_sorted=srt)
        dv = segment_sum(dv_ij, i_idx, num_nodes, edge_mask, indices_are_sorted=srt)
        dvbar = segment_sum(dvbar_ij, i_idx, num_nodes, edge_mask, indices_are_sorted=srt)
        return ds, dsbar, dv, dvbar


def pseudo2_edge_terms(
    sp: Array,        # (E, 4, F) invariant message split
    s_i: Array,       # (E, F) receiver scalars
    sbar_i: Array,    # (E, F) receiver pseudoscalars
    v_i: Array,       # (E, 3, F) receiver vectors
    vbar_i: Array,    # (E, 3, F) receiver pseudovectors
    v_j: Array,       # (E, 3, F) sender vectors
    vbar_j: Array,    # (E, 3, F) sender pseudovectors
    unit: Array,      # (E, 3) edge unit vectors
    w_dv: Array,      # (3F, F) learned mixing for dv
    w_dvbar: Array,   # (4F, F) learned mixing for dvbar
) -> Tuple[Array, Array, Array, Array]:
    """Per-edge EquiMessagePsuedo2 terms (reference conv.py:264-340), pure so
    tests can hand-compute against it. 4-way invariant split:
      ds    = sp[1]
      dsbar = sp[3] * (v_i . vbar_j)
      dv    = sp[2]*unit + sp[0]*v_j + [s_i*v_j | sbar_i*vbar_j | v_i x vbar_j] @ w_dv
      dvbar = [s_i*vbar_j | sbar_i*v_j | v_i x v_j | vbar_i x vbar_j] @ w_dvbar
    (the learned 3F/4F -> F mixes replace pseudo(9-way)'s per-term scalar
    gates; reference mix_dv/mix_dvbar are bias-free Linears)."""
    ds_ij = sp[:, 1]
    dsbar_ij = sp[:, 3] * jnp.sum(v_i * vbar_j, axis=1)

    dv_cat = jnp.concatenate(
        [s_i[:, None, :] * v_j, sbar_i[:, None, :] * vbar_j, cross3(v_i, vbar_j)],
        axis=-1,
    )  # (E, 3, 3F): feature-axis concat -> one MXU matmul per edge block
    dv_ij = (
        sp[:, 2][:, None, :] * unit[:, :, None]
        + sp[:, 0][:, None, :] * v_j
        + dv_cat @ w_dv
    )
    dvbar_cat = jnp.concatenate(
        [
            s_i[:, None, :] * vbar_j,
            sbar_i[:, None, :] * v_j,
            cross3(v_i, v_j),
            cross3(vbar_i, vbar_j),
        ],
        axis=-1,
    )  # (E, 3, 4F)
    dvbar_ij = dvbar_cat @ w_dvbar
    return ds_ij, dsbar_ij, dv_ij, dvbar_ij


class EquiMessagePseudo2(nn.Module):
    """Chirality-aware message block, 4-way split + learned mixing
    (reference EquiMessagePsuedo2, conv.py:246-340): instead of pseudo's
    9 per-term invariant gates, the vector/pseudovector interaction terms
    are concatenated on the feature axis and mixed by bias-free Linears
    (3F->F for dv, 4F->F for dvbar) -- dense matmuls that tile onto the MXU.
    Unused by the reference drivers; exposed as dec_type='pseudo2'."""

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    edges_sorted: bool = True  # data pipeline emits receiver-sorted
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        s: Array,      # (N, F)
        sbar: Array,   # (N, F)
        v: Array,      # (N, 3, F)
        vbar: Array,   # (N, 3, F)
        r_ij: Array,
        edges: Array,
        edge_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array, Array, Array]:
        num_nodes = s.shape[0]
        f = self.feat_dim
        dist, unit = preprocess_r(r_ij)
        inv = InvariantMessage(
            in_feat_dim=f, out_feat_dim=4 * f, activation=self.activation,
            n_rbf=self.n_rbf, cutoff=self.cutoff, dtype=self.dtype,
        )(s, dist, edges)
        sp = inv.reshape(-1, 4, f)

        w_dv = self.param(
            "mix_dv", nn.initializers.lecun_normal(), (3 * f, f), self.dtype
        )
        w_dvbar = self.param(
            "mix_dvbar", nn.initializers.lecun_normal(), (4 * f, f), self.dtype
        )

        i_idx, j_idx = edges[:, 0], edges[:, 1]
        ds_ij, dsbar_ij, dv_ij, dvbar_ij = pseudo2_edge_terms(
            sp, _gather(s, i_idx), _gather(sbar, i_idx),
            _gather(v, i_idx), _gather(vbar, i_idx),
            _gather(v, j_idx), _gather(vbar, j_idx),
            unit, w_dv, w_dvbar,
        )

        srt = self.edges_sorted
        ds = segment_sum(ds_ij, i_idx, num_nodes, edge_mask, indices_are_sorted=srt)
        dsbar = segment_sum(dsbar_ij, i_idx, num_nodes, edge_mask, indices_are_sorted=srt)
        dv = segment_sum(dv_ij, i_idx, num_nodes, edge_mask, indices_are_sorted=srt)
        dvbar = segment_sum(dvbar_ij, i_idx, num_nodes, edge_mask, indices_are_sorted=srt)
        return ds, dsbar, dv, dvbar


class ENMessageBlock(nn.Module):
    """EGNN-style block (conv.py:77-129): 2-way split, dv from unit vectors
    only, ds invariant."""

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    degree_norm: bool = False
    edges_sorted: bool = True  # data pipeline emits receiver-sorted
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        s: Array,
        v: Array,
        r_ij: Array,
        edges: Array,
        edge_mask: Optional[Array] = None,
        edge_wgt: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        num_nodes = s.shape[0]
        dist, unit = preprocess_r(r_ij)
        inv = InvariantMessage(
            in_feat_dim=self.feat_dim, out_feat_dim=2 * self.feat_dim,
            activation=self.activation, n_rbf=self.n_rbf, cutoff=self.cutoff,
            dtype=self.dtype,
        )(s, dist, edges)
        inv = inv.reshape(-1, 2, self.feat_dim)
        equi_f, inv_f = inv[:, 0], inv[:, 1]
        dv_ij = equi_f[:, None, :] * unit[:, :, None]
        ds_ij = inv_f
        if edge_wgt is not None:
            dv_ij = dv_ij * edge_wgt[:, None, None]
            ds_ij = ds_ij * edge_wgt[:, None]
        dv = segment_sum(dv_ij, edges[:, 0], num_nodes, edge_mask,
                         indices_are_sorted=self.edges_sorted)
        ds = segment_sum(ds_ij, edges[:, 0], num_nodes, edge_mask,
                         indices_are_sorted=self.edges_sorted)
        if self.degree_norm:
            ones = jnp.ones(edges.shape[0], ds.dtype)
            deg = segment_sum(ones, edges[:, 0], num_nodes, edge_mask,
                              indices_are_sorted=self.edges_sorted)
            scale = jax.lax.rsqrt(jnp.maximum(deg, 1.0))
            ds = ds * scale[:, None]
            dv = dv * scale[:, None, None]
        return ds, dv


class InvMessageBlock(nn.Module):
    """Invariant-only messages (conv.py:132-163); the --invariantdec
    ablation path. Vector features pass through untouched."""

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    edges_sorted: bool = True  # data pipeline emits receiver-sorted
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        s: Array,
        v: Array,
        r_ij: Array,
        edges: Array,
        edge_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        num_nodes = s.shape[0]
        dist, _ = preprocess_r(r_ij)
        inv = InvariantMessage(
            in_feat_dim=self.feat_dim, out_feat_dim=self.feat_dim,
            activation=self.activation, n_rbf=self.n_rbf, cutoff=self.cutoff,
            dtype=self.dtype,
        )(s, dist, edges)
        ds = segment_sum(inv, edges[:, 0], num_nodes, edge_mask,
                         indices_are_sorted=self.edges_sorted)
        return ds, v


class UpdateBlock(nn.Module):
    """PaiNN node update (conv.py:566-616): U,V channel mixing of v, gated
    by an MLP of [s, |Vv|].

    With the (N, 3, F) layout the channel mixes are (N*3, F) @ (F, F)
    matmuls -- dense MXU work.
    """

    feat_dim: int
    activation: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s: Array, v: Array) -> Tuple[Array, Array]:
        u_v = Dense(self.feat_dim, use_bias=False, dtype=self.dtype)(v)  # (N,3,F)
        v_v = Dense(self.feat_dim, use_bias=False, dtype=self.dtype)(v)

        v_v_norm = jnp.sqrt(jnp.sum(v_v**2 + 1e-10, axis=1))  # (N, F)
        stack = jnp.concatenate([s, v_v_norm], axis=-1)
        split = Dense(self.feat_dim, activation=self.activation, dtype=self.dtype)(stack)
        split = Dense(3 * self.feat_dim, dtype=self.dtype)(split)
        split = split.reshape(-1, 3, self.feat_dim)

        a_vv, a_sv, a_ss = split[:, 0], split[:, 1], split[:, 2]
        dv = u_v * a_vv[:, None, :]
        inner = jnp.sum(u_v * v_v, axis=1)
        ds = inner * a_sv + a_ss
        return ds, dv


class PseudoUpdateBlock(nn.Module):
    """Pseudoscalar/pseudovector analogue of UpdateBlock (conv.py:619-673).

    Constructed by the reference decoder but its call is commented out
    (cgvae.py:116-120); provided for completeness/experiments.
    """

    feat_dim: int
    activation: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sbar: Array, vbar: Array) -> Tuple[Array, Array]:
        u_v = Dense(self.feat_dim, use_bias=False, dtype=self.dtype)(vbar)
        v_v = Dense(self.feat_dim, use_bias=False, dtype=self.dtype)(vbar)

        v_v_norm = jnp.sqrt(jnp.sum(v_v**2 + 1e-10, axis=1))
        vector = sbar[:, None, :] * vbar  # pseudo x pseudo = proper vector
        vector_norm = jnp.sqrt(jnp.sum(vector**2 + 1e-10, axis=1))

        stack = jnp.concatenate([vector_norm, v_v_norm], axis=-1)
        split = Dense(self.feat_dim, activation=self.activation, dtype=self.dtype)(stack)
        split = Dense(3 * self.feat_dim, dtype=self.dtype)(split)
        split = split.reshape(-1, 3, self.feat_dim)

        a_vv, a_sv, a_ss = split[:, 0], split[:, 1], split[:, 2]
        dvbar = u_v * a_vv[:, None, :]
        inner = jnp.sum(u_v * v_v, axis=1)
        dsbar = inner * a_sv * sbar + a_ss * sbar
        return dsbar, dvbar


class InvariantFilter(nn.Module):
    """3-way linear edge-filter helper (reference conv.py:739-755): one
    biased F -> 3F Dense over per-edge invariant messages, split into three
    F-wide filters. Unused by the reference drivers; provided for the full
    §2.2 component surface. One (E, F) @ (F, 3F) MXU matmul."""

    feat_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, m_ij: Array) -> Tuple[Array, Array, Array]:
        f = Dense(3 * self.feat_dim, dtype=self.dtype)(m_ij)
        f = f.reshape(m_ij.shape[0], 3, self.feat_dim)
        return f[:, 0], f[:, 1], f[:, 2]


class ContractiveMessageBlock(nn.Module):
    """Atom -> CG pooling message along r_iI = x_i - X_map(i)
    (conv.py:677-733). Per-atom (not per-edge) compute + one segment-sum
    over the mapping."""

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float  # hard-coded 20.0 at the reference call site (cgvae.py:249)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        s: Array,          # (N, F) atom scalars
        v: Array,          # (N, 3, F) atom vectors
        r_iI: Array,       # (N, 3) atom -> assigned-bead displacement
        mapping: Array,    # (N,) global CG ids
        num_cg: int,
        atom_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        dist, unit = preprocess_r(r_iI)
        phi = Dense(self.feat_dim, activation=self.activation, dtype=self.dtype)(s)
        phi = Dense(3 * self.feat_dim, dtype=self.dtype)(phi)
        w_s = DistanceEmbed(
            n_rbf=self.n_rbf, cutoff=self.cutoff, feat_dim=3 * self.feat_dim,
            dtype=self.dtype,
        )(dist)
        inv = (phi * w_s).reshape(-1, 3, self.feat_dim)
        a, b, c = inv[:, 0], inv[:, 1], inv[:, 2]

        dv_iI = c[:, None, :] * unit[:, :, None] + a[:, None, :] * v
        ds_iI = b
        dV = segment_sum(dv_iI, mapping, num_cg, atom_mask)
        dS = segment_sum(ds_iI, mapping, num_cg, atom_mask)
        return dS, dV
