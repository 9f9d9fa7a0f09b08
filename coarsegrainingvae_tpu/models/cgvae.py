"""CGequiVAE model family (flax.linen).

TPU-native re-design of the reference models (cgvae.py:8-594 in
/root/reference). A whole `CGBatch` is flattened into one big graph with
static shapes (per-sample indices + arithmetic offsets, no host work), and
every aggregation is a masked segment op. The per-bead channel lift
(CG2ChannelIdx) is a precomputed constant carried by the batch instead of a
per-batch Python loop (cgvae.py:451-460).

Live-path parity notes:
* The reference encoder constructs but never calls its update blocks /
  CG-graph message blocks (cgvae.py:290-328, commented out); we only build
  what runs, so parameter counts differ from the reference checkpoint format.
* The reference decoder's pseudo-update call is likewise commented out
  (cgvae.py:116-120); `EquivariantPseudoDecoder` matches the live path.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from coarsegrainingvae_tpu.config import ModelConfig
from coarsegrainingvae_tpu.data.batch import CGBatch, flatten_ids
from coarsegrainingvae_tpu.models.conv import (
    ContractiveMessageBlock,
    ENMessageBlock,
    EquiMessageBlock,
    EquiMessageCross,
    EquiMessagePseudo,
    EquiMessagePseudo2,
    InvMessageBlock,
    UpdateBlock,
)
from coarsegrainingvae_tpu.models.modules import Dense, EmbeddingZeroPad, MLP
from coarsegrainingvae_tpu.ops.segment import segment_mean

Array = jnp.ndarray


@struct.dataclass
class FlatGraph:
    """A CGBatch flattened to one global graph (all static shapes)."""

    z: Array          # (BN,)
    xyz: Array        # (BN, 3)
    atom_mask: Array  # (BN,)
    cg_z: Array       # (BM,)
    cg_xyz: Array     # (BM, 3)
    cg_mask: Array    # (BM,)
    mapping: Array    # (BN,) global bead ids
    channel_idx: Array
    nbrs: Array       # (BE, 2) global
    nbr_mask: Array
    cg_nbrs: Array    # (BEc, 2) global
    cg_nbr_mask: Array
    bonds: Array      # (BEb, 2) global
    bond_mask: Array
    num_nodes: int = struct.field(pytree_node=False)
    num_cg: int = struct.field(pytree_node=False)


def flatten_batch(batch: CGBatch) -> FlatGraph:
    b, n = batch.z.shape
    m = batch.cg_z.shape[1]
    return FlatGraph(
        z=batch.z.reshape(-1),
        xyz=batch.xyz.reshape(-1, 3),
        atom_mask=batch.atom_mask.reshape(-1),
        cg_z=batch.cg_z.reshape(-1),
        cg_xyz=batch.cg_xyz.reshape(-1, 3),
        cg_mask=batch.cg_mask.reshape(-1),
        mapping=flatten_ids(batch.mapping, m),
        channel_idx=batch.channel_idx.reshape(-1),
        nbrs=flatten_ids(batch.nbrs, n),
        nbr_mask=batch.nbr_mask.reshape(-1),
        cg_nbrs=flatten_ids(batch.cg_nbrs, m),
        cg_nbr_mask=batch.cg_nbr_mask.reshape(-1),
        bonds=flatten_ids(batch.bonds, n),
        bond_mask=batch.bond_mask.reshape(-1),
        num_nodes=b * n,
        num_cg=b * m,
    )


def _edge_vec(xyz: Array, edges: Array) -> Array:
    return jnp.take(xyz, edges[:, 1], axis=0) - jnp.take(xyz, edges[:, 0], axis=0)


@struct.dataclass
class VAEOutput:
    mu: Optional[Array]
    sigma: Optional[Array]
    prior_mu: Optional[Array]
    prior_sigma: Optional[Array]
    xyz: Array
    xyz_recon: Array


def project_h_bonds(
    xyz_recon: Array,   # (BN, 3) decoded positions (flat layout)
    z: Array,           # (BN,)
    xyz_true: Array,    # (BN, 3) batch ground truth (bond lengths only)
    bonds: Array,       # (BEb, 2) global covalent edges
    bond_mask: Array,   # (BEb,)
) -> Array:
    """Snap every hydrogen onto its covalent bond length along the decoded
    direction (SHAKE-style hard constraint; differentiable a.e.).

    Opt-in repo extension (ModelConfig.h_project, no reference analogue):
    the census of trained runs (examples/validity_census.py) shows the
    dominant all-atom validity failure is X-H bonds reconstructed outside
    the 1.3x-covalent cutoff, and an X-H bond LENGTH is a chemical
    constant -- reading it from the batch's true geometry leaks nothing
    about the conformer. Equivariant by construction (built from relative
    vectors). Each H has exactly one covalent bond, so one .at[].add
    scatter rewrites all hydrogens in a single fused op.
    """
    a, b = bonds[:, 0], bonds[:, 1]
    za, zb = jnp.take(z, a), jnp.take(z, b)
    is_ha = (za == 1) & (zb != 1)
    is_hb = (zb == 1) & (za != 1)
    h_idx = jnp.where(is_ha, a, b)
    p_idx = jnp.where(is_ha, b, a)
    rest = jnp.sqrt(jnp.sum(
        (jnp.take(xyz_true, h_idx, 0) - jnp.take(xyz_true, p_idx, 0)) ** 2,
        -1,
    ) + 1e-12)
    # g.bonds is the edgeorder-EXPANDED graph-loss edge list (possibly
    # directed): keep, per hydrogen, only its TRUE covalent parent = the
    # NEAREST heavy partner in the true geometry (a 1-2 X-H is always
    # closer than any 1-3 pseudo-edge; an absolute distance gate fails on
    # compressed 1-3 pairs). Scatter-min over the H axis, then select the
    # edges that attain it.
    sel0 = is_ha | is_hb
    if bond_mask is not None:
        sel0 = sel0 & (bond_mask > 0)
    restw = jnp.where(sel0, rest, jnp.inf)
    min_rest = jnp.full(
        xyz_recon.shape[0], jnp.inf, rest.dtype
    ).at[h_idx].min(restw)
    sel = sel0 & (rest <= jnp.take(min_rest, h_idx) + 1e-6)
    d = jnp.take(xyz_recon, h_idx, 0) - jnp.take(xyz_recon, p_idx, 0)
    norm = jnp.sqrt(jnp.sum(d * d, -1) + 1e-12)
    target = jnp.take(xyz_recon, p_idx, 0) + d * (rest / norm)[:, None]
    selw = sel.astype(xyz_recon.dtype)
    # duplicate directed edges contribute the same target: average them
    acc = jnp.zeros_like(xyz_recon).at[h_idx].add(target * selw[:, None])
    cnt = jnp.zeros(xyz_recon.shape[0], xyz_recon.dtype).at[h_idx].add(selw)
    proj = acc / jnp.maximum(cnt, 1.0)[:, None]
    return jnp.where((cnt > 0.0)[:, None], proj, xyz_recon)


def project_bonds_rooted(
    xyz_recon: Array,   # (BN, 3) decoded positions (flat layout)
    xyz_true: Array,    # (BN, 3) true geometry (bond lengths only)
    bonds: Array,       # (BEb, 2) global covalent edges
    bond_mask: Array,   # (BEb,) or None
    root_mask: Array,   # (BN,) pinned root atoms (PCN: the C-alphas)
    atom_mask: Array = None,  # (BN,)
    max_depth: int = 8,
    n_relax: int = 20,
) -> Array:
    """Depth-ordered covalent bond-length projection rooted at pinned
    atoms (the PCN analogue of `project_h_bonds`): label every atom with
    its BFS depth from the nearest root along the covalent graph (done
    IN-JIT with max_depth rounds of scatter-min -- no host precompute),
    then, depth by depth, snap each atom onto its parent at the TRUE
    bond length (a chemical constant) along the decoded direction.

    Roots never move; sequential depth rounds mean each atom projects
    onto its ALREADY-projected parent, so every TREE bond in the output
    is exact. Cycle-closing bonds (rings; the synthetic atom14 ensembles
    are heavily cyclic) are then handled by n_relax rounds of Jacobi
    bond-constraint relaxation (position-based dynamics: every atom
    moves by its degree-normalized mean bond-length correction, roots
    stay pinned). Equivariant, differentiable a.e.; opt-in (no
    reference analogue)."""
    n = xyz_recon.shape[0]
    a, b = bonds[:, 0], bonds[:, 1]
    bm = (
        jnp.ones(a.shape[0], bool) if bond_mask is None else (bond_mask > 0)
    )
    if atom_mask is not None:
        bm = bm & (atom_mask[a] > 0) & (atom_mask[b] > 0)
    inf = jnp.int32(1_000_000)
    depth = jnp.where(root_mask > 0, 0, inf).astype(jnp.int32)
    if atom_mask is not None:
        depth = jnp.where(atom_mask > 0, depth, inf)
    for _ in range(max_depth):
        da, db = jnp.take(depth, a), jnp.take(depth, b)
        depth = depth.at[a].min(jnp.where(bm, db + 1, inf))
        depth = depth.at[b].min(jnp.where(bm, da + 1, inf))
    da, db = jnp.take(depth, a), jnp.take(depth, b)
    parent = jnp.full(n, -1, jnp.int32)
    parent = parent.at[a].max(jnp.where(bm & (da == db + 1), b, -1))
    parent = parent.at[b].max(jnp.where(bm & (db == da + 1), a, -1))
    p = jnp.clip(parent, 0)
    rest = jnp.sqrt(jnp.sum(
        (xyz_true - jnp.take(xyz_true, p, 0)) ** 2, -1) + 1e-12)
    x = xyz_recon
    for d in range(1, max_depth + 1):
        sel = (depth == d) & (parent >= 0)
        dvec = x - jnp.take(x, p, 0)
        nrm = jnp.sqrt(jnp.sum(dvec * dvec, -1) + 1e-12)
        target = jnp.take(x, p, 0) + dvec * (rest / nrm)[:, None]
        x = jnp.where(sel[:, None], target, x)
    if n_relax > 0:
        # Jacobi bond-constraint relaxation for the cycle bonds the tree
        # pass cannot pin (each round: every atom takes the degree-
        # normalized mean of its bonds' length corrections)
        bw = bm.astype(x.dtype)
        rest_e = jnp.sqrt(jnp.sum(
            (jnp.take(xyz_true, a, 0) - jnp.take(xyz_true, b, 0)) ** 2, -1
        ) + 1e-12)
        deg = jnp.zeros(n, x.dtype).at[a].add(bw).at[b].add(bw)
        movable = ((root_mask <= 0)
                   & (deg > 0)
                   & (True if atom_mask is None else atom_mask > 0))
        inv_deg = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1.0), 0.0)
        for _ in range(n_relax):
            dvec = jnp.take(x, a, 0) - jnp.take(x, b, 0)
            dist = jnp.sqrt(jnp.sum(dvec * dvec, -1) + 1e-12)
            corr = (bw * (dist - rest_e) / dist)[:, None] * dvec
            delta = jnp.zeros_like(x).at[a].add(-0.5 * corr).at[b].add(0.5 * corr)
            x = x + jnp.where(movable[:, None], delta * inv_deg[:, None], 0.0)
    return x


class EquiEncoder(nn.Module):
    """Atom-graph PaiNN encoder with per-layer atom->CG contraction
    (cgvae.py:194-331). Returns (H per-bead, h per-atom).

    NOTE the reference wires cutoff=cg_cutoff into this encoder's edge
    filters (run_ala.py:199-201) -- preserved via the `cutoff` field.
    """

    n_conv: int
    feat_dim: int
    n_rbf: int
    activation: str
    cutoff: float
    contract_cutoff: float = 20.0
    degree_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: FlatGraph) -> Tuple[Array, Array]:
        h = EmbeddingZeroPad(100, self.feat_dim)(g.z)
        v = jnp.zeros((g.num_nodes, 3, self.feat_dim), h.dtype)

        r_ij = _edge_vec(g.xyz, g.nbrs)
        r_iI = g.xyz - jnp.take(g.cg_xyz, g.mapping, axis=0)

        H = jnp.zeros((g.num_cg, self.feat_dim), h.dtype)
        V = jnp.zeros((g.num_cg, 3, self.feat_dim), h.dtype)

        for i in range(self.n_conv):
            ds, dv = EquiMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff,
                degree_norm=self.degree_norm, dtype=self.dtype,
            )(h, v, r_ij, g.nbrs, g.nbr_mask)
            h = h + ds
            v = v + dv

            if i == 0:
                H = segment_mean(h, g.mapping, g.num_cg, g.atom_mask)
                V = segment_mean(v, g.mapping, g.num_cg, g.atom_mask)

            dH, dV = ContractiveMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.contract_cutoff, dtype=self.dtype,
            )(h, v, r_iI, g.mapping, g.num_cg, g.atom_mask)
            H = H + dH
            V = V + dV

        return H, h


class CGprior(nn.Module):
    """Conditional prior p(z | CG geometry) (cgvae.py:334-403): PaiNN convs
    on the CG graph (bead-index embedding) -> mu, sigma heads.

    The reference hard-codes a 100-entry bead-index embedding
    (nn.Embedding(100, F)) -- fine for its <=12-bead runs, out-of-bounds
    (silent NaN) beyond; here the vocab scales with n_cgs."""

    n_conv: int
    feat_dim: int
    n_rbf: int
    activation: str
    cutoff: float
    degree_norm: bool = False
    vocab: int = 100
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: FlatGraph) -> Tuple[Array, Array]:
        h = EmbeddingZeroPad(self.vocab, self.feat_dim)(g.cg_z)
        v = jnp.zeros((g.num_cg, 3, self.feat_dim), h.dtype)
        r_ij = _edge_vec(g.cg_xyz, g.cg_nbrs)

        for _ in range(self.n_conv):
            ds, dv = EquiMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff,
                degree_norm=self.degree_norm, dtype=self.dtype,
            )(h, v, r_ij, g.cg_nbrs, g.cg_nbr_mask)
            h = h + ds
            v = v + dv

        mu = MLP([self.feat_dim, self.feat_dim], activation="Tanh", dtype=self.dtype)(h)
        logvar = MLP([self.feat_dim, self.feat_dim], activation="Tanh", dtype=self.dtype)(h)
        logvar = jnp.clip(logvar, -30.0, 30.0)
        sigma = 1e-9 + jnp.exp(logvar / 2.0)
        return mu, sigma


class EquivariantDecoder(nn.Module):
    """Decoder over the CG graph: (EquiMessageCross | EquiMessageBlock) +
    UpdateBlock per layer (cgvae.py:129-191)."""

    feat_dim: int
    n_rbf: int
    cutoff: float
    num_conv: int
    activation: str
    cross: bool = True
    degree_norm: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: FlatGraph, S: Array) -> Tuple[Array, Array]:
        H = S
        V = jnp.zeros((S.shape[0], 3, self.feat_dim), S.dtype)
        r_ij = _edge_vec(g.cg_xyz, g.cg_nbrs)
        block = EquiMessageCross if self.cross else EquiMessageBlock

        for i in range(self.num_conv):
            dH, dV = block(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff,
                degree_norm=self.degree_norm, dtype=self.dtype,
            )(H, V, r_ij, g.cg_nbrs, g.cg_nbr_mask)
            H = H + dH
            V = V + dV
            dH, dV = UpdateBlock(
                feat_dim=self.feat_dim, activation=self.activation, dtype=self.dtype
            )(H, V)
            H = H + dH
            V = V + dV
        return H, V


class EquivariantPseudoDecoder(nn.Module):
    """Chirality-aware decoder (cgvae.py:52-125): EquiMessagePseudo +
    UpdateBlock; breaksym seeds the pseudoscalar channel at 1 to break mirror
    symmetry (enabled when n_cgs == 3, run_ala.py:192-197)."""

    feat_dim: int
    n_rbf: int
    cutoff: float
    num_conv: int
    activation: str
    breaksym: bool = False
    # 'pseudo' = 9-way gated block (conv.py:165-242); 'pseudo2' = 4-way
    # split + learned 3F/4F->F mixing (conv.py:246-340)
    variant: str = "pseudo"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: FlatGraph, S: Array) -> Tuple[Array, Array]:
        V = jnp.zeros((S.shape[0], 3, self.feat_dim), S.dtype)
        Vbar = jnp.zeros_like(V)
        if self.breaksym:
            Sbar = jnp.ones_like(S)
        else:
            Sbar = jnp.zeros_like(S)
        r_ij = _edge_vec(g.cg_xyz, g.cg_nbrs)
        message_cls = (
            EquiMessagePseudo2 if self.variant == "pseudo2" else EquiMessagePseudo
        )

        for i in range(self.num_conv):
            dS, dSbar, dV, dVbar = message_cls(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff, dtype=self.dtype,
            )(S, Sbar, V, Vbar, r_ij, g.cg_nbrs, g.cg_nbr_mask)
            S = S + dS
            Sbar = Sbar + dSbar
            V = V + dV
            Vbar = Vbar + dVbar

            dS, dV = UpdateBlock(
                feat_dim=self.feat_dim, activation=self.activation, dtype=self.dtype
            )(S, V)
            S = S + dS
            V = V + dV
        return S, V


class ENDecoder(nn.Module):
    """Plain EGNN decoder over the CG graph (cgvae.py:8-48; unused by the
    reference drivers but part of the surface)."""

    feat_dim: int
    n_rbf: int
    cutoff: float
    num_conv: int
    activation: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: FlatGraph, S: Array) -> Tuple[Array, Array]:
        H = S
        V = jnp.zeros((S.shape[0], 3, self.feat_dim), S.dtype)
        r_ij = _edge_vec(g.cg_xyz, g.cg_nbrs)
        for _ in range(self.num_conv):
            dH, dV = ENMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff, dtype=self.dtype,
            )(H, V, r_ij, g.cg_nbrs, g.cg_nbr_mask)
            H = H + dH
            V = V + dV
        return H, V


class InvariantDecoder(nn.Module):
    """Invariant-message decoder for the --invariantdec ablation
    (InvMessageBlock path, conv.py:132-163; selected via
    equivariant=False in the reference model, cgvae.py:424-425)."""

    feat_dim: int
    n_rbf: int
    cutoff: float
    num_conv: int
    activation: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: FlatGraph, S: Array) -> Tuple[Array, Array]:
        H = S
        V = jnp.zeros((S.shape[0], 3, self.feat_dim), S.dtype)
        r_ij = _edge_vec(g.cg_xyz, g.cg_nbrs)
        for _ in range(self.num_conv):
            dH, V = InvMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff, dtype=self.dtype,
            )(H, V, r_ij, g.cg_nbrs, g.cg_nbr_mask)
            H = H + dH
            dH, dV = UpdateBlock(
                feat_dim=self.feat_dim, activation=self.activation, dtype=self.dtype
            )(H, V)
            H = H + dH
            V = V + dV
        return H, V


def lift_channels(
    cg_v: Array, g: FlatGraph, offset: bool = True
) -> Array:
    """Per-bead vector channel -> per-atom displacement + COM constraint +
    bead anchor (cgvae.py:462-484).

    cg_v: (BM, 3, F); atom i reads channel `channel_idx[i]` of its bead.
    """
    per_atom = jnp.take(cg_v, g.mapping, axis=0)           # (BN, 3, F)
    ch = g.channel_idx[:, None, None]                      # (BN, 1, 1)
    xyz_rel = jnp.take_along_axis(per_atom, ch, axis=2)[:, :, 0]  # (BN, 3)

    if offset:
        # geometric-mean constraint: each bead stays the mean of its atoms
        offsets = segment_mean(xyz_rel, g.mapping, g.num_cg, g.atom_mask)
        xyz_rel = xyz_rel - jnp.take(offsets, g.mapping, axis=0)

    return xyz_rel + jnp.take(g.cg_xyz, g.mapping, axis=0)


class CGequiVAE(nn.Module):
    """The full VAE (cgvae.py:406-513): encode -> prior -> mu/sigma heads ->
    reparametrize -> equivariant decode -> channel lift."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.encoder = EquiEncoder(
            n_conv=c.enc_nconv, feat_dim=c.n_basis, n_rbf=c.n_rbf,
            activation=c.activation, cutoff=c.cg_cutoff,
            contract_cutoff=c.contract_cutoff, degree_norm=c.degree_norm,
            dtype=dtype,
        )
        self.prior_net = CGprior(
            n_conv=c.enc_nconv, feat_dim=c.n_basis, n_rbf=c.n_rbf,
            activation=c.activation, cutoff=c.cg_cutoff,
            degree_norm=c.degree_norm, vocab=max(100, c.n_cgs), dtype=dtype,
        )
        if c.dec_type in ("pseudo", "pseudo2"):
            self.dec = EquivariantPseudoDecoder(
                feat_dim=c.n_basis, n_rbf=c.n_rbf, cutoff=c.atom_cutoff,
                num_conv=c.dec_nconv, activation=c.activation,
                breaksym=c.breaksym, variant=c.dec_type, dtype=dtype,
            )
        elif c.dec_type in ("cross", "painn"):
            self.dec = EquivariantDecoder(
                feat_dim=c.n_basis, n_rbf=c.n_rbf, cutoff=c.atom_cutoff,
                num_conv=c.dec_nconv, activation=c.activation,
                cross=(c.dec_type == "cross"), degree_norm=c.degree_norm,
                dtype=dtype,
            )
        elif c.dec_type == "en":
            self.dec = ENDecoder(
                feat_dim=c.n_basis, n_rbf=c.n_rbf, cutoff=c.atom_cutoff,
                num_conv=c.dec_nconv, activation=c.activation, dtype=dtype,
            )
        elif c.dec_type == "inv":
            self.dec = InvariantDecoder(
                feat_dim=c.n_basis, n_rbf=c.n_rbf, cutoff=c.atom_cutoff,
                num_conv=c.dec_nconv, activation=c.activation, dtype=dtype,
            )
        else:
            raise ValueError(f"unknown dec_type {c.dec_type!r}")

        # mu/sigma heads: Linear-ReLU-Linear (run_ala.py:184-185)
        self.atom_munet = MLP([c.n_basis, c.n_basis], activation="ReLU", dtype=dtype)
        self.atom_sigmanet = MLP([c.n_basis, c.n_basis], activation="ReLU", dtype=dtype)
        if not c.equivariant:
            self.euclidean = Dense(3 * c.n_basis, dtype=dtype)

    def decode(self, g: FlatGraph, S_I: Array) -> Array:
        cg_s, cg_v = self.dec(g, S_I)
        if not self.cfg.equivariant:
            # non-equivariant "euclidean" head (cgvae.py:469-471)
            dv = self.euclidean(cg_s).reshape(cg_s.shape[0], self.cfg.n_basis, 3)
            cg_v = jnp.swapaxes(dv, 1, 2)  # -> (BM, 3, F)
        xyz_recon = lift_channels(cg_v, g, offset=self.cfg.offset)
        if self.cfg.h_project:
            xyz_recon = project_h_bonds(
                xyz_recon, g.z, g.xyz, g.bonds, g.bond_mask
            )
        return xyz_recon

    def prior(self, g: FlatGraph) -> Tuple[Array, Array]:
        return self.prior_net(g)

    def __call__(self, batch: CGBatch) -> VAEOutput:
        g = flatten_batch(batch)
        S_I, _ = self.encoder(g)
        prior_mu, prior_sigma = self.prior_net(g)

        mu = self.atom_munet(S_I)
        logvar = self.atom_sigmanet(S_I)
        logvar = jnp.clip(logvar, -30.0, 30.0)
        sigma = 1e-12 + jnp.exp(logvar / 2.0)

        if not self.cfg.det:
            eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
            z = mu + sigma * eps
        else:
            z = S_I

        xyz_recon = self.decode(g, z)
        return VAEOutput(
            mu=mu, sigma=sigma, prior_mu=prior_mu, prior_sigma=prior_sigma,
            xyz=g.xyz, xyz_recon=xyz_recon,
        )

    def generate(self, batch: CGBatch) -> Array:
        """Prior-conditioned generation (sampling.py:252-311): draw z from
        the CG prior and decode. Needs the 'sample' RNG."""
        g = flatten_batch(batch)
        prior_mu, prior_sigma = self.prior_net(g)
        eps = jax.random.normal(self.make_rng("sample"), prior_mu.shape, prior_mu.dtype)
        return self.decode(g, prior_mu + prior_sigma * eps)


class PCN(nn.Module):
    """Protein Completion Network (cgvae.py:516-594): residue-type embedding
    -> equivariant decode over the C-alpha graph -> channel lift with
    C-alpha re-centering (the atom whose channel_idx marks the bead anchor
    is pinned to its bead)."""

    cfg: ModelConfig
    ca_recenter: bool = True

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.embedding = EmbeddingZeroPad(100, c.n_basis)
        # the reference PCN fixes the cross decoder (cgvae.py:516-534);
        # dec_type stays selectable here so pseudo-vs-cross can be measured
        # at protein scale (same (g, S) -> (H, V) interface)
        if c.dec_type in ("pseudo", "pseudo2"):
            self.dec = EquivariantPseudoDecoder(
                feat_dim=c.n_basis, n_rbf=c.n_rbf, cutoff=c.atom_cutoff,
                num_conv=c.dec_nconv, activation=c.activation,
                breaksym=c.breaksym, variant=c.dec_type, dtype=dtype,
            )
        else:
            self.dec = EquivariantDecoder(
                feat_dim=c.n_basis, n_rbf=c.n_rbf, cutoff=c.atom_cutoff,
                num_conv=c.dec_nconv, activation=c.activation,
                cross=(c.dec_type != "painn"), dtype=dtype,
            )

    def _decode(self, g: FlatGraph, S_I: Array, ca_mask: Optional[Array]) -> Array:
        cg_s, cg_v = self.dec(g, S_I)

        per_atom = jnp.take(cg_v, g.mapping, axis=0)
        ch = g.channel_idx[:, None, None]
        xyz_rel = jnp.take_along_axis(per_atom, ch, axis=2)[:, :, 0]

        if self.ca_recenter and ca_mask is not None:
            cam = ca_mask.reshape(-1).astype(xyz_rel.dtype)[:, None]
            # subtract each residue's C-alpha displacement at the C-alpha only
            xyz_rel = xyz_rel - xyz_rel * cam

        return xyz_rel + jnp.take(g.cg_xyz, g.mapping, axis=0)

    def __call__(self, batch: CGBatch, ca_mask: Optional[Array] = None) -> VAEOutput:
        """ca_mask: (B, N) marks the C-alpha atom of each residue (the
        reference recenters via explicit ca_idx, cgvae.py:569-574)."""
        g = flatten_batch(batch)
        xyz_recon = self._decode(g, self.embedding(g.cg_z), ca_mask)
        return VAEOutput(
            mu=None, sigma=None, prior_mu=None, prior_sigma=None,
            xyz=g.xyz, xyz_recon=xyz_recon,
        )


class StochasticPCN(PCN):
    """CVAE variant of PCN (opt-in via `run_pcn --stochastic`; no
    reference analogue -- the reference PCN at cgvae.py:516-594 is
    deterministic).

    A deterministic PCN regresses sidechain coordinates to the
    conditional MEAN of the rotamer distribution given the C-alpha
    trace, which floors RMSD on rotamer-multimodal ensembles (DESIGN.md
    roadmap). This adds a per-residue latent: an encoder that sees the
    TRUE all-atom geometry -> q(z|x) (atoms pooled into their residue
    via ContractiveMessageBlock on r_iI offsets, then PaiNN layers over
    the C-alpha graph), a C-alpha-conditioned prior p(z|CG) (the CGprior
    pattern, embedding residue types), and the SAME PCN decoder
    conditioned on [residue embedding + Dense(z)]. The latent is
    invariant, so equivariance of the decode path is preserved exactly.
    `generate` draws prior samples; best-of-K scoring at eval separates
    rotamer multi-modality from model error.
    """

    def setup(self):
        super().setup()
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.atom_embedding = EmbeddingZeroPad(100, c.n_basis)
        self.enc_contract = ContractiveMessageBlock(
            feat_dim=c.n_basis, activation=c.activation, n_rbf=c.n_rbf,
            cutoff=c.contract_cutoff, dtype=dtype,
        )
        self.enc_msgs = [
            EquiMessageBlock(
                feat_dim=c.n_basis, activation=c.activation, n_rbf=c.n_rbf,
                cutoff=c.atom_cutoff, dtype=dtype,
            )
            for _ in range(max(c.enc_nconv, 1))
        ]
        self.enc_upds = [
            UpdateBlock(feat_dim=c.n_basis, activation=c.activation, dtype=dtype)
            for _ in range(max(c.enc_nconv, 1) + 1)
        ]
        self.munet = MLP([c.n_basis, c.n_basis], activation="ReLU", dtype=dtype)
        self.sigmanet = MLP([c.n_basis, c.n_basis], activation="ReLU", dtype=dtype)
        self.latent_mix = Dense(c.n_basis, dtype=dtype)
        self.prior_net = CGprior(
            n_conv=max(c.enc_nconv, 1), feat_dim=c.n_basis, n_rbf=c.n_rbf,
            activation=c.activation, cutoff=c.atom_cutoff, dtype=dtype,
        )

    def encode(self, g: FlatGraph) -> Tuple[Array, Array]:
        h = self.atom_embedding(g.z)
        v = jnp.zeros((g.num_nodes, 3, h.shape[-1]), h.dtype)
        r_iI = g.xyz - jnp.take(g.cg_xyz, g.mapping, axis=0)

        # atoms -> their residue (one segment-sum; the offsets r_iI carry
        # the full rotamer geometry relative to the pinned C-alpha)
        H = segment_mean(h, g.mapping, g.num_cg, g.atom_mask)
        dH, V = self.enc_contract(h, v, r_iI, g.mapping, g.num_cg, g.atom_mask)
        H = H + dH
        # PaiNN update turns the pooled direction channels into scalar
        # invariants (inner products) -- this is what distinguishes
        # rotamers whose atom-distance sets coincide
        dH, dV = self.enc_upds[0](H, V)
        H, V = H + dH, V + dV

        r_IJ = _edge_vec(g.cg_xyz, g.cg_nbrs)
        for msg, upd in zip(self.enc_msgs, self.enc_upds[1:]):
            dH, dV = msg(H, V, r_IJ, g.cg_nbrs, g.cg_nbr_mask)
            H, V = H + dH, V + dV
            dH, dV = upd(H, V)
            H, V = H + dH, V + dV

        mu = self.munet(H)
        logvar = jnp.clip(self.sigmanet(H), -30.0, 30.0)
        sigma = 1e-12 + jnp.exp(logvar / 2.0)
        return mu, sigma

    def _condition(self, g: FlatGraph, z: Array) -> Array:
        return self.embedding(g.cg_z) + self.latent_mix(z)

    def __call__(self, batch: CGBatch, ca_mask: Optional[Array] = None) -> VAEOutput:
        g = flatten_batch(batch)
        mu, sigma = self.encode(g)
        prior_mu, prior_sigma = self.prior_net(g)
        eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
        z = mu + sigma * eps
        xyz_recon = self._decode(g, self._condition(g, z), ca_mask)
        return VAEOutput(
            mu=mu, sigma=sigma, prior_mu=prior_mu, prior_sigma=prior_sigma,
            xyz=g.xyz, xyz_recon=xyz_recon,
        )

    def reconstruct_mean(self, batch: CGBatch, ca_mask: Optional[Array] = None) -> Array:
        """Posterior-mean reconstruction (z = mu; no RNG needed)."""
        g = flatten_batch(batch)
        mu, _ = self.encode(g)
        return self._decode(g, self._condition(g, mu), ca_mask)

    def generate(self, batch: CGBatch, ca_mask: Optional[Array] = None) -> Array:
        """Prior-conditioned generation from the C-alpha trace alone
        (the PCN analogue of CGequiVAE.generate). Needs the 'sample' RNG."""
        g = flatten_batch(batch)
        prior_mu, prior_sigma = self.prior_net(g)
        eps = jax.random.normal(
            self.make_rng("sample"), prior_mu.shape, prior_mu.dtype
        )
        z = prior_mu + prior_sigma * eps
        return self._decode(g, self._condition(g, z), ca_mask)


def build_cgequivae(cfg: ModelConfig) -> CGequiVAE:
    return CGequiVAE(cfg=cfg)


def build_flagship_model(cfg: ModelConfig, force_sparse: bool = False):
    """The ONE place that decides sparse (segment-sum CGequiVAE) vs the
    dense-regime DenseCGVAE flagship — used by the training driver AND by
    checkpoint reloading (cli/postanalysis.py), which must reconstruct the
    exact param tree the run trained. pseudo2/en/inv decoders exist only
    in the sparse formulation."""
    if force_sparse or cfg.sparse or cfg.dec_type in ("pseudo2", "en", "inv"):
        return CGequiVAE(cfg=cfg)
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE

    return DenseCGVAE(cfg=cfg)
