"""Dense (padded-batch) equivariant message passing.

TPU-native counterpart of the reference's dense model zoo
(conv.py:405-484 DenseEquiMessageBlock; diffpoolvae.py:198-513 DenseContract /
DenseEquiEncoder / DenseCGPrior / DenseEquivariantDecoder in /root/reference).

Everything here operates on padded ``(B, N, ...)`` tensors with a dense
``(B, N, N)`` weighted adjacency -- no edge lists, no gathers, no
``.nonzero()``: aggregation is pure einsum contractions over the neighbor
axis, which XLA tiles straight onto the MXU. This is the natural regime for
the DiffPool family, whose CG graph is soft/complete (diffpoolvae.py:187) and
whose systems are small enough that (B, N, N, F) message tensors fit in VMEM
pipeline tiles.

Layout: scalars ``(B, N, F)``, vectors ``(B, N, 3, F)`` (features in lanes).

A key algebraic rewrite vs the reference: per-pair cross-product terms
``sum_j w_ij (v_i x v_j)`` are factored as ``v_i x (sum_j w_ij v_j)`` --
the cross product is bilinear, so it commutes with the weighted sum over
senders. This turns an (B,N,N,3,F) intermediate into two (B,N,3,F) ones.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from coarsegrainingvae_tpu.models.conv import UpdateBlock, cross3
from coarsegrainingvae_tpu.models.modules import Dense, DistanceEmbed
from coarsegrainingvae_tpu.ops.activations import get_activation

Array = jnp.ndarray

EPS = 1e-3  # the dense family's epsilon (diffpoolvae.py:6)


def dense_pairwise(xyz: Array) -> Tuple[Array, Array, Array]:
    """All-pairs displacement geometry for one padded batch.

    xyz (B, N, 3) -> (r_ij, dist, unit) with
      r_ij[b, i, j] = xyz[b, j] - xyz[b, i]   (sender minus receiver,
                                               matching the sparse convention)
      dist = sqrt(|r|^2 + EPS)  (diffpoolvae.py:190)
    The diagonal gets dist = sqrt(EPS), unit ~ 0.
    """
    r_ij = xyz[:, None, :, :] - xyz[:, :, None, :]
    dist = jnp.sqrt(jnp.sum(r_ij**2, axis=-1) + EPS)
    unit = r_ij / dist[..., None]
    return r_ij, dist, unit


def radius_adjacency(dist: Array, cutoff: float, mask: Optional[Array] = None) -> Array:
    """(B, N, N) 0/1 adjacency: within cutoff, no self edges, padding excluded."""
    n = dist.shape[-1]
    adj = (dist < cutoff).astype(dist.dtype)
    eye = jnp.eye(n, dtype=dist.dtype)
    adj = adj * (1.0 - eye)
    if mask is not None:
        m = mask.astype(dist.dtype)
        adj = adj * m[:, :, None] * m[:, None, :]
    return adj


def degree_norm_adjacency(adj: Array) -> Array:
    """Symmetric deg^-1/2 A deg^-1/2 edge weighting (the reference weights
    each CG edge by deg_i^-1/2 * deg_j^-1/2, diffpoolvae.py:390-410)."""
    deg = jnp.sum(adj, axis=-1)
    dinv = jax_rsqrt_safe(deg)
    return adj * dinv[:, :, None] * dinv[:, None, :]


def jax_rsqrt_safe(x: Array) -> Array:
    return jnp.where(x > 0, 1.0 / jnp.sqrt(jnp.maximum(x, EPS)), 0.0)


class DenseInvariantMessage(nn.Module):
    """Per-pair invariant filter: phi(s_j) x RBF(dist_ij) -> (B, N, N, out).

    Dense analogue of InvariantMessage (conv.py:31-75): the per-node MLP runs
    once on (B, N, F); broadcasting against the (B, N, N, out) distance
    filter replaces the per-edge gather.
    """

    feat_dim: int
    out_feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s: Array, dist: Array) -> Array:
        phi = Dense(self.feat_dim, activation=self.activation, dtype=self.dtype)(s)
        phi = Dense(self.out_feat_dim, dtype=self.dtype)(phi)
        w_s = DistanceEmbed(
            n_rbf=self.n_rbf, cutoff=self.cutoff, feat_dim=self.out_feat_dim,
            dtype=self.dtype,
        )(dist)                                   # (B, N, N, out)
        return phi[:, None, :, :] * w_s           # sender j broadcast over i


class DenseEquiMessageBlock(nn.Module):
    """PaiNN message over a dense weighted adjacency (conv.py:405-484 /
    sparse EquiMessageBlock conv.py:487-563).

    adj (B, N, N) carries both connectivity and edge weights; aggregation is
    einsum over the sender axis j.
    """

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    cross: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        s: Array,      # (B, N, F)
        v: Array,      # (B, N, 3, F)
        dist: Array,   # (B, N, N)
        unit: Array,   # (B, N, N, 3)
        adj: Array,    # (B, N, N) weighted adjacency
    ) -> Tuple[Array, Array]:
        n_split = 4 if self.cross else 3
        inv = DenseInvariantMessage(
            feat_dim=self.feat_dim, out_feat_dim=n_split * self.feat_dim,
            activation=self.activation, n_rbf=self.n_rbf, cutoff=self.cutoff,
            dtype=self.dtype,
        )(s, dist)
        inv = inv.reshape(inv.shape[:3] + (n_split, self.feat_dim))
        # fold edge weights in once
        inv = inv * adj[..., None, None]
        a, b, c = inv[..., 0, :], inv[..., 1, :], inv[..., 2, :]

        ds = jnp.sum(b, axis=2)                                   # (B, N, F)
        dv = (
            jnp.einsum("bijf,bijd->bidf", c, unit)
            + jnp.einsum("bijf,bjdf->bidf", a, v)
        )
        if self.cross:
            s3 = inv[..., 3, :]
            # sum_j s3_ij (v_i x v_j) = v_i x (sum_j s3_ij v_j)
            w = jnp.einsum("bijf,bjdf->bidf", s3, v)
            bn = v.shape[0] * v.shape[1]
            dv = dv + cross3(
                v.reshape(bn, 3, self.feat_dim), w.reshape(bn, 3, self.feat_dim)
            ).reshape(v.shape)
        return ds, dv


class DenseUpdateBlock(nn.Module):
    """UpdateBlock applied over a padded batch: per-node op, so just a
    (B*N, ...) reshape around the sparse block (conv.py:566-616)."""

    feat_dim: int
    activation: str
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, s: Array, v: Array) -> Tuple[Array, Array]:
        b, n, f = s.shape
        ds, dv = UpdateBlock(
            feat_dim=self.feat_dim, activation=self.activation, dtype=self.dtype
        )(s.reshape(b * n, f), v.reshape(b * n, 3, f))
        return ds.reshape(b, n, f), dv.reshape(b, n, 3, f)


class DenseContract(nn.Module):
    """Soft atom->bead contraction (diffpoolvae.py:198-266).

    Per (bead I, atom i) pair: Gaussian-offset distance filter x phi(h_i),
    3-way split -> (dv, ds), aggregated with the soft assignment M.
    The reference's offset basis is ``linspace(0, cutoff, feat_dim)`` with
    unit width (diffpoolvae.py:224,247) -- kept.
    """

    feat_dim: int
    activation: str
    cutoff: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        assign: Array,   # (B, N, K) soft assignment M
        h: Array,        # (B, N, F)
        v: Array,        # (B, N, 3, F)
        cg_xyz: Array,   # (B, K, 3)
        xyz: Array,      # (B, N, 3)
    ) -> Tuple[Array, Array]:
        r_iI = xyz[:, None, :, :] - cg_xyz[:, :, None, :]          # (B, K, N, 3)
        d_iI = jnp.sqrt(jnp.sum(r_iI**2, axis=-1) + EPS)           # (B, K, N)
        unit = r_iI / d_iI[..., None]

        offsets = jnp.linspace(0.0, self.cutoff, self.feat_dim).astype(self.dtype)
        expanded = jnp.exp(-((d_iI[..., None] - offsets) ** 2))    # (B, K, N, F)
        w_s = Dense(3 * self.feat_dim, dtype=self.dtype)(expanded)

        phi = Dense(self.feat_dim, activation=self.activation, dtype=self.dtype)(h)
        phi = Dense(3 * self.feat_dim, dtype=self.dtype)(phi)      # (B, N, 3F)

        filt = w_s * phi[:, None, :, :]
        filt = filt.reshape(filt.shape[:3] + (3, self.feat_dim))
        s0, s1, s2 = filt[..., 0, :], filt[..., 1, :], filt[..., 2, :]

        m_t = jnp.swapaxes(assign, 1, 2)                           # (B, K, N)
        s0 = s0 * m_t[..., None]
        s2 = s2 * m_t[..., None]
        dV = (
            jnp.einsum("bkif,bkid->bkdf", s2, unit)
            + jnp.einsum("bkif,bidf->bkdf", s0, v)
        )
        dH = jnp.einsum("bkif,bki->bkf", s1, m_t)
        return dH, dV


class DenseEquiEncoder(nn.Module):
    """Padded-batch atom encoder with per-layer soft contraction
    (diffpoolvae.py:269-353). The reference flattens to stacked nodes and
    uses sparse convs over host-padded edge lists; here the atom graph is a
    dense in-model radius adjacency -- no host neighbor lists at all.
    Residuals are 0.5-scaled as in the reference (diffpoolvae.py:337-343).
    """

    n_conv: int
    feat_dim: int
    n_rbf: int
    activation: str
    cutoff: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        h: Array,        # (B, N, F) pooler atom features
        H: Array,        # (B, K, F) initial bead features (H_chem)
        xyz: Array,      # (B, N, 3)
        cg_xyz: Array,   # (B, K, 3)
        assign: Array,   # (B, N, K)
        atom_mask: Optional[Array] = None,
    ) -> Tuple[Array, Array]:
        _, dist, unit = dense_pairwise(xyz)
        adj = radius_adjacency(dist, self.cutoff, atom_mask)
        v = jnp.zeros(h.shape[:2] + (3, h.shape[-1]), h.dtype)
        V = jnp.zeros(H.shape[:2] + (3, H.shape[-1]), H.dtype)

        for _ in range(self.n_conv):
            ds, dv = DenseEquiMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff, dtype=self.dtype,
            )(h, v, dist, unit, adj)
            h = h + 0.5 * ds
            v = v + 0.5 * dv

            ds, dv = DenseUpdateBlock(
                feat_dim=self.feat_dim, activation=self.activation, dtype=self.dtype
            )(h, v)
            h = h + 0.5 * ds
            v = v + 0.5 * dv

            dH, dV = DenseContract(
                feat_dim=self.feat_dim, activation=self.activation,
                cutoff=self.cutoff, dtype=self.dtype,
            )(assign, h, v, cg_xyz, xyz)
            H = H + dH
            V = V + dV
        return H, V


class DenseCGPrior(nn.Module):
    """Prior over the dense CG graph with degree-normalized edge weights
    (diffpoolvae.py:356-429)."""

    n_conv: int
    feat_dim: int
    n_rbf: int
    activation: str
    cutoff: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, H: Array, cg_adj: Array, cg_xyz: Array) -> Tuple[Array, Array]:
        _, dist, unit = dense_pairwise(cg_xyz)
        adj = degree_norm_adjacency(cg_adj)
        V = jnp.zeros(H.shape[:2] + (3, H.shape[-1]), H.dtype)

        for _ in range(self.n_conv):
            dH, dV = DenseEquiMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff, dtype=self.dtype,
            )(H, V, dist, unit, adj)
            H = H + dH
            V = V + dV
            dH, dV = DenseUpdateBlock(
                feat_dim=self.feat_dim, activation=self.activation, dtype=self.dtype
            )(H, V)
            H = H + dH
            V = V + dV

        mu = Dense(self.feat_dim, activation="Tanh", dtype=self.dtype)(H)
        mu = Dense(self.feat_dim, dtype=self.dtype)(mu)
        logvar = Dense(self.feat_dim, activation="Tanh", dtype=self.dtype)(H)
        logvar = Dense(self.feat_dim, dtype=self.dtype)(logvar)
        logvar = jnp.clip(logvar, -30.0, 30.0)
        sigma = 1e-9 + jnp.exp(logvar / 2.0)
        return mu, sigma


class DenseEquivariantDecoder(nn.Module):
    """CG-graph decoder + learned channel pooler (diffpoolvae.py:432-513):
    conv stack on the weighted CG graph, then a trainable (n_atoms, F)
    matrix maps each bead's F vector channels to per-atom displacement
    candidates: V_dec[b, I, n] = sum_f V[b, I, :, f] pooler[n, f]."""

    n_atoms: int
    feat_dim: int
    n_rbf: int
    activation: str
    cutoff: float
    n_conv: int
    cross: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, H: Array, cg_adj: Array, cg_xyz: Array) -> Tuple[Array, Array]:
        _, dist, unit = dense_pairwise(cg_xyz)
        adj = degree_norm_adjacency(cg_adj)
        V = jnp.zeros(H.shape[:2] + (3, H.shape[-1]), H.dtype)

        for _ in range(self.n_conv):
            dH, dV = DenseEquiMessageBlock(
                feat_dim=self.feat_dim, activation=self.activation,
                n_rbf=self.n_rbf, cutoff=self.cutoff, cross=self.cross,
                dtype=self.dtype,
            )(H, V, dist, unit, adj)
            H = H + dH
            V = V + dV
            dH, dV = DenseUpdateBlock(
                feat_dim=self.feat_dim, activation=self.activation, dtype=self.dtype
            )(H, V)
            H = H + dH
            V = V + dV

        pooler = self.param(
            "channel_pooler", nn.initializers.normal(1.0),
            (self.n_atoms, self.feat_dim), self.dtype,
        )
        v_dec = jnp.einsum("bkdf,nf->bknd", V, pooler)   # (B, K, N, 3)
        return H, v_dec


class DenseFactoredEquiMessage(nn.Module):
    """RBF-factored PaiNN message: mathematically identical to
    DenseEquiMessageBlock but never materializes a per-pair (B, N, N, 3F)
    filter tensor.

    The distance filter is linear in the radial basis:
        w_o(d_ij) = env_ij * (sum_r rbf_r(d_ij) W[r, o] + bias_o),
    so every aggregated term reorders into per-basis contractions
        G[b,i,r,f] = sum_j K[b,i,j,r] X[b,j,f],
    with K = adj * env * rbf  (B, N, N, R+1; last channel = bias) -- a stack
    of (N, N) @ (N, F) matmuls that tile straight onto the MXU -- followed by
    a cheap fold over r with the filter weights. Cross products factor to
    per-node form via bilinearity (see module docstring).

    Biggest intermediate: (B, N, R+1, 3, F) instead of (B, N, N, 3F); for
    the dipeptide bench shape that is 54 MB vs 168 MB, and the pair axis
    never touches HBM.

    impl:
      "einsum" -- one per-basis contraction einsum per channel (the original
        formulation above).
      "qmat"   -- the per-basis contractions of ALL sender-payload channels
        merge into ONE batched matmul over a flattened q = (sender j,
        basis r) axis of size N*(R+1): lhs K (B, N, q), rhs the channel-
        stacked payload*filter products (B, q, C*F). The unit channel keeps
        its own (B, 3N, q) @ (B, q, F) matmul (its geometry factor lives on
        the receiver side). Same math, same params; contraction dim grows
        from N to N*(R+1) and the (B, N, R+1, 3, F) intermediates vanish --
        two MXU-friendly matmuls instead of eight thin ones.
      "pallas" -- the whole pair pipeline (geometry, RBF, envelope,
        adjacency, per-basis contractions) as ONE fused Pallas TPU kernel
        with a hand-derived Pallas backward (ops/pallas_message.py).
        Requires xyz/node_mask args and IGNORES dist/unit/adj, recomputing
        them in VMEM with the same eps/cutoff/mask recipe -- callers must
        pass the plain radius adjacency of (xyz, node_mask, self.cutoff)
        (DenseCGVAE does, at every call site). Same params as
        einsum/qmat; parity pinned by tests/test_pallas_message.py.
    """

    feat_dim: int
    activation: str
    n_rbf: int
    cutoff: float
    cross: bool = False
    dtype: jnp.dtype = jnp.float32
    impl: str = "einsum"

    @nn.compact
    def __call__(
        self,
        s: Array,      # (B, N, F)
        v: Array,      # (B, N, 3, F)
        dist: Array,   # (B, N, N)
        unit: Array,   # (B, N, N, 3)
        adj: Array,    # (B, N, N)
        xyz: Array = None, node_mask: Array = None,
    ) -> Tuple[Array, Array]:
        from coarsegrainingvae_tpu.ops.basis import cosine_envelope, painn_radial_basis

        f = self.feat_dim
        n_split = 4 if self.cross else 3
        r_aug = self.n_rbf + 1

        phi = Dense(f, activation=self.activation, dtype=self.dtype)(s)
        phi = Dense(n_split * f, dtype=self.dtype)(phi)
        phi = phi.reshape(phi.shape[:2] + (n_split, f))       # (B, N, S, F)

        # init matches the naive path's Xavier Dense over (R -> n_split*F)
        # (modules.Dense); the bias channel (last row) starts at zero
        def _filter_init(key, shape, dtype):
            limit = jnp.sqrt(6.0 / (self.n_rbf + n_split * f))
            w0 = jax.random.uniform(key, (self.n_rbf, n_split, f), dtype,
                                    -limit, limit)
            return jnp.concatenate(
                [w0, jnp.zeros((1, n_split, f), dtype)], axis=0
            )

        w = self.param("filter_w", _filter_init, (r_aug, n_split, f), self.dtype)

        if self.impl == "pallas":
            from coarsegrainingvae_tpu.ops.pallas_message import fused_message

            assert xyz is not None and node_mask is not None, (
                "message_impl='pallas' needs node coordinates and mask"
            )
            interpret = jax.devices()[0].platform != "tpu"
            return fused_message(
                xyz.astype(jnp.float32), node_mask.astype(jnp.float32),
                phi.astype(jnp.float32), v.astype(jnp.float32),
                w.astype(jnp.float32), self.cutoff, self.n_rbf,
                8, interpret,
            )

        rbf = painn_radial_basis(dist, self.n_rbf, self.cutoff)      # (B,N,N,R)
        rbf = jnp.concatenate([rbf, jnp.ones_like(rbf[..., :1])], -1)
        env = cosine_envelope(dist, self.cutoff)
        k = adj[..., None] * env[..., None] * rbf                    # (B,N,N,R+1)

        if self.impl == "qmat":
            return _qmat_message(k, unit, phi, v, w, f, r_aug, self.cross)

        # --- scalar channel (split 1): ds_i = fold_r G(phi_b)
        g_b = jnp.einsum("bijr,bjf->birf", k, phi[:, :, 1])
        ds = jnp.einsum("birf,rf->bif", g_b, w[:, 1])

        # --- unit-vector channel (split 2): per-receiver filter x unit
        ku = jnp.einsum("bijr,bijd->bijrd", k, unit)
        g_c = jnp.einsum("bijrd,bjf->birdf", ku, phi[:, :, 2])
        dv = jnp.einsum("birdf,rf->bidf", g_c, w[:, 2])

        # --- sender-vector channel (split 0): payload phi_a * v_j
        p_a = phi[:, :, 0][:, :, None, :] * v                        # (B,N,3,F)
        g_a = jnp.einsum("bijr,bjdf->birdf", k, p_a)
        dv = dv + jnp.einsum("birdf,rf->bidf", g_a, w[:, 0])

        if self.cross:
            # split 3: sum_j w3_ij (v_i x v_j) = v_i x sum_j w3_ij v_j
            p_3 = phi[:, :, 3][:, :, None, :] * v
            g_3 = jnp.einsum("bijr,bjdf->birdf", k, p_3)
            w3 = jnp.einsum("birdf,rf->bidf", g_3, w[:, 3])
            bn = v.shape[0] * v.shape[1]
            dv = dv + cross3(
                v.reshape(bn, 3, f), w3.reshape(bn, 3, f)
            ).reshape(v.shape)
        return ds, dv


def _qmat_message(
    k: Array,      # (B, N, N, R+1) adj*env*rbf kernel
    unit: Array,   # (B, N, N, 3)
    phi: Array,    # (B, N, S, F) pre-split per-node features
    v: Array,      # (B, N, 3, F)
    w: Array,      # (R+1, S, F) filter weights
    f: int,
    r_aug: int,
    cross: bool,
) -> Tuple[Array, Array]:
    """Flattened-q formulation of the factored message (see
    DenseFactoredEquiMessage docstring). q = (j, r) j-major everywhere."""
    b, n = phi.shape[:2]
    kq = k.reshape(b, n, n * r_aug)                          # (B, N, q)

    def pblock(payload: Array, ch: int) -> Array:
        # payload (B, N, F) x w[:, ch] (R+1, F) -> (B, q, F)
        return (payload[:, :, None, :] * w[None, None, :, ch, :]).reshape(
            b, n * r_aug, f
        )

    cols = [pblock(phi[:, :, 1], 1)]                         # scalar channel
    p_a = phi[:, :, 0][:, :, None, :] * v                    # (B, N, 3, F)
    cols += [pblock(p_a[:, :, d], 0) for d in range(3)]      # sender-vector
    if cross:
        p_3 = phi[:, :, 3][:, :, None, :] * v
        cols += [pblock(p_3[:, :, d], 3) for d in range(3)]
    rhs = jnp.concatenate(cols, axis=-1)                     # (B, q, C*F)
    out = jnp.einsum("biq,bqg->big", kq, rhs)                # ONE batched matmul

    ds = out[..., :f]
    dv = out[..., f:4 * f].reshape(b, n, 3, f)
    if cross:
        w3 = out[..., 4 * f:7 * f].reshape(b, n, 3, f)
        bn = b * n
        dv = dv + cross3(
            v.reshape(bn, 3, f), w3.reshape(bn, 3, f)
        ).reshape(v.shape)

    # unit channel: receiver-side geometry factor -> own lhs (B, 3N, q)
    lhs = (k[..., None] * unit[..., None, :])                # (B,N,N,R+1,3)
    lhs = lhs.transpose(0, 1, 4, 2, 3).reshape(b, n * 3, n * r_aug)
    dv_c = jnp.einsum("bpq,bqf->bpf", lhs, pblock(phi[:, :, 2], 2))
    return ds, dv + dv_c.reshape(b, n, 3, f)
