"""DiffPoolVAE: learned soft coarse-graining + dense VAE
(diffpoolvae.py:8-195 in /root/reference).

The pooler learns the CG mapping end-to-end: a small bond-graph conv stack
produces per-atom assignment logits, sampled with gumbel-softmax at an
annealed temperature. The VAE around it runs entirely in the padded dense
regime (see models/dense.py) -- already the shape regime XLA wants, so the
whole forward is a fixed-shape einsum pipeline with no gathers.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from coarsegrainingvae_tpu.config import DiffPoolConfig
from coarsegrainingvae_tpu.models.cgae import gumbel_softmax
from coarsegrainingvae_tpu.models.dense import (
    DenseCGPrior,
    DenseEquiEncoder,
    DenseEquivariantDecoder,
)
from coarsegrainingvae_tpu.models.modules import Dense, EmbeddingZeroPad, MLP

Array = jnp.ndarray


@struct.dataclass
class PoolOutput:
    """Everything the pooler derives from one batch (diffpoolvae.py:195)."""

    assign: Array       # (B, N, K) soft assignment M
    assign_norm: Array  # (B, N, K) column-normalized M
    h: Array            # (B, N, F) atom features after bond convs
    H: Array            # (B, K, F) bead features = M_norm^T h
    adj: Array          # (B, N, N) bond adjacency
    cg_xyz: Array       # (B, K, 3) soft bead coordinates
    cg_adj: Array       # (B, K, K) complete CG graph minus diagonal


@struct.dataclass
class DiffPoolOutput:
    xyz: Array          # (B, N, 3) centered input coordinates
    xyz_recon: Array    # (B, N, 3)
    assign: Array       # (B, N, K)
    cg_xyz: Array       # (B, K, 3)
    mu: Array           # (B, K, F) posterior
    sigma: Array
    prior_mu: Array
    prior_sigma: Array


def bond_adjacency(bonds: Array, n_atoms: int) -> Array:
    """(Eb, 2) undirected bond list -> symmetric (N, N) 0/1 adjacency."""
    adj = jnp.zeros((n_atoms, n_atoms), jnp.float32)
    adj = adj.at[bonds[:, 0], bonds[:, 1]].set(1.0)
    adj = adj.at[bonds[:, 1], bonds[:, 0]].set(1.0)
    return adj


class CGpool(nn.Module):
    """Soft CG assignment network (diffpoolvae.py:105-195).

    Three modes, mirroring the reference:
      * ``assign_idx`` given -> fixed one-hot assignment (used by baselines)
      * ``trainable_map=True`` -> a trainable shared (N, K) logit matrix,
        gumbel-sampled per call (the mode the DiffPool driver uses,
        run_diffpool.py:362-366)
      * otherwise -> per-atom logits from the conv features
    """

    n_conv: int
    feat_dim: int
    n_atoms: int
    n_cgs: int
    assign_idx: Optional[tuple] = None   # static tuple of ints, len N
    trainable_map: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, z: Array, xyz: Array, adj: Array, tau: Array,
        hard: bool = False,
    ) -> PoolOutput:
        """hard=True commits to the deterministic argmax assignment (the
        noise-free tau->0 limit of the gumbel-softmax) -- generative
        sampling uses it so a near-tie logit cannot flip an atom to a
        distant bead between draws."""
        h = EmbeddingZeroPad(100, self.feat_dim)(z)

        # receiver-degree-normalized bond convs (diffpoolvae.py:158-169)
        deg = jnp.sum(adj, axis=-1, keepdims=True)
        for _ in range(self.n_conv):
            msg = MLP([self.feat_dim, self.feat_dim], activation="Tanh",
                      dtype=self.dtype)(h)
            dh = jnp.einsum("bif,bij->bjf", msg, adj) / jnp.maximum(deg, 1.0)
            h = h + dh

        if self.assign_idx is not None:
            idx = jnp.asarray(self.assign_idx, jnp.int32)
            m = jax.nn.one_hot(idx, self.n_cgs, dtype=h.dtype)
            m = jnp.broadcast_to(m, (h.shape[0],) + m.shape)
        elif self.trainable_map:
            logits = self.param(
                "assign_map", nn.initializers.normal(1.0),
                (self.n_atoms, self.n_cgs), self.dtype,
            )
            if hard:
                m = jax.nn.one_hot(jnp.argmax(logits, -1), self.n_cgs,
                                   dtype=h.dtype)
            else:
                m = gumbel_softmax(self.make_rng("gumbel"), logits, tau)
            m = jnp.broadcast_to(m, (h.shape[0],) + m.shape)
        else:
            logits = MLP([self.feat_dim, self.n_cgs], activation="Tanh",
                         dtype=self.dtype)(h)
            if hard:
                m = jax.nn.one_hot(jnp.argmax(logits, -1), self.n_cgs,
                                   dtype=h.dtype)
            else:
                m = gumbel_softmax(self.make_rng("gumbel"), logits, tau)

        m_norm = m / (jnp.sum(m, axis=1, keepdims=True) + 1e-8)
        H = jnp.einsum("bnk,bnf->bkf", m_norm, h)
        cg_xyz = jnp.einsum("bnd,bnk->bkd", xyz, m_norm)

        k = self.n_cgs
        cg_adj = jnp.ones((h.shape[0], k, k), h.dtype) - jnp.eye(k, dtype=h.dtype)
        return PoolOutput(
            assign=m, assign_norm=m_norm, h=h, H=H, adj=adj,
            cg_xyz=cg_xyz, cg_adj=cg_adj,
        )


def _lift(out_v: Array, pool: PoolOutput) -> Array:
    """Per-(bead, atom) displacement channels -> atom positions with soft
    COM re-centering (diffpoolvae.py:96-101)."""
    dx = jnp.einsum("bnk,bknd->bnd", pool.assign, out_v)
    cg_offset = jnp.einsum("bnd,bnk->bkd", dx, pool.assign_norm)
    offset_lift = jnp.einsum("bkd,bnk->bnd", cg_offset, pool.assign)
    anchor = jnp.einsum("bkd,bnk->bnd", pool.cg_xyz, pool.assign)
    return anchor - offset_lift + dx


class DiffPoolVAE(nn.Module):
    """Full model (diffpoolvae.py:8-103): pool -> prior -> encode -> mu/sigma
    -> reparametrize -> decode -> soft channel lift.

    RNG streams: 'gumbel' (assignment sampling), 'sample' (reparam)."""

    cfg: DiffPoolConfig
    assign_idx: Optional[tuple] = None

    def setup(self):
        c = self.cfg
        dtype = jnp.dtype(c.compute_dtype)
        self.pooler = CGpool(
            n_conv=c.pool_nconv, feat_dim=c.feat_dim, n_atoms=c.n_atoms,
            n_cgs=c.n_cgs, assign_idx=self.assign_idx,
            trainable_map=c.trainable_map and self.assign_idx is None,
            dtype=dtype,
        )
        self.prior_net = DenseCGPrior(
            n_conv=c.enc_nconv, feat_dim=c.feat_dim, n_rbf=c.n_rbf,
            activation=c.activation, cutoff=c.cg_cutoff, dtype=dtype,
        )
        self.encoder = DenseEquiEncoder(
            n_conv=c.enc_nconv, feat_dim=c.feat_dim, n_rbf=c.n_rbf,
            activation=c.activation, cutoff=c.atom_cutoff, dtype=dtype,
        )
        self.decoder = DenseEquivariantDecoder(
            n_atoms=c.n_atoms, feat_dim=c.feat_dim, n_rbf=c.n_rbf,
            activation=c.activation, cutoff=c.cg_cutoff, n_conv=c.dec_nconv,
            cross=c.cross, dtype=dtype,
        )
        self.atom_munet = MLP([c.feat_dim, c.feat_dim], activation="ReLU", dtype=dtype)
        self.atom_sigmanet = MLP([c.feat_dim, c.feat_dim], activation="ReLU", dtype=dtype)

    def pool(self, z: Array, xyz: Array, adj: Array, tau: Array,
             hard: bool = False) -> PoolOutput:
        return self.pooler(z, xyz, adj, tau, hard=hard)

    def __call__(self, z: Array, xyz: Array, adj: Array, tau: Array) -> DiffPoolOutput:
        xyz = xyz - jnp.mean(xyz, axis=1, keepdims=True)  # diffpoolvae.py:65
        pool = self.pooler(z, xyz, adj, tau)

        prior_mu, prior_sigma = self.prior_net(pool.H, pool.cg_adj, pool.cg_xyz)
        H_z, _ = self.encoder(pool.h, pool.H, xyz, pool.cg_xyz, pool.assign)

        mu = self.atom_munet(H_z)
        logvar = self.atom_sigmanet(H_z)
        logvar = jnp.clip(logvar, -30.0, 30.0)
        sigma = 1e-9 + jnp.exp(logvar / 2.0)

        if self.cfg.det:
            H_repar = mu
        else:
            eps = jax.random.normal(self.make_rng("sample"), mu.shape, mu.dtype)
            H_repar = mu + sigma * eps

        _, out_v = self.decoder(H_repar, pool.cg_adj, pool.cg_xyz)
        xyz_recon = _lift(out_v, pool)
        return DiffPoolOutput(
            xyz=xyz, xyz_recon=xyz_recon, assign=pool.assign,
            cg_xyz=pool.cg_xyz, mu=mu, sigma=sigma,
            prior_mu=prior_mu, prior_sigma=prior_sigma,
        )

    def sample(self, z: Array, xyz: Array, adj: Array, tau: Array,
               hard: bool = False) -> Array:
        """Generative sampling from the conditional prior
        (diffpoolvae.py:26-58). hard=True commits to the argmax
        assignment (CGpool docstring)."""
        pool = self.pooler(z, xyz, adj, tau, hard=hard)
        prior_mu, prior_sigma = self.prior_net(pool.H, pool.cg_adj, pool.cg_xyz)
        eps = jax.random.normal(self.make_rng("sample"), prior_mu.shape,
                                prior_mu.dtype)
        _, out_v = self.decoder(prior_mu + prior_sigma * eps, pool.cg_adj,
                                pool.cg_xyz)
        return _lift(out_v, pool)


def tau_schedule(step, tau_0: float, tau_min: float, tau_rate: float):
    """Exponential gumbel temperature anneal (run_diffpool.py:357-358)."""
    step = jnp.asarray(step, jnp.float32)
    return (tau_0 - tau_min) * jnp.exp(-tau_rate * step) + tau_min
