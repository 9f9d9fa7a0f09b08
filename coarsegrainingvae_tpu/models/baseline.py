"""Non-VAE backmapping baselines (baseline.py:8-443 in /root/reference).

All baselines consume a FIXED CG mapping (the reference routes it through
CGpool with tau=0, baseline.py:22-26; since the assignment is one-hot and
constant, the pooler's conv stack cannot affect the output, so here the
pooling is plain one-hot einsum -- no dead network). The kNN CG edge
geometry that the reference extracts with a host-synced sort + .nonzero()
(baseline.py:186-196) is a static ``jax.lax.top_k`` over the negated
distance matrix: fixed shapes, no host sync.

Every model maps CG bead coordinates -> all-atom coordinates:
  dist_vec (B, K, knn, 3)  k nearest CG edge vectors per bead
  coeffs   = f(edge distances)           (invariant)
  dx       = sum over edges coeffs * dist_vec   (equivariant by construction)
  recon    = bead anchor - lifted COM offset + dx
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from coarsegrainingvae_tpu.models.modules import Dense, MLP as MLPStack
from coarsegrainingvae_tpu.ops.basis import gaussian_smearing

Array = jnp.ndarray


def fixed_pool(mapping: Array, n_cgs: int, xyz: Array) -> Tuple[Array, Array, Array]:
    """One-hot pooling for a fixed mapping: (M, M_norm, cg_xyz).

    mapping (N,) -> M (N, K); cg_xyz[b, k] = mean of atoms mapped to k.
    """
    m = jax.nn.one_hot(mapping, n_cgs, dtype=xyz.dtype)          # (N, K)
    m_norm = m / (jnp.sum(m, axis=0, keepdims=True) + 1e-8)
    cg_xyz = jnp.einsum("bnd,nk->bkd", xyz, m_norm)
    return m, m_norm, cg_xyz


def knn_edge_vectors(cg_xyz: Array, knn: int) -> Tuple[Array, Array]:
    """k nearest CG-CG edge vectors per bead, excluding self.

    Returns (dist_vec (B, K, knn, 3), dist (B, K, knn)). Replaces the
    reference's sort + .cpu() + .nonzero() pipeline (baseline.py:186-196)
    with lax.top_k on the negated distance matrix -- static shapes.
    """
    diff = cg_xyz[:, None, :, :] - cg_xyz[:, :, None, :]         # (B,K,K,3) x_j - x_i
    dist = jnp.sqrt(jnp.sum(diff**2, axis=-1) + 1e-12)
    k_beads = cg_xyz.shape[1]
    eye = jnp.eye(k_beads, dtype=dist.dtype) * 1e9
    _, idx = jax.lax.top_k(-(dist + eye), knn)                   # (B, K, knn)
    dist_vec = jnp.take_along_axis(diff, idx[..., None], axis=2)
    d = jnp.sqrt(jnp.sum(dist_vec**2, axis=-1) + 1e-12)
    return dist_vec, d


def recenter_lift(
    dx: Array, mapping: Array, m_norm: Array, cg_xyz: Array
) -> Array:
    """COM re-centering + bead anchoring shared by all equivariant baselines
    (baseline.py:207-210)."""
    cg_offset = jnp.einsum("bnd,nk->bkd", dx, m_norm)
    return (
        jnp.take(cg_xyz, mapping, axis=1)
        - jnp.take(cg_offset, mapping, axis=1)
        + dx
    )


def _coeff_mlp(width_mult: int, depth: int, out_dim: int, activation: str):
    """Linear -> [act -> Linear]*depth -> act -> Linear stack
    (baseline.py:123-127)."""
    widths = [out_dim * width_mult] * (depth + 1) + [out_dim]
    return MLPStack(widths, activation=activation)


class LinearBaseline(nn.Module):
    """x_recon = B @ cg_xyz after mean-centering (baseline.py:8-36)."""

    n_cgs: int
    n_atoms: int
    mapping: Tuple[int, ...]

    @nn.compact
    def __call__(self, xyz: Array) -> Tuple[Array, Array]:
        mapping = jnp.asarray(self.mapping, jnp.int32)
        _, _, cg_xyz = fixed_pool(mapping, self.n_cgs, xyz)
        shift = jnp.mean(xyz, axis=1, keepdims=True)
        b_mat = self.param(
            "B", lambda k, s: 0.01 * jax.random.normal(k, s),
            (self.n_cgs, self.n_atoms),
        )
        x_recon = jnp.einsum("bkd,kn->bnd", cg_xyz - shift, b_mat)
        return xyz - shift, x_recon


class MLPBaseline(nn.Module):
    """Flat MLP on raw CG coordinates -- not equivariant
    (baseline.py:109-147)."""

    n_cgs: int
    n_atoms: int
    mapping: Tuple[int, ...]
    width: int = 1
    depth: int = 1
    activation: str = "ReLU"

    @nn.compact
    def __call__(self, xyz: Array) -> Tuple[Array, Array]:
        mapping = jnp.asarray(self.mapping, jnp.int32)
        _, _, cg_xyz = fixed_pool(mapping, self.n_cgs, xyz)
        flat = cg_xyz.reshape(-1, self.n_cgs * 3)
        out = _coeff_mlp(self.width, self.depth, self.n_atoms * 3, self.activation)(flat)
        return xyz, out.reshape(-1, self.n_atoms, 3)


class EquiMLP(nn.Module):
    """Per-edge MLP on scalar distance -> per-atom coefficients on edge
    vectors (baseline.py:150-212). equi2=True is the EquiMLP2 variant
    (baseline.py:214-280): the MLP sees all K*knn distances jointly."""

    n_cgs: int
    n_atoms: int
    mapping: Tuple[int, ...]
    knn: int = 3
    width: int = 1
    depth: int = 1
    activation: str = "ReLU"
    equi2: bool = False

    @nn.compact
    def __call__(self, xyz: Array) -> Tuple[Array, Array]:
        mapping = jnp.asarray(self.mapping, jnp.int32)
        _, m_norm, cg_xyz = fixed_pool(mapping, self.n_cgs, xyz)
        dist_vec, d = knn_edge_vectors(cg_xyz, self.knn)
        n_edges = self.n_cgs * self.knn
        dist_vec = dist_vec.reshape(-1, n_edges, 3)

        if self.equi2:
            feat = d.reshape(-1, n_edges)
            coeffs = _coeff_mlp(
                self.width, self.depth, n_edges * self.n_atoms, self.activation
            )(feat).reshape(-1, n_edges, self.n_atoms)
        else:
            feat = d.reshape(-1, n_edges, 1)
            coeffs = _coeff_mlp(
                self.width, self.depth, self.n_atoms, self.activation
            )(feat)

        dx = jnp.einsum("ben,bed->bnd", coeffs, dist_vec)
        return xyz, recenter_lift(dx, mapping, m_norm, cg_xyz)


class SetEquiMLP(nn.Module):
    """Per-bead channel variant (baseline.py:283-384): coefficients shaped
    (K, knn, channels); atom i reads (bead(i), channel(i)). channel_idx is
    the precomputed CG2ChannelIdx constant."""

    n_cgs: int
    n_atoms: int
    mapping: Tuple[int, ...]
    channel_idx: Tuple[int, ...]
    n_channels: int          # max atoms per bead (reference uses the mode count)
    knn: int = 3
    width: int = 1
    depth: int = 1
    activation: str = "ReLU"

    @nn.compact
    def __call__(self, xyz: Array) -> Tuple[Array, Array]:
        mapping = jnp.asarray(self.mapping, jnp.int32)
        channel = jnp.asarray(self.channel_idx, jnp.int32)
        knn = min(self.knn, self.n_cgs - 1)
        _, m_norm, cg_xyz = fixed_pool(mapping, self.n_cgs, xyz)
        dist_vec, d = knn_edge_vectors(cg_xyz, knn)   # (B, K, knn, 3)

        feat = d.reshape(-1, self.n_cgs * knn)
        coeffs = _coeff_mlp(
            self.width, self.depth, self.n_cgs * knn * self.n_channels,
            self.activation,
        )(feat).reshape(-1, self.n_cgs, knn, self.n_channels)

        dx_chan = jnp.einsum("bkec,bked->bkcd", coeffs, dist_vec)  # (B,K,C,3)
        dx = dx_chan[:, mapping, channel, :]                        # (B, N, 3)
        return xyz, recenter_lift(dx, mapping, m_norm, cg_xyz)


class SetTransform(nn.Module):
    """Permutation-equivariant set layer over the edge axis
    (baseline.py:39-50)."""

    feat_dim: int
    activation: str

    @nn.compact
    def __call__(self, edgeset: Array) -> Array:
        update = MLPStack([self.feat_dim, self.feat_dim],
                          activation=self.activation)(edgeset)
        pooled = jnp.mean(update, axis=-2, keepdims=True)
        return MLPStack([self.feat_dim, self.feat_dim],
                        activation=self.activation)(update + pooled)


class EdgeSetMLP(nn.Module):
    """Gaussian-smeared edge distances -> SetTransform stack -> per-atom
    coefficients (baseline.py:52-106)."""

    n_cgs: int
    n_atoms: int
    mapping: Tuple[int, ...]
    knn: int = 3
    depth: int = 2
    feat_dim: int = 32
    cutoff: float = 20.0
    activation: str = "swish"

    @nn.compact
    def __call__(self, xyz: Array) -> Tuple[Array, Array]:
        mapping = jnp.asarray(self.mapping, jnp.int32)
        _, m_norm, cg_xyz = fixed_pool(mapping, self.n_cgs, xyz)
        dist_vec, d = knn_edge_vectors(cg_xyz, self.knn)   # (B, K, knn, 3)

        out = gaussian_smearing(d, 0.0, self.cutoff, self.feat_dim)  # (B,K,knn,F)
        for _ in range(self.depth):
            out = SetTransform(feat_dim=self.feat_dim,
                               activation=self.activation)(out)
        coeffs = MLPStack([self.feat_dim, self.n_atoms],
                          activation=self.activation)(out)
        coeffs = coeffs.reshape(-1, self.n_cgs * self.knn, self.n_atoms)

        dx = jnp.einsum("ben,bed->bnd", coeffs,
                        dist_vec.reshape(-1, self.n_cgs * self.knn, 3))
        return xyz, recenter_lift(dx, mapping, m_norm, cg_xyz)


class EquiLinear(nn.Module):
    """Single linear layer over kNN CG edge vectors (baseline.py:387-443)."""

    n_cgs: int
    n_atoms: int
    mapping: Tuple[int, ...]
    knn: int = 3

    @nn.compact
    def __call__(self, xyz: Array) -> Tuple[Array, Array]:
        mapping = jnp.asarray(self.mapping, jnp.int32)
        _, m_norm, cg_xyz = fixed_pool(mapping, self.n_cgs, xyz)
        dist_vec, _ = knn_edge_vectors(cg_xyz, self.knn)
        dist_vec = dist_vec.reshape(-1, self.n_cgs * self.knn, 3)
        b_mat = self.param(
            "B", lambda k, s: 0.01 * jax.random.normal(k, s),
            (self.n_atoms, self.n_cgs * self.knn),
        )
        dx = jnp.einsum("bed,ne->bnd", dist_vec, b_mat)
        return xyz, recenter_lift(dx, mapping, m_norm, cg_xyz)


BASELINE_ZOO = {
    "linear": LinearBaseline,
    "mlp": MLPBaseline,
    "equimlp": EquiMLP,
    "equimlp2": EquiMLP,   # equi2=True
    "setequimlp": SetEquiMLP,
    "edgesetmlp": EdgeSetMLP,
    "equilinear": EquiLinear,
}


def build_baseline(
    name: str,
    n_cgs: int,
    n_atoms: int,
    mapping,
    channel_idx=None,
    n_channels: int = 0,
    **kwargs,
) -> nn.Module:
    """Model-zoo dispatch (run_baseline.py:285-302). The kNN of every
    edge-based model is clamped to n_cgs - 1 (there are only that many
    other beads; the reference clamps only in SetEquiMLP,
    baseline.py:292-293)."""
    mapping = tuple(int(x) for x in mapping)
    name = name.lower()
    if "knn" in kwargs:
        kwargs["knn"] = min(int(kwargs["knn"]), n_cgs - 1)
    if name in ("linear",):
        return LinearBaseline(n_cgs=n_cgs, n_atoms=n_atoms, mapping=mapping)
    if name == "mlp":
        return MLPBaseline(n_cgs=n_cgs, n_atoms=n_atoms, mapping=mapping, **kwargs)
    if name == "equimlp":
        return EquiMLP(n_cgs=n_cgs, n_atoms=n_atoms, mapping=mapping, **kwargs)
    if name == "equimlp2":
        return EquiMLP(n_cgs=n_cgs, n_atoms=n_atoms, mapping=mapping,
                       equi2=True, **kwargs)
    if name == "setequimlp":
        assert channel_idx is not None and n_channels > 0
        return SetEquiMLP(
            n_cgs=n_cgs, n_atoms=n_atoms, mapping=mapping,
            channel_idx=tuple(int(x) for x in channel_idx),
            n_channels=n_channels, **kwargs,
        )
    if name == "edgesetmlp":
        return EdgeSetMLP(n_cgs=n_cgs, n_atoms=n_atoms, mapping=mapping, **kwargs)
    if name == "equilinear":
        return EquiLinear(n_cgs=n_cgs, n_atoms=n_atoms, mapping=mapping, **kwargs)
    raise ValueError(f"unknown baseline {name!r}")
