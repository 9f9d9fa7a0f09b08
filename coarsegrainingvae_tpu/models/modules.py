"""NN primitives (flax.linen).

TPU-first ports of the reference primitives (modules.py:8-226 in
/root/reference): Dense with Xavier-uniform init + fused activation,
DistanceEmbed (PaiNN radial basis -> Dense -> cosine envelope), and the
SchNet-style Gaussian edge filter. Parameters live in float32; matmuls can
run in bfloat16 via `dtype` (geometry stays float32 upstream).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from coarsegrainingvae_tpu.ops.activations import get_activation
from coarsegrainingvae_tpu.ops.basis import cosine_envelope, gaussian_smearing, painn_radial_basis


class Dense(nn.Module):
    """Linear layer, Xavier-uniform weight init, zero bias, optional fused
    activation (reference Dense, modules.py:75-114)."""

    features: int
    use_bias: bool = True
    activation: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.activation is not None and self.activation != "linear":
            y = get_activation(self.activation)(y)
        return y


class MLP(nn.Module):
    """Stack of Dense layers with activations between (the reference's
    nn.Sequential(...Linear/act...) idiom, e.g. run_ala.py:184-185)."""

    features: Sequence[int]
    activation: str = "ReLU"
    final_activation: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, f in enumerate(self.features):
            last = i == len(self.features) - 1
            act = self.final_activation if last else self.activation
            x = Dense(f, activation=act, dtype=self.dtype)(x)
        return x


class DistanceEmbed(nn.Module):
    """PainnRadialBasis -> Dense -> * CosineEnvelope; the edge filter used by
    every message block (modules.py:175-197)."""

    n_rbf: int
    cutoff: float
    feat_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        rbf = painn_radial_basis(dist, self.n_rbf, self.cutoff)
        feats = Dense(self.feat_dim, dtype=self.dtype)(rbf)
        return feats * cosine_envelope(dist, self.cutoff)[..., None]


class SchNetEdgeFilter(nn.Module):
    """GaussianSmearing -> Dense -> act -> Dense (modules.py:200-226);
    alternate edge filter kept for parity (mostly unused by drivers)."""

    cutoff: float
    n_gaussians: int
    n_filters: int
    activation: str = "shifted_softplus"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dist: jnp.ndarray) -> jnp.ndarray:
        x = gaussian_smearing(dist, 0.0, self.cutoff, self.n_gaussians)
        x = Dense(self.n_gaussians, activation=self.activation, dtype=self.dtype)(x)
        return Dense(self.n_filters, dtype=self.dtype)(x)


class EmbeddingZeroPad(nn.Module):
    """Embedding table with row 0 pinned to zero -- functional analogue of
    torch nn.Embedding(padding_idx=0) used for atomic numbers
    (cgvae.py:206,345)."""

    num_embeddings: int
    features: int

    @nn.compact
    def __call__(self, ids: jnp.ndarray) -> jnp.ndarray:
        emb = nn.Embed(
            self.num_embeddings,
            self.features,
            embedding_init=nn.initializers.normal(stddev=1.0),
        )(ids)
        return emb * (ids != 0).astype(emb.dtype)[..., None]
