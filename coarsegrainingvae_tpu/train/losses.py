"""Loss stack: reconstruction + beta*KL + gamma*graph (utils.py:89-191 in
/root/reference)."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from coarsegrainingvae_tpu.models.cgvae import FlatGraph, VAEOutput

Array = jnp.ndarray

EPS = 1e-6  # reference scripts/utils.py:15


def kl_divergence(
    mu1: Array,
    std1: Array,
    mu2: Optional[Array] = None,
    std2: Optional[Array] = None,
    legacy: bool = False,
    mask: Optional[Array] = None,
) -> Array:
    """Diagonal-Gaussian KL (reference KL, scripts/utils.py:81-86).

    Against N(0, 1) when mu2 is None, else against (mu2, std2).

    NOTE the reference's two-Gaussian branch divides the mean term by std2
    rather than std2^2 (utils.py:85) -- a bug we do NOT replicate by
    default; pass legacy=True to reproduce the reference's exact loss
    surface.
    """
    if mu2 is None:
        per_node = -0.5 * jnp.sum(
            1 + jnp.log(std1**2) - mu1**2 - std1**2, axis=-1
        )
    else:
        denom = std2 if legacy else std2**2
        per_node = 0.5 * (
            jnp.sum(std1**2 / std2**2, -1)
            + jnp.sum((mu1 - mu2) ** 2 / denom, -1)
            + jnp.sum(jnp.log(std2**2), -1)
            - jnp.sum(jnp.log(std1**2), -1)
            - mu1.shape[-1]
        )
    if mask is not None:
        m = mask.astype(per_node.dtype)
        return jnp.sum(per_node * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(per_node)


def recon_loss(xyz: Array, xyz_recon: Array, mask: Optional[Array] = None) -> Array:
    """Coordinate MSE, mean over atoms and xyz (utils.py:124)."""
    sq = (xyz_recon - xyz) ** 2
    if mask is not None:
        m = mask.astype(sq.dtype)[:, None]
        return jnp.sum(sq * m) / jnp.maximum(jnp.sum(m) * 3.0, 1.0)
    return jnp.mean(sq)


def graph_loss(
    xyz: Array, xyz_recon: Array, bonds: Array, bond_mask: Optional[Array] = None
) -> Array:
    """MSE of bonded-edge distances between data and reconstruction
    (utils.py:127-133)."""
    gen_d = jnp.sqrt(
        jnp.sum((xyz_recon[bonds[:, 0]] - xyz_recon[bonds[:, 1]]) ** 2, -1) + EPS
    )
    dat_d = jnp.sqrt(
        jnp.sum((xyz[bonds[:, 0]] - xyz[bonds[:, 1]]) ** 2, -1) + EPS
    )
    sq = (gen_d - dat_d) ** 2
    if bond_mask is not None:
        m = bond_mask.astype(sq.dtype)
        return jnp.sum(sq * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(sq)


def vae_loss(
    out: VAEOutput,
    g: FlatGraph,
    beta: float,
    gamma: float,
    legacy_kl: bool = False,
) -> Tuple[Array, Dict[str, Array]]:
    """total = recon + beta*KL + gamma*graph (utils.py:141)."""
    if out.mu is not None:
        loss_kl = kl_divergence(
            out.mu, out.sigma, out.prior_mu, out.prior_sigma,
            legacy=legacy_kl, mask=g.cg_mask,
        )
    else:
        loss_kl = jnp.asarray(0.0, jnp.float32)
    loss_recon = recon_loss(out.xyz, out.xyz_recon, g.atom_mask)
    if gamma != 0.0:
        loss_graph = graph_loss(out.xyz, out.xyz_recon, g.bonds, g.bond_mask)
    else:
        loss_graph = jnp.asarray(0.0, jnp.float32)
    total = loss_recon + beta * loss_kl + gamma * loss_graph
    return total, {
        "loss": total,
        "recon": loss_recon,
        "kl": loss_kl,
        "graph": loss_graph,
    }
