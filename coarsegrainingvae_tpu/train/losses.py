"""Loss stack: reconstruction + beta*KL + gamma*graph (utils.py:89-191 in
/root/reference)."""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp

from coarsegrainingvae_tpu.eval.metrics import COVALENT_RADII as COVALENT_RADII_TABLE
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
    xyz: Array, xyz_recon: Array, bonds: Array, bond_mask: Optional[Array] = None,
    edge_weight: Optional[Array] = None,
) -> Array:
    """MSE of bonded-edge distances between data and reconstruction
    (utils.py:127-133). `edge_weight` (repo extension, default None =
    reference behavior) rescales individual edges in the weighted mean --
    used by the `-h_bond_weight` flag to upweight X-H bonds, the stiffest
    bonds physically and the dominant residual all-atom-validity failure
    once the excluded-volume term removes spurious contacts."""
    gen_d = jnp.sqrt(
        jnp.sum((xyz_recon[bonds[:, 0]] - xyz_recon[bonds[:, 1]]) ** 2, -1) + EPS
    )
    dat_d = jnp.sqrt(
        jnp.sum((xyz[bonds[:, 0]] - xyz[bonds[:, 1]]) ** 2, -1) + EPS
    )
    sq = (gen_d - dat_d) ** 2
    if bond_mask is not None:
        m = bond_mask.astype(sq.dtype)
        if edge_weight is not None:
            m = m * edge_weight
        return jnp.sum(sq * m) / jnp.maximum(jnp.sum(m), 1.0)
    if edge_weight is not None:
        return jnp.sum(sq * edge_weight) / jnp.maximum(jnp.sum(edge_weight), 1.0)
    return jnp.mean(sq)


def build_steric_tables(
    z, bonds, scale: float = 1.3, margin: float = 0.3, frames=None
):
    """Host-side (numpy) excluded-volume tables for `steric_loss`.

    z: (N,) atomic numbers (0 = padding); bonds: (Eb, 2) COVALENT bonds
    only (not the k-hop graph-loss expansion). Returns
    (thresh (N, N) f32, pair_mask (N, N) bool): for every nonbonded
    real-atom pair, the distance below which the exact-bond-graph validity
    metric (eval/metrics.py::valid_ratio, reference sampling.py:120-194)
    would see a spurious edge -- scale*(r_i+r_j) -- plus a safety margin.

    frames (T, N, 3), optional: per-pair DATA margins. With a uniform
    margin the hinge can fight the reconstruction loss on pairs the data
    itself brings close (1-3/1-4 contacts near the cutoff) -- the measured
    failure mode of large zeta at chignolin scale (validity peaked then
    regressed as zeta grew). With frames given, each pair's threshold is
    instead the ENSEMBLE'S OWN closest approach, clipped into
    [validity cutoff, validity cutoff + margin]: the hinge then pushes a
    pair only as far as the data proves is achievable, never further.

    This term has no reference analogue (the reference's loss is
    recon+KL+graph, utils.py:141); it exists because the validity metric's
    dominant failure mode at protein scale is nonbonded 1-3/1-4 pairs
    reconstructed slightly inside the covalent cutoff, and excluded volume
    is physics the data itself obeys. Off unless zeta > 0.
    """
    import numpy as np  # host-side only

    z = np.asarray(z)
    n = z.shape[0]
    real = z > 0
    r = np.array([COVALENT_RADII_TABLE.get(int(v), 1.5) for v in z])
    base = (r[None, :] + r[:, None]) * scale
    thresh = base + margin
    if frames is not None:
        frames = np.asarray(frames, np.float32)
        dmin = np.full((n, n), np.inf, np.float32)
        chunk = max(1, min(512, int(1.5e8 // (n * n))))  # bound host memory
        for lo in range(0, frames.shape[0], chunk):
            c = frames[lo : lo + chunk]
            d = np.sqrt(
                ((c[:, :, None, :] - c[:, None, :, :]) ** 2).sum(-1)
            ).min(0)
            np.minimum(dmin, d, out=dmin)
        thresh = np.clip(dmin, base, base + margin)
    mask = real[None, :] & real[:, None]
    mask[np.arange(n), np.arange(n)] = False
    for a, b in np.asarray(bonds).reshape(-1, 2):
        mask[int(a), int(b)] = mask[int(b), int(a)] = False
    return thresh.astype(np.float32), mask


def steric_loss(
    xyz_recon: Array, thresh: Array, pair_mask: Array
) -> Array:
    """Mean squared hinge on nonbonded pair distances below `thresh`.

    xyz_recon: (B*N, 3) flattened reconstruction (VAEOutput layout);
    thresh/pair_mask: (N, N) single-topology tables from
    `build_steric_tables` (the dominant single-topology regime,
    data/batch.py docstring). Dense (B, N, N) pass -- at N<=500 this is
    noise next to the message-passing matmuls.
    """
    n = thresh.shape[0]
    xyz = xyz_recon.reshape(-1, n, 3)
    d = jnp.sqrt(
        jnp.sum((xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, -1) + EPS
    )
    viol = jnp.maximum(thresh[None] - d, 0.0)
    m = pair_mask.astype(viol.dtype)[None]
    return jnp.sum(viol**2 * m) / jnp.maximum(
        pair_mask.sum().astype(viol.dtype) * xyz.shape[0], 1.0
    )


def steric_loss_batched(
    xyz_recon: Array,
    z: Array,
    bonds: Array,
    bond_mask: Array,
    scale: float = 1.3,
    margin: float = 0.3,
) -> Array:
    """Excluded-volume hinge for MULTI-topology padded batches (PCN,
    data/sidechain.py): every sample carries its own atoms and covalent
    bond list, so the (N, N) tables are built inside the step from the
    batch arrays instead of host-side (`build_steric_tables` covers the
    single-topology regime).

    xyz_recon: (B*N, 3) flattened reconstruction; z: (B, N) atomic
    numbers (0 = padding); bonds: (B, Eb, 2) LOCAL covalent pairs;
    bond_mask: (B, Eb). Same semantics as `steric_loss`: squared hinge on
    nonbonded real-atom pair distances below scale*(r_i+r_j) + margin.
    Dense (B, N, N) pass -- at PCN scale (N <= ~2.5k) this is one fused
    elementwise+reduce next to the message-passing matmuls.
    """
    b, n = z.shape
    xyz = xyz_recon.reshape(b, n, 3)
    radii = jnp.asarray(
        [1.5] + [COVALENT_RADII_TABLE.get(k, 1.5) for k in range(1, 120)],
        xyz.dtype,
    )
    r = radii[jnp.clip(z, 0, 119)]
    thresh = (r[:, :, None] + r[:, None, :]) * scale + margin
    real = z > 0
    mask = real[:, :, None] & real[:, None, :]
    mask = mask & ~jnp.eye(n, dtype=bool)[None]
    # padded bond rows route to (0, 0) -- the diagonal, already excluded
    i = jnp.where(bond_mask, bonds[..., 0], 0)
    j = jnp.where(bond_mask, bonds[..., 1], 0)
    bi = jnp.arange(b)[:, None]
    mask = mask.at[bi, i, j].set(False)
    mask = mask.at[bi, j, i].set(False)
    d = jnp.sqrt(
        jnp.sum((xyz[:, :, None, :] - xyz[:, None, :, :]) ** 2, -1) + EPS
    )
    m = mask.astype(d.dtype)
    viol = jnp.maximum(thresh - d, 0.0) * m
    return jnp.sum(viol**2) / jnp.maximum(jnp.sum(m), 1.0)


def steric_active(zeta) -> bool:
    """Static (trace-time) gate for the excluded-volume term: False only
    for a literal 0 weight. A TRACED zeta (the zeta_warmup ramp passes
    `cfg.zeta * min(step/warmup, 1)` as a jnp scalar) is always active --
    `zeta != 0.0` on a tracer would raise under jit."""
    return not (isinstance(zeta, (int, float)) and float(zeta) == 0.0)


def vae_loss(
    out: VAEOutput,
    g: FlatGraph,
    beta: float,
    gamma: float,
    legacy_kl: bool = False,
    zeta: float = 0.0,
    steric: Optional[Tuple[Array, Array]] = None,
    h_bond_weight: float = 1.0,
    eta_h: float = 0.0,
) -> Tuple[Array, Dict[str, Array]]:
    """total = recon + beta*KL + gamma*graph (utils.py:141)
    [+ zeta*steric, h_bond_weight and eta_h, repo extensions -- see
    build_steric_tables / graph_loss].

    eta_h adds a SEPARATE bonded-distance MSE over the H-touching subset
    of the graph edges, with its own normalization: unlike h_bond_weight
    (which reweights edges inside ONE weighted mean and therefore dilutes
    the heavy-bond gradient -- measured to collapse heavy validity, see
    examples/results/steric_ab/README.md), an additive term leaves the
    reference graph-term gradient untouched and only ADDS pressure on the
    X-H distances that dominate the residual all-atom-validity failures.
    Default 0.0 = reference loss surface."""
    if out.mu is not None:
        loss_kl = kl_divergence(
            out.mu, out.sigma, out.prior_mu, out.prior_sigma,
            legacy=legacy_kl, mask=g.cg_mask,
        )
    else:
        loss_kl = jnp.asarray(0.0, jnp.float32)
    loss_recon = recon_loss(out.xyz, out.xyz_recon, g.atom_mask)
    if gamma != 0.0:
        ew = None
        if h_bond_weight != 1.0:
            is_h = (g.z[g.bonds[:, 0]] == 1) | (g.z[g.bonds[:, 1]] == 1)
            ew = jnp.where(is_h, h_bond_weight, 1.0)
        loss_graph = graph_loss(out.xyz, out.xyz_recon, g.bonds, g.bond_mask,
                                edge_weight=ew)
    else:
        loss_graph = jnp.asarray(0.0, jnp.float32)
    total = loss_recon + beta * loss_kl + gamma * loss_graph
    metrics = {
        "loss": total,
        "recon": loss_recon,
        "kl": loss_kl,
        "graph": loss_graph,
    }
    if steric_active(zeta) and steric is not None:
        loss_steric = steric_loss(out.xyz_recon, steric[0], steric[1])
        total = total + zeta * loss_steric
        metrics["loss"] = total
        metrics["steric"] = loss_steric
    if eta_h != 0.0:
        is_h = (
            (g.z[g.bonds[:, 0]] == 1) | (g.z[g.bonds[:, 1]] == 1)
        ).astype(jnp.float32)
        h_mask = is_h if g.bond_mask is None else (
            is_h * g.bond_mask.astype(jnp.float32)
        )
        loss_h = graph_loss(out.xyz, out.xyz_recon, g.bonds, bond_mask=h_mask)
        total = total + eta_h * loss_h
        metrics["loss"] = total
        metrics["h_graph"] = loss_h
    return total, metrics
