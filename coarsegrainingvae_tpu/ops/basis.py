"""Radial basis expansions and cutoff envelopes.

Functional ports of the reference primitives (modules.py:45-172 in
/root/reference), written as pure jnp so XLA fuses them into the edge-filter
matmuls. All operate on arbitrary-shaped distance arrays and append the basis
axis last.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def cosine_envelope(d: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Behler cosine cutoff: 0.5*(cos(pi*d/c)+1), zero beyond c
    (modules.py:45-58)."""
    out = 0.5 * (jnp.cos(math.pi * d / cutoff) + 1.0)
    return jnp.where(d >= cutoff, 0.0, out)


def painn_radial_basis(d: jnp.ndarray, n_rbf: int, cutoff: float) -> jnp.ndarray:
    """sinc-like basis sin(n*pi*d/c)/d for n=1..n_rbf (modules.py:139-172).

    d == 0 takes the sinc limit n*pi/c; d >= cutoff gives 0.
    Returns shape d.shape + (n_rbf,).
    """
    shape_d = d[..., None]
    # integer iota + cast: Mosaic (Pallas TPU) only lowers integer iota
    n = jnp.arange(1, n_rbf + 1).astype(d.dtype)
    coef = n * math.pi / cutoff
    denom = jnp.where(shape_d == 0.0, 1.0, shape_d)
    num = jnp.where(shape_d == 0.0, coef, jnp.sin(coef * shape_d))
    return jnp.where(shape_d >= cutoff, 0.0, num / denom)


def gaussian_smearing(
    d: jnp.ndarray,
    start: float,
    stop: float,
    n_gaussians: int,
    centered: bool = False,
) -> jnp.ndarray:
    """Gaussian RBF expansion (modules.py:60-72,116-136).

    Returns shape d.shape + (n_gaussians,).
    """
    offset = jnp.linspace(start, stop, n_gaussians, dtype=d.dtype)
    width = (offset[1] - offset[0]) * jnp.ones_like(offset)
    if not centered:
        coeff = -0.5 / width**2
        diff = d[..., None] - offset
    else:
        coeff = -0.5 / offset**2
        diff = d[..., None]
    return jnp.exp(coeff * diff**2)
