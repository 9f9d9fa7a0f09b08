"""Fused equivariant message block as a single Pallas TPU kernel.

The factored PaiNN message (models/dense.DenseFactoredEquiMessage) reads
per-node features and produces per-node aggregates; everything pairwise
(distances, RBF, envelope, adjacency, per-basis contractions) is
intermediate. XLA materializes the (B, N, R+1, [3,] F) per-basis tensors in
HBM between einsums; this kernel keeps the ENTIRE pair pipeline in VMEM:

    HBM reads : xyz (B,N,3), mask (B,N), phi (B,N,S,F), v (B,N,3,F), W
    HBM writes: ds (B,N,F), dv (B,N,3,F)

Grid = (B, N / TILE_I) receiver tiles; per tile the kernel rebuilds the
geometry rows (TILE_I, N), forms K = adj*env*rbf (TILE_I, N, R+1) in
registers/VMEM, and accumulates the four message terms with
(TILE_I*(R+1), N) @ (N, F) MXU matmuls:

    ds_i    = fold_r K_r phi_b
    dv_i    = fold_r (K_r * unit_d) phi_c            (unit channel)
            + fold_r K_r (phi_a * v_d)               (sender-vector channel)
            + v_i x fold_r K_r (phi_3 * v_d)         (cross channel)

Backward: a second hand-derived Pallas kernel of the same structure
(round-3; the DESIGN roadmap's "per-basis-matmul backward"). The key
identity is that the pair filter K = adj*env*rbf is SYMMETRIC in (i, j)
(it depends only on the distance and the two masks) while the unit vector
is antisymmetric, so one row-geometry build per node tile serves both the
receiver-side recompute and every sender-side cotangent contraction -- the
adjoints reuse the forward's contract/fold helpers verbatim:

    d_phi1 = fold(contract(g_ds), w1)           d_w1 = sum_j G1 . phi1
    d_phi2 = fold(-contract_u(g_dv_d), w2)      (antisymmetric unit)
    A0_d   = fold(contract(g_dv_d), w0)  ->  d_phi0 = sum_d v_d A0_d,
                                             d_v_d += phi0 A0_d
    cross: Gamma3 = g_dv x v_i per node; same machinery with Gamma3 for
    the sender side, plus the receiver-side d_v += w3_agg x g_dv with
    w3_agg recomputed exactly as in the forward.

GRADIENT CONTRACT: the geometry inputs (xyz, mask) receive ZERO cotangent
-- in every CGVAE model the message graphs are built from batch
coordinates, which are data, never functions of params. Do NOT use this
kernel where coordinates require gradients (e.g. force fields); the
pure-jnp `message_reference` differentiates fully.

Semantics match DenseFactoredEquiMessage exactly (same W layout, same
sqrt(d^2 + EPS) distance, same cutoff adjacency); parity tests pin values
AND all input gradients against the jnp reference.

Status (measured on one v5e chip, f32, 20-call mean incl. result transfer):
  B=32 N=32  F=600: pallas 5.98 ms vs XLA 6.30 ms  (max |err| ~6e-4)
  B=8  N=176 F=600: pallas 9.97 ms vs XLA 6.43 ms
Opt-in (`message_impl="pallas"` wiring is config-level); DESIGN.md carries
the kernel-vs-XLA shape table that decides defaults.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from coarsegrainingvae_tpu.ops.basis import cosine_envelope, painn_radial_basis

Array = jnp.ndarray

EPS = 1e-3  # dense-family distance epsilon (models/dense.py)


# --------------------------------------------------------------- reference
def message_reference(
    xyz: Array,    # (B, N, 3)
    mask: Array,   # (B, N) bool/float
    phi: Array,    # (B, N, S, F), S = 4 (cross) or 3
    v: Array,      # (B, N, 3, F)
    w: Array,      # (R+1, S, F)
    cutoff: float,
    n_rbf: int,
) -> Tuple[Array, Array]:
    """Pure-jnp semantics of the fused kernel (also its VJP source)."""
    n = xyz.shape[1]
    cross = phi.shape[2] == 4
    r_ij = xyz[:, None, :, :] - xyz[:, :, None, :]
    dist = jnp.sqrt(jnp.sum(r_ij**2, axis=-1) + EPS)
    unit = r_ij / dist[..., None]
    m = mask.astype(xyz.dtype)
    adj = (dist < cutoff).astype(xyz.dtype)
    adj = adj * (1.0 - jnp.eye(n, dtype=xyz.dtype))
    adj = adj * m[:, :, None] * m[:, None, :]

    rbf = painn_radial_basis(dist, n_rbf, cutoff)
    rbf = jnp.concatenate([rbf, jnp.ones_like(rbf[..., :1])], -1)
    env = cosine_envelope(dist, cutoff)
    k = adj[..., None] * env[..., None] * rbf                  # (B,N,N,R+1)

    g_b = jnp.einsum("bijr,bjf->birf", k, phi[:, :, 1])
    ds = jnp.einsum("birf,rf->bif", g_b, w[:, 1])

    ku = jnp.einsum("bijr,bijd->bijrd", k, unit)
    g_c = jnp.einsum("bijrd,bjf->birdf", ku, phi[:, :, 2])
    dv = jnp.einsum("birdf,rf->bidf", g_c, w[:, 2])

    p_a = phi[:, :, 0][:, :, None, :] * v
    g_a = jnp.einsum("bijr,bjdf->birdf", k, p_a)
    dv = dv + jnp.einsum("birdf,rf->bidf", g_a, w[:, 0])

    if cross:
        p_3 = phi[:, :, 3][:, :, None, :] * v
        g_3 = jnp.einsum("bijr,bjdf->birdf", k, p_3)
        w3 = jnp.einsum("birdf,rf->bidf", g_3, w[:, 3])
        dv = dv + _cross_df(v, w3)
    return ds, dv


def _cross_df(a: Array, b: Array) -> Array:
    """Cross product over the 3-axis of (..., 3, F) arrays."""
    a1, a2, a3 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
    b1, b2, b3 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
    return jnp.stack(
        [a2 * b3 - a3 * b2, a3 * b1 - a1 * b3, a1 * b2 - a2 * b1], axis=-2
    )


# ------------------------------------------------------------------ kernel
def _fused_kernel(
    xyz_ref, xyz_t_ref, mask_ref, mask_t_ref, phi_ref, v_ref, v_t_ref,
    w_ref, ds_ref, dv_ref,
    *, cutoff: float, n_rbf: int, tile_i: int, cross: bool,
):
    """One (batch element, receiver tile) program instance.

    Block shapes (VMEM):
      xyz (N, 3)   mask (N,)   phi (N, S, F)   v (N, 3, F)   w (R+1, S, F)
      ds  (TILE_I, F)          dv (TILE_I, 3, F)
    """
    t = pl.program_id(1)
    n = xyz_ref.shape[1]
    f = v_ref.shape[-1]
    r_aug = n_rbf + 1

    xyz = xyz_ref[0]                                  # (N, 3)
    m = mask_ref[0, :, 0].astype(jnp.float32)         # (N,)
    xi = xyz_t_ref[0]                                 # (TI, 3) via BlockSpec
    mi = mask_t_ref[0, :, 0].astype(jnp.float32)      # (TI,)

    d_vec = xyz[None, :, :] - xi[:, None, :]          # (TI, N, 3)
    dist = jnp.sqrt(jnp.sum(d_vec**2, axis=-1) + EPS)
    unit = d_vec / dist[..., None]

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_i, n), 0) + t * tile_i
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_i, n), 1)
    adj = (dist < cutoff).astype(jnp.float32)
    adj = adj * (row_ids != col_ids).astype(jnp.float32)
    adj = adj * mi[:, None] * m[None, :]

    rbf = painn_radial_basis(dist, n_rbf, cutoff)     # (TI, N, R)
    rbf = jnp.concatenate([rbf, jnp.ones_like(rbf[..., :1])], -1)
    env = cosine_envelope(dist, cutoff)
    k = adj[..., None] * env[..., None] * rbf         # (TI, N, R+1)

    w = w_ref[:]                                      # (R+1, S, F)
    phi = phi_ref[0]                                  # (N, S, F)
    v = v_ref[0]                                      # (N, 3, F)

    k_mat = k.transpose(0, 2, 1).reshape(tile_i * r_aug, n)

    def contract(x):                                  # (N, F) -> (TI, R+1, F)
        out = jnp.dot(k_mat, x, preferred_element_type=jnp.float32)
        return out.reshape(tile_i, r_aug, f)

    def fold(g, ws):                                  # (TI,R+1,F),(R+1,F)->(TI,F)
        return jnp.sum(g * ws[None], axis=1)

    # scalar channel
    ds_ref[0] = fold(contract(phi[:, 1]), w[:, 1])

    # unit channel: per spatial axis, K*unit_d contraction with phi_c
    dv = []
    for d in range(3):
        kd = (k * unit[..., d][..., None]).transpose(0, 2, 1).reshape(
            tile_i * r_aug, n
        )
        g = jnp.dot(kd, phi[:, 2], preferred_element_type=jnp.float32)
        dv_d = fold(g.reshape(tile_i, r_aug, f), w[:, 2])
        # sender-vector channel: payload phi_a * v_d
        g_a = contract(phi[:, 0] * v[:, d])
        dv_d = dv_d + fold(g_a, w[:, 0])
        dv.append(dv_d)

    if cross:
        w3 = [fold(contract(phi[:, 3] * v[:, d]), w[:, 3]) for d in range(3)]
        v_tile = v_t_ref[0]                           # (TI, 3, F)
        vi = [v_tile[:, d, :] for d in range(3)]
        dv[0] = dv[0] + vi[1] * w3[2] - vi[2] * w3[1]
        dv[1] = dv[1] + vi[2] * w3[0] - vi[0] * w3[2]
        dv[2] = dv[2] + vi[0] * w3[1] - vi[1] * w3[0]

    dv_ref[0] = jnp.stack(dv, axis=1)                 # (TI, 3, F)


def _bwd_kernel(
    xyz_ref, xyz_t_ref, mask_ref, mask_t_ref, phi_ref, phi_t_ref,
    v_ref, v_t_ref, w_ref, gs_ref, gs_t_ref, gv_ref, gv_t_ref,
    dphi_ref, dv_ref, dw_ref,
    *, cutoff: float, n_rbf: int, tile_i: int, cross: bool,
):
    """Hand-derived VJP; one (batch element, node tile) program instance.

    The tile plays BOTH roles: receiver (for the cross channel's
    receiver-side term) and sender (for d_phi/d_v/d_w), sharing one
    row-geometry build thanks to K's (i,j) symmetry. d_w accumulates
    across the sequential grid."""
    t = pl.program_id(1)
    n = xyz_ref.shape[1]
    f = v_ref.shape[-1]
    s_ch = phi_ref.shape[2]
    r_aug = n_rbf + 1

    xyz = xyz_ref[0]
    m = mask_ref[0, :, 0].astype(jnp.float32)
    xt = xyz_t_ref[0]
    mt = mask_t_ref[0, :, 0].astype(jnp.float32)

    d_vec = xyz[None, :, :] - xt[:, None, :]          # (TI, N, 3)
    dist = jnp.sqrt(jnp.sum(d_vec**2, axis=-1) + EPS)
    unit = d_vec / dist[..., None]                    # u[t, i] = (x_i - x_t)/d

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_i, n), 0) + t * tile_i
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_i, n), 1)
    adj = (dist < cutoff).astype(jnp.float32)
    adj = adj * (row_ids != col_ids).astype(jnp.float32)
    adj = adj * mt[:, None] * m[None, :]

    rbf = painn_radial_basis(dist, n_rbf, cutoff)
    rbf = jnp.concatenate([rbf, jnp.ones_like(rbf[..., :1])], -1)
    env = cosine_envelope(dist, cutoff)
    k = adj[..., None] * env[..., None] * rbf         # (TI, N, R+1)

    w = w_ref[:]                                      # (R+1, S, F)
    phi = phi_ref[0]                                  # (N, S, F) all nodes
    v = v_ref[0]                                      # (N, 3, F)
    gs = gs_ref[0]                                    # (N, F) upstream
    gv = gv_ref[0]                                    # (N, 3, F)
    phi_t = phi_t_ref[0]                              # (TI, S, F) tile
    v_t = v_t_ref[0]                                  # (TI, 3, F)
    gv_t = gv_t_ref[0]                                # (TI, 3, F)

    k_mat = k.transpose(0, 2, 1).reshape(tile_i * r_aug, n)

    def contract(x):                                  # (N, F) -> (TI, R+1, F)
        out = jnp.dot(k_mat, x, preferred_element_type=jnp.float32)
        return out.reshape(tile_i, r_aug, f)

    def fold(g, ws):                                  # (TI,R+1,F),(R+1,F)->(TI,F)
        return jnp.sum(g * ws[None], axis=1)

    # receiver-index cotangent of the cross channel at every node:
    # dv_i += v_i x w3_i  =>  d_w3_i = gv_i x v_i  (b_bar = c_bar x a)
    if cross:
        gam3 = _cross_df(gv, v)                       # (N, 3, F)
        gam3_t = _cross_df(gv_t, v_t)                 # tile view for d_w

    # ---- per-basis contractions of the upstream cotangents (tile = sender)
    g1 = contract(gs)                                 # scalar channel
    dphi1 = fold(g1, w[:, 1])

    dphi2 = jnp.zeros((tile_i, f), jnp.float32)
    a0 = []                                           # fold(contract(gv_d), w0)
    a3 = []
    g2_acc = jnp.zeros((tile_i, r_aug, f), jnp.float32)
    g0_acc = jnp.zeros((tile_i, r_aug, f), jnp.float32)
    g3_acc = jnp.zeros((tile_i, r_aug, f), jnp.float32)
    for d in range(3):
        gv_d = gv[:, d, :]
        # unit channel: u_{i<-j} = -u_rows  (antisymmetric)
        kd = (k * (-unit[..., d][..., None])).transpose(0, 2, 1).reshape(
            tile_i * r_aug, n
        )
        g2_d = jnp.dot(kd, gv_d, preferred_element_type=jnp.float32).reshape(
            tile_i, r_aug, f
        )
        g2_acc = g2_acc + g2_d
        dphi2 = dphi2 + fold(g2_d, w[:, 2])
        g0_d = contract(gv_d)
        # NOTE expand_dims, not [:, d, None, :]: mixed None+slice bracket
        # indexing lowers to an unsupported >2D gather in Mosaic
        vt_d = jnp.expand_dims(v_t[:, d, :], 1)
        g0_acc = g0_acc + g0_d * vt_d                 # for d_w0
        a0.append(fold(g0_d, w[:, 0]))
        if cross:
            g3_d = contract(gam3[:, d, :])
            g3_acc = g3_acc + g3_d * vt_d
            a3.append(fold(g3_d, w[:, 3]))

    # d_phi (tile as sender)
    dphi0 = sum(v_t[:, d, :] * a0[d] for d in range(3))
    parts = [dphi0, dphi1, dphi2]
    if cross:
        parts.append(sum(v_t[:, d, :] * a3[d] for d in range(3)))
    dphi_ref[0] = jnp.stack(parts, axis=1)            # (TI, S, F)

    # d_v: sender side (ch0 [+ch3]) + receiver side of the cross
    dv = []
    if cross:
        # forward w3 aggregate at the tile's nodes as receivers
        w3_agg = [fold(contract(phi[:, 3] * v[:, d]), w[:, 3])
                  for d in range(3)]
    for d in range(3):
        val = phi_t[:, 0, :] * a0[d]
        if cross:
            val = val + phi_t[:, 3, :] * a3[d]
        dv.append(val)
    if cross:
        # a_bar = b x c_bar  with a = v_i, b = w3_agg, c_bar = gv
        gvt_d = [gv_t[:, d, :] for d in range(3)]
        dv[0] = dv[0] + w3_agg[1] * gvt_d[2] - w3_agg[2] * gvt_d[1]
        dv[1] = dv[1] + w3_agg[2] * gvt_d[0] - w3_agg[0] * gvt_d[2]
        dv[2] = dv[2] + w3_agg[0] * gvt_d[1] - w3_agg[1] * gvt_d[0]
    dv_ref[0] = jnp.stack(dv, axis=1)                 # (TI, 3, F)

    # ---- d_w[r, ch, f] = sum_j G_ch[j, r, f] * payload_ch[j, f]
    def pt(ch):  # (TI, 1, F) tile payload; expand_dims for Mosaic
        return jnp.expand_dims(phi_t[:, ch, :], 1)

    dw1 = jnp.sum(g1 * pt(1), axis=0)                        # (R+1, F)
    dw2 = jnp.sum(g2_acc * pt(2), axis=0)
    dw0 = jnp.sum(g0_acc * pt(0), axis=0)
    dw_parts = [dw0, dw1, dw2]
    if cross:
        dw_parts.append(jnp.sum(g3_acc * pt(3), axis=0))
    dw = jnp.stack(dw_parts, axis=1)                  # (R+1, S, F)

    first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)

    @pl.when(first)
    def _init():
        dw_ref[...] = dw

    @pl.when(jnp.logical_not(first))
    def _acc():
        dw_ref[...] = dw_ref[...] + dw


def _bwd_call(xyz, mask, phi, v, w, gs, gv, cutoff, n_rbf, tile_i, interpret):
    b, n, s, f = phi.shape
    cross = s == 4
    mask = mask.astype(jnp.float32)
    n_pad = _round_up(n, tile_i)
    if n_pad != n:
        pad = n_pad - n
        xyz = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        phi = jnp.pad(phi, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))
        gs = jnp.pad(gs, ((0, 0), (0, pad), (0, 0)))
        gv = jnp.pad(gv, ((0, 0), (0, pad), (0, 0), (0, 0)))

    kernel = functools.partial(
        _bwd_kernel, cutoff=cutoff, n_rbf=n_rbf, tile_i=tile_i, cross=cross
    )
    grid = (b, n_pad // tile_i)
    r_aug = n_rbf + 1
    d_phi, d_v, d_w = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, 3), lambda b_, t: (b_, 0, 0)),
            pl.BlockSpec((1, tile_i, 3), lambda b_, t: (b_, t, 0)),
            pl.BlockSpec((1, n_pad, 1), lambda b_, t: (b_, 0, 0)),
            pl.BlockSpec((1, tile_i, 1), lambda b_, t: (b_, t, 0)),
            pl.BlockSpec((1, n_pad, s, f), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec((1, tile_i, s, f), lambda b_, t: (b_, t, 0, 0)),
            pl.BlockSpec((1, n_pad, 3, f), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec((1, tile_i, 3, f), lambda b_, t: (b_, t, 0, 0)),
            pl.BlockSpec((n_rbf + 1, s, f), lambda b_, t: (0, 0, 0)),
            pl.BlockSpec((1, n_pad, f), lambda b_, t: (b_, 0, 0)),
            pl.BlockSpec((1, tile_i, f), lambda b_, t: (b_, t, 0)),
            pl.BlockSpec((1, n_pad, 3, f), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec((1, tile_i, 3, f), lambda b_, t: (b_, t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_i, s, f), lambda b_, t: (b_, t, 0, 0)),
            pl.BlockSpec((1, tile_i, 3, f), lambda b_, t: (b_, t, 0, 0)),
            pl.BlockSpec((n_rbf + 1, s, f), lambda b_, t: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, s, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 3, f), jnp.float32),
            jax.ShapeDtypeStruct((r_aug, s, f), jnp.float32),
        ],
        interpret=interpret,
    )(xyz, xyz, mask[..., None], mask[..., None], phi, phi, v, v, w,
      gs, gs, gv, gv)
    return d_phi[:, :n], d_v[:, :n], d_w


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def message_vmem_mb(n: int, s: int, f: int, n_rbf: int, tile_i: int = 8) -> float:
    """Estimated VMEM footprint (MB) of the BACKWARD kernel's resident
    blocks (the binding one): whole-node phi/v/gs/gv + tile views + the
    per-basis accumulators + two w-sized buffers. Used to refuse shapes
    that would fail the 16 MB scoped-VMEM Mosaic compile after minutes."""
    n_pad = _round_up(n, tile_i)
    r_aug = n_rbf + 1
    floats = (
        n_pad * f * (s + 3 + 1 + 3)        # phi, v, gs, gv (whole graph)
        + tile_i * f * (2 * s + 4 * 3)     # tile views + dphi/dv outputs
        + 3 * tile_i * r_aug * f           # g0/g2/g3 accumulators
        + 2 * r_aug * s * f                # w + dw
        + tile_i * n_pad * (r_aug + 5)     # k, k_mat, geometry rows
    )
    return floats * 4 / 2**20


def _fused_call(xyz, mask, phi, v, w, cutoff, n_rbf, tile_i, interpret):
    b, n, s, f = phi.shape
    cross = s == 4
    mask = mask.astype(jnp.float32)
    n_pad = _round_up(n, tile_i)
    if n_pad != n:
        pad = n_pad - n
        xyz = jnp.pad(xyz, ((0, 0), (0, pad), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad)))
        phi = jnp.pad(phi, ((0, 0), (0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0)))

    kernel = functools.partial(
        _fused_kernel, cutoff=cutoff, n_rbf=n_rbf, tile_i=tile_i, cross=cross
    )
    grid = (b, n_pad // tile_i)
    ds, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, n_pad, 3), lambda b_, t: (b_, 0, 0)),
            pl.BlockSpec((1, tile_i, 3), lambda b_, t: (b_, t, 0)),
            pl.BlockSpec((1, n_pad, 1), lambda b_, t: (b_, 0, 0)),
            pl.BlockSpec((1, tile_i, 1), lambda b_, t: (b_, t, 0)),
            pl.BlockSpec((1, n_pad, s, f), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec((1, n_pad, 3, f), lambda b_, t: (b_, 0, 0, 0)),
            pl.BlockSpec((1, tile_i, 3, f), lambda b_, t: (b_, t, 0, 0)),
            pl.BlockSpec((n_rbf + 1, s, f), lambda b_, t: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_i, f), lambda b_, t: (b_, t, 0)),
            pl.BlockSpec((1, tile_i, 3, f), lambda b_, t: (b_, t, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, f), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 3, f), jnp.float32),
        ],
        interpret=interpret,
    )(xyz, xyz, mask[..., None], mask[..., None], phi, v, v, w)
    return ds[:, :n], dv[:, :n]


# ------------------------------------------------------------- public API
@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_message(
    xyz: Array, mask: Array, phi: Array, v: Array, w: Array,
    cutoff: float, n_rbf: int, tile_i: int = 8, interpret: bool = False,
) -> Tuple[Array, Array]:
    """Fused factored message: (ds (B,N,F), dv (B,N,3,F)).

    phi: (B, N, S, F) pre-split per-node features (S=3 painn, S=4 cross);
    w: (R+1, S, F) filter weights (last basis row = bias channel).

    Whole-graph-in-VMEM kernel: refuses shapes whose node blocks exceed
    the scoped-VMEM budget (the Mosaic compile would fail after minutes);
    use the einsum XLA form (`message_impl="einsum"`) at those sizes.
    """
    if not interpret:
        vmem = message_vmem_mb(phi.shape[1], phi.shape[2], phi.shape[3],
                               n_rbf, tile_i)
        if vmem > 12.0:
            raise ValueError(
                f"fused_message VMEM-infeasible at N={phi.shape[1]} "
                f"F={phi.shape[3]} (~{vmem:.0f} MB node blocks > 16 MB "
                "scoped VMEM); use message_impl='einsum' at this size"
            )
    return _fused_call(xyz, mask, phi, v, w, cutoff, n_rbf, tile_i, interpret)


def _fused_fwd(xyz, mask, phi, v, w, cutoff, n_rbf, tile_i, interpret):
    out = _fused_call(xyz, mask, phi, v, w, cutoff, n_rbf, tile_i, interpret)
    return out, (xyz, mask, phi, v, w)


def _fused_bwd(cutoff, n_rbf, tile_i, interpret, res, g):
    xyz, mask, phi, v, w = res
    gs, gv = g
    d_phi, d_v, d_w = _bwd_call(
        xyz, mask, phi, v, w, gs, gv, cutoff, n_rbf, tile_i, interpret
    )
    # geometry receives zero cotangent by contract (module docstring)
    return jnp.zeros_like(xyz), None, d_phi, d_v, d_w


fused_message.defvjp(_fused_fwd, _fused_bwd)
