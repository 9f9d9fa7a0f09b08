"""Fused chirality-aware (pseudo) message block as Pallas TPU kernels.

The 9-way pseudo message (reference conv.py:165-242 in /root/reference;
dense form models/dense_cgvae.DenseEquiMessagePseudo) runs on the CG graph
of M = n_cgs beads -- every tensor is tiny (M=3 for the dipeptide flagship),
so in XLA the block's cost is HLO-op-count / HBM-round-trip bound, not
FLOPs: step-level profiling on one v5e chip showed the 5-layer decoder at
~72% of the whole train step before the channel-stacked rewrite, and still
the dominant term after it. These kernels keep the ENTIRE pair pipeline --
geometry, radial basis, envelope, adjacency, per-channel filters, message
combination -- in VMEM:

    HBM reads : cg_xyz (B,M,3), mask (B,M), phi (B,M,9,F), s/sbar (B,M,F),
                v/vbar (B,M,3,F), w (R+1, 9, F)
    HBM writes: ds/dsbar (B,M,F), dv/dvbar (B,M,3,F)

and the BACKWARD is a second hand-derived Pallas kernel of the same
structure (d_w accumulated across sequential grid steps), so training gets
the fusion too -- no recompute-the-reference VJP.

Filter parameterization is the factored form (same as
models/dense.DenseFactoredEquiMessage): w[r, ch, f] with the last basis row
the bias, filt_ch(d) = env(d) * (sum_r rbf_r(d) w[r,ch] + w[R,ch]) --
exactly DistanceEmbed's function class (modules.py:175-197 in the
reference), mapped onto one (R+1, 9, F) tensor.

GRADIENT CONTRACT: the geometry inputs (cg_xyz, mask) receive ZERO
cotangent -- in every CGVAE model the decoder/prior/encoder graphs are
built from batch coordinates, which are data, never functions of params.
Do NOT use this kernel where coordinates require gradients (e.g. force
fields); the pure-jnp `pseudo_reference` differentiates fully.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from coarsegrainingvae_tpu.ops.basis import cosine_envelope, painn_radial_basis

Array = jnp.ndarray

EPS = 1e-3  # dense-family distance epsilon (models/dense.py)

# channel layout (conv.py:165-242 sender payloads):
#   0: ds gate       (payload 1, gated by s_i)
#   1: dv unit term
#   2: dv  . v_j     5: dvbar . vbar_j
#   3: dv  x vbar_j  6: dvbar . v_j (gated sbar_i)  7: dvbar x v_j
#   4: dv  . vbar_j (gated sbar_i)                  8: dvbar x vbar_j
_X_OF_CH = {2: "v", 3: "vbar", 4: "vbar", 5: "vbar", 6: "v", 7: "v", 8: "vbar"}


def _geometry(xyz, mask, cutoff, n_rbf):
    """Shared pair pipeline: (dist, unit, k) with k = adj*env*[rbf, 1]."""
    n = xyz.shape[-2]
    r_ij = xyz[..., None, :, :] - xyz[..., :, None, :]
    dist = jnp.sqrt(jnp.sum(r_ij**2, axis=-1) + EPS)
    unit = r_ij / dist[..., None]
    m = mask.astype(xyz.dtype)
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    adj = (dist < cutoff).astype(xyz.dtype)
    adj = adj * (row != col).astype(xyz.dtype)
    adj = adj * m[..., :, None] * m[..., None, :]
    rbf = painn_radial_basis(dist, n_rbf, cutoff)
    rbf = jnp.concatenate([rbf, jnp.ones_like(rbf[..., :1])], -1)
    env = cosine_envelope(dist, cutoff)
    k = (adj * env)[..., None] * rbf                  # (..., M, M, R+1)
    return dist, unit, adj, k


# --------------------------------------------------------------- reference
def pseudo_reference(
    xyz: Array,    # (B, M, 3)
    mask: Array,   # (B, M)
    phi: Array,    # (B, M, 9, F) pre-split per-node features
    s: Array, sbar: Array,        # (B, M, F)
    v: Array, vbar: Array,        # (B, M, 3, F)
    w: Array,      # (R+1, 9, F)
    cutoff: float,
    n_rbf: int,
) -> Tuple[Array, Array, Array, Array]:
    """Pure-jnp semantics of the fused kernel (fully differentiable)."""
    b, m = s.shape[:2]
    f = s.shape[-1]
    _, unit, adj, k = _geometry(xyz, mask, cutoff, n_rbf)

    filt = jnp.einsum("bijr,rcf->bijcf", k, w)        # (B,M,M,9,F)
    g = filt * phi[:, None, :, :, :]                  # sender j broadcast

    s0 = jnp.sum(g[..., 0, :], axis=2)
    ds = s * s0
    dsbar = jnp.sum(
        v * jnp.sum(adj[..., None, None] * vbar[:, None], axis=2), axis=2
    )
    u1 = jnp.sum(g[..., 1, None, :] * unit[..., :, None], axis=2)

    def agg(ch, x):   # sum_j g_ch[i,j,f] x[j,d,f]
        return jnp.einsum("bijf,bjdf->bidf", g[..., ch, :], x)

    def cx(a, c):
        from coarsegrainingvae_tpu.models.conv import cross3
        return cross3(a.reshape(b * m, 3, f), c.reshape(b * m, 3, f)).reshape(
            b, m, 3, f
        )

    gate = sbar[:, :, None, :]
    dv = u1 + agg(2, v) + cx(v, agg(3, vbar)) + gate * agg(4, vbar)
    dvbar = (
        agg(5, vbar) + gate * agg(6, v) + cx(v, agg(7, v))
        + cx(vbar, agg(8, vbar))
    )
    return ds, dsbar, dv, dvbar


# ----------------------------------------------------------- kernel helpers
# Mosaic (Pallas TPU) lowers only a restricted indexing vocabulary; every
# slice/broadcast below is an explicit lax/jnp op (mixed None+slice bracket
# indexing lowers to an unsupported >2D gather).
def _cross_d(a_d, b_d, d):
    """d-th component of a x b given per-axis component lists."""
    i, j = (d + 1) % 3, (d + 2) % 3
    return a_d[i] * b_d[j] - a_d[j] * b_d[i]


def _chunk(x, idx, f):
    """x (..., K*F) -> channel idx (..., F)."""
    return jax.lax.slice_in_dim(x, idx * f, (idx + 1) * f, axis=x.ndim - 1)


def _bcast_j(x):
    """(TB, M, F) sender tensor -> (TB, 1, M, F) for receiver broadcast."""
    return jnp.expand_dims(x, 1)


def _bcast_i(x):
    """(TB, M, F) receiver tensor -> (TB, M, 1, F) for sender broadcast."""
    return jnp.expand_dims(x, 2)


def _tile_forward(xyz, mask, phi, s, sbar, v_d, vb_d, w, cutoff, n_rbf, f):
    """Forward math for one (TB, M, ...) tile; v_d/vb_d are per-axis lists
    of (TB, M, F); phi is (TB, M, 9F). Returns (ds, dsbar, dv_d list,
    dvbar_d list) plus the intermediates the backward reuses."""
    tb, m = s.shape[:2]
    r_aug = n_rbf + 1
    _, unit, adj, k = _geometry(xyz, mask, cutoff, n_rbf)
    unit_d = [jax.lax.index_in_dim(unit, d, axis=3, keepdims=False)
              for d in range(3)]                      # 3 x (TB, M, M)
    adj_e = jnp.expand_dims(adj, -1)                  # (TB, M, M, 1)

    filt = jnp.dot(
        k.reshape(tb * m * m, r_aug), w,   # w pre-flattened (R+1, 9F):
        # Mosaic cannot shape-cast (R+1, 9, F) -> (R+1, 9F) in-kernel
        preferred_element_type=jnp.float32,
    ).reshape(tb, m, m, 9 * f)
    gch = [_chunk(filt, ch, f) * _bcast_j(_chunk(phi, ch, f))
           for ch in range(9)]                        # 9 x (TB, M, M, F)

    s0 = jnp.sum(gch[0], axis=2)
    ds = s * s0

    # dsbar = sum_d v_d . (sum_j adj vbar_d)
    t_d = [jnp.sum(adj_e * _bcast_j(vb_d[d]), axis=2) for d in range(3)]
    dsbar = sum(v_d[d] * t_d[d] for d in range(3))

    def agg(ch, x_d, d):                              # sum_j g_ch * x[j, d]
        return jnp.sum(gch[ch] * _bcast_j(x_d[d]), axis=2)

    u1_d = [jnp.sum(gch[1] * jnp.expand_dims(unit_d[d], -1), axis=2)
            for d in range(3)]
    a = {ch: [agg(ch, v_d if _X_OF_CH[ch] == "v" else vb_d, d)
              for d in range(3)]
         for ch in _X_OF_CH}

    dv_d = [
        u1_d[d] + a[2][d] + _cross_d(v_d, a[3], d) + sbar * a[4][d]
        for d in range(3)
    ]
    dvb_d = [
        a[5][d] + sbar * a[6][d] + _cross_d(v_d, a[7], d)
        + _cross_d(vb_d, a[8], d)
        for d in range(3)
    ]
    return ds, dsbar, dv_d, dvb_d, (unit_d, adj, k, filt, gch, s0, t_d, a)


def _fwd_kernel(xyz_ref, mask_ref, phi_ref, s_ref, sbar_ref, v_ref, vbar_ref,
                w_ref, ds_ref, dsbar_ref, dv_ref, dvbar_ref,
                *, cutoff: float, n_rbf: int, f: int):
    s, sbar = s_ref[...], sbar_ref[...]
    v, vbar = v_ref[...], vbar_ref[...]               # (TB, M, 3F) flat
    v_d = [_chunk(v, d, f) for d in range(3)]
    vb_d = [_chunk(vbar, d, f) for d in range(3)]
    mask = jax.lax.index_in_dim(mask_ref[...], 0, axis=2, keepdims=False)
    ds, dsbar, dv_d, dvb_d, _ = _tile_forward(
        xyz_ref[...], mask, phi_ref[...], s, sbar, v_d, vb_d,
        w_ref[...], cutoff, n_rbf, f,
    )
    ds_ref[...] = ds
    dsbar_ref[...] = dsbar
    dv_ref[...] = jnp.concatenate(dv_d, axis=-1)
    dvbar_ref[...] = jnp.concatenate(dvb_d, axis=-1)


def _bwd_kernel(xyz_ref, mask_ref, phi_ref, s_ref, sbar_ref, v_ref, vbar_ref,
                w_ref, gs_ref, gsb_ref, gv_ref, gvb_ref,
                dphi_ref, dsout_ref, dsbout_ref, dv_ref, dvbar_ref, dw_ref,
                *, cutoff: float, n_rbf: int, f: int):
    """Hand-derived VJP of the pseudo message, one batch tile per program.

    d_w accumulates across the (sequential) grid into a single block.
    All vector fields flow through flat (TB, M, 3F) layout."""
    tb, m = s_ref.shape[:2]
    r_aug = n_rbf + 1
    s, sbar = s_ref[...], sbar_ref[...]
    phi = phi_ref[...]
    v_d = [_chunk(v_ref[...], d, f) for d in range(3)]
    vb_d = [_chunk(vbar_ref[...], d, f) for d in range(3)]
    gv_d = [_chunk(gv_ref[...], d, f) for d in range(3)]
    gvb_d = [_chunk(gvb_ref[...], d, f) for d in range(3)]
    gs, gsb = gs_ref[...], gsb_ref[...]
    mask = jax.lax.index_in_dim(mask_ref[...], 0, axis=2, keepdims=False)

    # forward-lite recompute (all VMEM)
    _, _, _, _, saved = _tile_forward(
        xyz_ref[...], mask, phi, s, sbar, v_d, vb_d,
        w_ref[...], cutoff, n_rbf, f,
    )
    unit_d, adj, k, filt, gch, s0, t_d, a = saved

    # receiver-side cotangents Gamma_ch[i][d] (per-axis lists of (TB, M, F))
    gamma = {
        2: gv_d,
        3: [_cross_d(gv_d, v_d, d) for d in range(3)],
        4: [sbar * gv_d[d] for d in range(3)],
        5: gvb_d,
        6: [sbar * gvb_d[d] for d in range(3)],
        7: [_cross_d(gvb_d, v_d, d) for d in range(3)],
        8: [_cross_d(gvb_d, vb_d, d) for d in range(3)],
    }

    # node grads that do not flow through g
    dsout_ref[...] = s0 * gs
    dsbout_ref[...] = sum(
        sum(a[ch][d] * g_[d] for d in range(3))
        for ch, g_ in ((4, gv_d), (6, gvb_d))
    )

    # d_v / d_vbar: sender-side via g, receiver-side via crosses + dsbar path
    adj_t = jnp.swapaxes(adj, 1, 2)                    # adj[j, i] view
    adj_t_e = jnp.expand_dims(adj_t, -1)
    dv_out, dvb_out = [], []
    for d in range(3):
        dv_val = (
            # sender side: sum_i g_ch[i, j, f] * Gamma_ch[i, d, f]
            sum(jnp.sum(gch[ch] * _bcast_i(gamma[ch][d]), axis=1)
                for ch in (2, 6, 7))
            # receiver side of the crosses: dL/da = b x g
            + _cross_d(a[3], gv_d, d) + _cross_d(a[7], gvb_d, d)
            # dsbar = sum_d v_d . t_d
            + gsb * t_d[d]
        )
        dvb_val = (
            sum(jnp.sum(gch[ch] * _bcast_i(gamma[ch][d]), axis=1)
                for ch in (3, 4, 5, 8))
            + _cross_d(a[8], gvb_d, d)
            # dsbar path: d_vbar[j] = sum_i adj[i,j] v_d[i] gsb[i]
            + jnp.sum(adj_t_e * _bcast_j(v_d[d] * gsb), axis=2)
        )
        dv_out.append(dv_val)
        dvb_out.append(dvb_val)
    dv_ref[...] = jnp.concatenate(dv_out, axis=-1)
    dvbar_ref[...] = jnp.concatenate(dvb_out, axis=-1)

    # d_G per channel -> d_phi and d_w
    x_d = {"v": v_d, "vbar": vb_d}
    dg = [None] * 9
    dg[0] = jnp.broadcast_to(_bcast_i(s * gs), gch[0].shape)
    dg[1] = sum(_bcast_i(gv_d[d]) * jnp.expand_dims(unit_d[d], -1)
                for d in range(3))
    for ch in range(2, 9):
        xs = x_d[_X_OF_CH[ch]]
        dg[ch] = sum(_bcast_i(gamma[ch][d]) * _bcast_j(xs[d])
                     for d in range(3))

    # d_phi[j, ch, f] = sum_i dG_ch[i, j, f] * filt_ch[i, j, f]
    dphi_ref[...] = jnp.concatenate(
        [jnp.sum(dg[ch] * _chunk(filt, ch, f), axis=1) for ch in range(9)],
        axis=-1,
    )

    # d_w[r, ch, f] = sum_{b,i,j} k[i,j,r] * phi[j,ch,f] * dG_ch[i,j,f]
    e = jnp.concatenate(
        [dg[ch] * _bcast_j(_chunk(phi, ch, f)) for ch in range(9)], axis=-1,
    ).reshape(tb * m * m, 9 * f)
    dw = jnp.dot(
        k.reshape(tb * m * m, r_aug).T, e, preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = dw

    @pl.when(pl.program_id(0) != 0)
    def _acc():
        dw_ref[...] = dw_ref[...] + dw


# ------------------------------------------------------------- public API
def _pad_batch(arrs, b, tile_b):
    pad = (-b) % tile_b
    if pad == 0:
        return arrs, b
    return [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in arrs], b + pad


def _pad_beads(arrs, m, mult=8):
    """Pad the bead axis (axis 1) to a multiple of `mult`; padded beads have
    mask 0, so the adjacency zeroes every term they touch and the padded
    output rows are discarded by the caller. (Mosaic rejects some tiny odd
    second-minor sizes -- M=6 failed to compile where M=3 and M=8 lower
    fine.)"""
    pad = (-m) % mult
    if pad == 0:
        return arrs, m
    return (
        [jnp.pad(a, ((0, 0), (0, pad)) + ((0, 0),) * (a.ndim - 2))
         for a in arrs],
        m + pad,
    )


def _tile_b_budget(m: int, f: int, tile_b: int, mb: float = 5.0) -> int:
    """Clamp the batch tile so the dominant (tile_b, M, M, 9F) VMEM
    resident stays within ~mb MB (observed on-chip: M=8 at tile_b=8 is
    11 MB of filter alone and Mosaic fails the 16 MB scoped budget once
    the other operands are added; M=3 at tile_b=8 is fine)."""
    per_b = m * m * 9 * f * 4 / 2**20
    return max(1, min(tile_b, int(mb / max(per_b, 1e-9))))


def _fused_call(xyz, mask, phi, s, sbar, v, vbar, w, cutoff, n_rbf, tile_b,
                interpret):
    b, m_in = s.shape[:2]
    f = s.shape[-1]
    r_aug = n_rbf + 1
    tile_b = _tile_b_budget(m_in + (-m_in) % 8 if m_in > 3 else m_in,
                            f, tile_b)
    mask = mask.astype(jnp.float32)
    (xyz, mask, phi, s, sbar, v, vbar), m = _pad_beads(
        [xyz, mask, phi, s, sbar, v, vbar], m_in
    ) if m_in > 3 else ([xyz, mask, phi, s, sbar, v, vbar], m_in)
    (xyz, mask, phi, s, sbar, v, vbar), b_pad = _pad_batch(
        [xyz, mask, phi, s, sbar, v, vbar], b, tile_b
    )
    phi = phi.reshape(b_pad, m, 9 * f)
    v = v.reshape(b_pad, m, 3 * f)
    vbar = vbar.reshape(b_pad, m, 3 * f)
    w = w.reshape(r_aug, 9 * f)

    kernel = functools.partial(_fwd_kernel, cutoff=cutoff, n_rbf=n_rbf, f=f)
    grid = (b_pad // tile_b,)

    def tiled(shape):
        return pl.BlockSpec((tile_b,) + shape, lambda t: (t,) + (0,) * len(shape))

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tiled((m, 3)), tiled((m, 1)), tiled((m, 9 * f)),
            tiled((m, f)), tiled((m, f)),
            tiled((m, 3 * f)), tiled((m, 3 * f)),
            pl.BlockSpec((r_aug, 9 * f), lambda t: (0, 0)),
        ],
        out_specs=[
            tiled((m, f)), tiled((m, f)),
            tiled((m, 3 * f)), tiled((m, 3 * f)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, m, f), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, m, f), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, m, 3 * f), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, m, 3 * f), jnp.float32),
        ],
        interpret=interpret,
    )(xyz, mask[..., None], phi, s, sbar, v, vbar, w)
    ds, dsbar, dv, dvbar = (o[:b, :m_in] for o in outs)
    return (ds, dsbar, dv.reshape(b, m_in, 3, f),
            dvbar.reshape(b, m_in, 3, f))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def fused_pseudo_message(
    xyz: Array, mask: Array, phi: Array, s: Array, sbar: Array,
    v: Array, vbar: Array, w: Array,
    cutoff: float, n_rbf: int, tile_b: int = 8, interpret: bool = False,
) -> Tuple[Array, Array, Array, Array]:
    """Fused pseudo message: (ds, dsbar (B,M,F), dv, dvbar (B,M,3,F)).

    phi: (B, M, 9, F) pre-split per-node features; w: (R+1, 9, F) factored
    filter weights (last basis row = bias). xyz/mask receive ZERO gradient
    (see module docstring).
    """
    return _fused_call(xyz, mask, phi, s, sbar, v, vbar, w, cutoff, n_rbf,
                       tile_b, interpret)


def _vjp_fwd(xyz, mask, phi, s, sbar, v, vbar, w, cutoff, n_rbf, tile_b,
             interpret):
    out = _fused_call(xyz, mask, phi, s, sbar, v, vbar, w, cutoff, n_rbf,
                      tile_b, interpret)
    return out, (xyz, mask, phi, s, sbar, v, vbar, w)


def _vjp_bwd(cutoff, n_rbf, tile_b, interpret, res, cts):
    xyz, mask, phi, s, sbar, v, vbar, w = res
    gs, gsb, gv, gvb = cts
    b, m_in = s.shape[:2]
    f = s.shape[-1]
    r_aug = n_rbf + 1
    # the backward holds ~3x the forward's live VMEM (filt + g + dG + e);
    # a quarter-size batch tile keeps it under the 16 MB scoped limit
    tile_b = max(1, tile_b // 4)
    tile_b = _tile_b_budget(m_in + (-m_in) % 8 if m_in > 3 else m_in,
                            f, tile_b, mb=1.6)
    mask_f = mask.astype(jnp.float32)
    arrs = [xyz, mask_f, phi, s, sbar, v, vbar, gs, gsb, gv, gvb]
    if m_in > 3:
        arrs, m = _pad_beads(arrs, m_in)
    else:
        m = m_in
    (xyz_p, mask_p, phi_p, s_p, sbar_p, v_p, vbar_p,
     gs_p, gsb_p, gv_p, gvb_p), b_pad = _pad_batch(arrs, b, tile_b)
    phi_p = phi_p.reshape(b_pad, m, 9 * f)
    v_p = v_p.reshape(b_pad, m, 3 * f)
    vbar_p = vbar_p.reshape(b_pad, m, 3 * f)
    gv_p = gv_p.reshape(b_pad, m, 3 * f)
    gvb_p = gvb_p.reshape(b_pad, m, 3 * f)
    w_flat = w.reshape(r_aug, 9 * f)

    kernel = functools.partial(_bwd_kernel, cutoff=cutoff, n_rbf=n_rbf, f=f)
    grid = (b_pad // tile_b,)

    def tiled(shape):
        return pl.BlockSpec((tile_b,) + shape, lambda t: (t,) + (0,) * len(shape))

    d_phi, d_s, d_sbar, d_v, d_vbar, d_w = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            tiled((m, 3)), tiled((m, 1)), tiled((m, 9 * f)),
            tiled((m, f)), tiled((m, f)),
            tiled((m, 3 * f)), tiled((m, 3 * f)),
            pl.BlockSpec((r_aug, 9 * f), lambda t: (0, 0)),
            tiled((m, f)), tiled((m, f)),
            tiled((m, 3 * f)), tiled((m, 3 * f)),
        ],
        out_specs=[
            tiled((m, 9 * f)), tiled((m, f)), tiled((m, f)),
            tiled((m, 3 * f)), tiled((m, 3 * f)),
            pl.BlockSpec((r_aug, 9 * f), lambda t: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, m, 9 * f), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, m, f), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, m, f), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, m, 3 * f), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, m, 3 * f), jnp.float32),
            jax.ShapeDtypeStruct((r_aug, 9 * f), jnp.float32),
        ],
        interpret=interpret,
    )(xyz_p, mask_p[..., None], phi_p, s_p, sbar_p, v_p, vbar_p, w_flat,
      gs_p, gsb_p, gv_p, gvb_p)

    return (
        jnp.zeros_like(xyz),            # geometry: stop-grad by contract
        jnp.zeros_like(mask),
        d_phi[:b, :m_in].reshape(b, m_in, 9, f),
        d_s[:b, :m_in], d_sbar[:b, :m_in],
        d_v[:b, :m_in].reshape(b, m_in, 3, f),
        d_vbar[:b, :m_in].reshape(b, m_in, 3, f),
        d_w.reshape(r_aug, 9, f),
    )


fused_pseudo_message.defvjp(_vjp_fwd, _vjp_bwd)
