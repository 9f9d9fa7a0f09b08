"""Fused Pallas pseudo-message kernel: parity with the jnp reference (which
itself is pinned against DenseEquiMessagePseudo), forward AND hand-derived
backward, in interpret mode (runs on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.ops.pallas_pseudo import (
    fused_pseudo_message,
    pseudo_reference,
)

B, M, F, R, CUT = 5, 3, 24, 6, 9.0


def _inputs(seed=0):
    rng = np.random.default_rng(seed)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    xyz = arr(B, M, 3) * 2.0
    mask = jnp.ones((B, M), jnp.float32)
    phi = arr(B, M, 9, F)
    s, sbar = arr(B, M, F), arr(B, M, F)
    v, vbar = arr(B, M, 3, F), arr(B, M, 3, F)
    w = arr(R + 1, 9, F) * 0.3
    return xyz, mask, phi, s, sbar, v, vbar, w


def test_reference_matches_module_math():
    """pseudo_reference == DenseEquiMessagePseudo given the matched factored
    filter parameterization."""
    from coarsegrainingvae_tpu.models.dense import dense_pairwise, radius_adjacency
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseEquiMessagePseudo

    xyz, mask, phi, s, sbar, v, vbar, w = _inputs(1)
    _, dist, unit = dense_pairwise(xyz)
    adj = radius_adjacency(dist, CUT)

    mod = DenseEquiMessagePseudo(feat_dim=F, activation="swish", n_rbf=R,
                                 cutoff=CUT, impl="stacked")
    params = mod.init(jax.random.PRNGKey(0), s, sbar, v, vbar, dist, unit, adj)
    # overwrite the module's params with the factored equivalents:
    # phi-MLP = identity is impossible, so instead drive the module with its
    # own params mapped onto reference inputs: extract its inv-message params
    p = params["params"]["DenseInvariantMessage_0"]
    de = p["DistanceEmbed_0"]["Dense_0"]["Dense_0"]
    w_mod = jnp.concatenate(
        [jnp.asarray(de["kernel"]).reshape(R, 9, F),
         jnp.asarray(de["bias"]).reshape(1, 9, F)], axis=0,
    )
    # the module's phi is its own MLP of s; reproduce it here
    from coarsegrainingvae_tpu.models.modules import Dense as DenseMod
    h = DenseMod(F, activation="swish").apply(
        {"params": p["Dense_0"]}, s)
    phi_mod = DenseMod(9 * F).apply({"params": p["Dense_1"]}, h)
    phi_mod = phi_mod.reshape(B, M, 9, F)

    out_mod = mod.apply(params, s, sbar, v, vbar, dist, unit, adj)
    out_ref = pseudo_reference(xyz, mask, phi_mod, s, sbar, v, vbar, w_mod,
                               CUT, R)
    for a, b in zip(out_mod, out_ref):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("tile_b", [2, 5])  # 5 exercises batch padding
def test_fused_forward_matches_reference(tile_b):
    inputs = _inputs(2)
    out_k = fused_pseudo_message(*inputs, CUT, R, tile_b, True)
    out_r = pseudo_reference(*inputs, CUT, R)
    for a, b in zip(out_k, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_backward_matches_reference():
    """Hand-derived Pallas VJP == autodiff of the jnp reference for every
    differentiable input (phi, s, sbar, v, vbar, w)."""
    inputs = _inputs(3)
    xyz, mask = inputs[:2]

    def loss_k(phi, s, sbar, v, vbar, w):
        outs = fused_pseudo_message(xyz, mask, phi, s, sbar, v, vbar, w,
                                    CUT, R, 2, True)
        return sum(jnp.sum(jnp.sin(o) * o) for o in outs)

    def loss_r(phi, s, sbar, v, vbar, w):
        outs = pseudo_reference(xyz, mask, phi, s, sbar, v, vbar, w, CUT, R)
        return sum(jnp.sum(jnp.sin(o) * o) for o in outs)

    args = inputs[2:]
    g_k = jax.grad(loss_k, argnums=tuple(range(6)))(*args)
    g_r = jax.grad(loss_r, argnums=tuple(range(6)))(*args)
    names = ["phi", "s", "sbar", "v", "vbar", "w"]
    for name, a, b in zip(names, g_k, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch for {name}",
        )


def test_masked_rows_contribute_nothing():
    xyz, mask, phi, s, sbar, v, vbar, w = _inputs(4)
    mask = mask.at[:, -1].set(0.0)
    out = fused_pseudo_message(xyz, mask, phi, s, sbar, v, vbar, w,
                               CUT, R, 2, True)
    ref = pseudo_reference(xyz, mask, phi, s, sbar, v, vbar, w, CUT, R)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_m6_bead_padding_parity():
    """M=6 (chignolin bead count) exercises the bead-axis padding path
    (Mosaic rejected raw M=6; beads pad to 8 with zero mask): values AND
    gradients still match the reference."""
    rng = np.random.default_rng(11)

    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))

    m = 6
    xyz = arr(B, m, 3) * 2.0
    mask = jnp.ones((B, m), jnp.float32)
    phi, s, sbar = arr(B, m, 9, F), arr(B, m, F), arr(B, m, F)
    v, vbar = arr(B, m, 3, F), arr(B, m, 3, F)
    w = arr(R + 1, 9, F) * 0.3

    outs_p = fused_pseudo_message(xyz, mask, phi, s, sbar, v, vbar, w,
                                  CUT, R, 4, True)
    outs_r = pseudo_reference(xyz, mask, phi, s, sbar, v, vbar, w, CUT, R)
    for a, b in zip(outs_p, outs_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)

    def loss(fn):
        def inner(phi_, s_, v_, w_):
            o = fn(xyz, mask, phi_, s_, sbar, v_, vbar, w_)
            return sum(jnp.sum(x**2) for x in o)
        return inner

    g_p = jax.grad(loss(lambda *a: fused_pseudo_message(*a, CUT, R, 4, True)),
                   argnums=(0, 1, 2, 3))(phi, s, v, w)
    g_r = jax.grad(loss(lambda *a: pseudo_reference(*a, CUT, R)),
                   argnums=(0, 1, 2, 3))(phi, s, v, w)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
