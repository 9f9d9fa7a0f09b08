"""Atom-sharded message passing with halo exchange: 1-vs-N parity.

SURVEY.md section 2.11 stretch row (parallel/halo.py): the sharded pass
over a virtual CPU mesh must reproduce the unsharded sparse message
block exactly, including at the spike-protein smoke scale (10k atoms).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.data.neighbors import make_directed, radius_graph_dense
from coarsegrainingvae_tpu.models.conv import EquiMessageBlock
from coarsegrainingvae_tpu.parallel.halo import (
    halo_message,
    make_atom_mesh,
    plan_halo,
)


def _receiver_sorted(edges: np.ndarray) -> np.ndarray:
    return edges[np.argsort(edges[:, 0], kind="stable")]


def _cloud(n, cutoff, seed, density=0.05):
    """Uniform box sized for ~constant density, so slab width >> cutoff."""
    rng = np.random.default_rng(seed)
    side = (n / density) ** (1 / 3)
    # elongate the x axis: slabs are cut along the longest extent
    xyz = rng.uniform(0, 1, (n, 3)) * np.array([3 * side, side, side])
    edges = make_directed(radius_graph_dense(xyz, cutoff))
    return xyz.astype(np.float32), _receiver_sorted(edges)


def _reference(module, params, s, v, xyz, edges):
    r_ij = xyz[edges[:, 1]] - xyz[edges[:, 0]]
    return module.apply({"params": params}, jnp.asarray(s), jnp.asarray(v),
                        jnp.asarray(r_ij), jnp.asarray(edges), None)


def _run_parity(n, n_shards, cutoff, feat_dim, halo_frac=0.5, seed=0):
    xyz, edges = _cloud(n, cutoff, seed)
    rng = np.random.default_rng(seed + 1)
    s = rng.normal(size=(n, feat_dim)).astype(np.float32)
    v = rng.normal(size=(n, 3, feat_dim)).astype(np.float32)

    module = EquiMessageBlock(
        feat_dim=feat_dim, activation="swish", n_rbf=6, cutoff=cutoff,
        edges_sorted=True,
    )
    r_ij = jnp.asarray(xyz[edges[:, 1]] - xyz[edges[:, 0]])
    params = module.init(
        jax.random.PRNGKey(0), jnp.asarray(s), jnp.asarray(v), r_ij,
        jnp.asarray(edges), None,
    )["params"]
    ds_ref, dv_ref = _reference(module, params, s, v, xyz, edges)

    plan = plan_halo(xyz, edges, n_shards, halo=int(n // n_shards * halo_frac))
    mesh = make_atom_mesh(n_shards)
    ds_h, dv_h = halo_message(
        module, params,
        jnp.asarray(s[plan.order]), jnp.asarray(v[plan.order]),
        jnp.asarray(xyz[plan.order]), plan, mesh,
    )
    # outputs come back in sharded (spatially sorted) order
    ds_h = np.asarray(jax.device_get(ds_h))[plan.inv_order]
    dv_h = np.asarray(jax.device_get(dv_h))[plan.inv_order]
    np.testing.assert_allclose(ds_h, np.asarray(ds_ref), rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(dv_h, np.asarray(dv_ref), rtol=2e-5, atol=2e-5)
    return plan


def test_halo_parity_small():
    plan = _run_parity(n=256, n_shards=4, cutoff=3.0, feat_dim=16)
    # the plan actually has cross-shard edges (the exchange is exercised)
    ext_local_lo, ext_local_hi = plan.halo, plan.halo + plan.shard_size
    senders = plan.edges[..., 1][plan.edge_mask]
    assert ((senders < ext_local_lo) | (senders >= ext_local_hi)).any()


def test_halo_parity_eight_shards():
    _run_parity(n=512, n_shards=8, cutoff=2.5, feat_dim=8, seed=3)


def test_halo_rejects_undersized_halo():
    xyz, edges = _cloud(256, cutoff=3.0, seed=1)
    with pytest.raises(ValueError, match="halo"):
        plan_halo(xyz, edges, n_shards=4, halo=1)


def test_halo_parity_spike_scale():
    """The 10k-atom spike smoke config (DESIGN.md): 8-way atom sharding
    reproduces the single-device message pass."""
    _run_parity(n=10_000, n_shards=8, cutoff=2.0, feat_dim=8, seed=7)


def test_halo_stack_parity_multilayer():
    """3-layer (message+update) stack: per-layer halo refresh reproduces
    the unsharded EquiStack exactly -- the property that lets a full
    encoder run atom-sharded."""
    from coarsegrainingvae_tpu.parallel.halo import (
        EquiStack,
        halo_stack_apply,
    )

    n, n_shards, cutoff, feat_dim = 512, 4, 2.5, 8
    xyz, edges = _cloud(n, cutoff, seed=11)
    rng = np.random.default_rng(12)
    s = rng.normal(size=(n, feat_dim)).astype(np.float32)
    v = rng.normal(size=(n, 3, feat_dim)).astype(np.float32)

    kw = dict(n_conv=3, feat_dim=feat_dim, n_rbf=6, activation="swish",
              cutoff=cutoff)
    stack = EquiStack(**kw)
    params = stack.init(
        jax.random.PRNGKey(0), jnp.asarray(s), jnp.asarray(v),
        jnp.asarray(xyz), jnp.asarray(edges), None,
    )["params"]
    s_ref, v_ref = stack.apply(
        {"params": params}, jnp.asarray(s), jnp.asarray(v),
        jnp.asarray(xyz), jnp.asarray(edges), None,
    )

    plan = plan_halo(xyz, edges, n_shards, halo=n // n_shards // 2)
    mesh = make_atom_mesh(n_shards)
    s_h, v_h = halo_stack_apply(
        kw, params,
        jnp.asarray(s[plan.order]), jnp.asarray(v[plan.order]),
        jnp.asarray(xyz[plan.order]), plan, mesh,
    )
    s_h = np.asarray(jax.device_get(s_h))[plan.inv_order]
    v_h = np.asarray(jax.device_get(v_h))[plan.inv_order]
    np.testing.assert_allclose(s_h, np.asarray(s_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(v_h, np.asarray(v_ref), rtol=2e-4, atol=2e-4)


def test_halo_stack_gradient_parity():
    """Training-path VJP of the multi-layer sharded stack matches the
    unsharded stack (params + input grads)."""
    from coarsegrainingvae_tpu.parallel.halo import (
        EquiStack,
        halo_stack_apply,
    )

    n, n_shards, cutoff, feat_dim = 256, 4, 3.0, 8
    xyz, edges = _cloud(n, cutoff, seed=13)
    rng = np.random.default_rng(14)
    s = rng.normal(size=(n, feat_dim)).astype(np.float32)
    v = rng.normal(size=(n, 3, feat_dim)).astype(np.float32)

    kw = dict(n_conv=2, feat_dim=feat_dim, n_rbf=6, activation="swish",
              cutoff=cutoff)
    stack = EquiStack(**kw)
    params = stack.init(
        jax.random.PRNGKey(0), jnp.asarray(s), jnp.asarray(v),
        jnp.asarray(xyz), jnp.asarray(edges), None,
    )["params"]
    plan = plan_halo(xyz, edges, n_shards, halo=n // n_shards // 2)
    mesh = make_atom_mesh(n_shards)

    def ref_loss(p):
        so, vo = stack.apply(
            {"params": p}, jnp.asarray(s), jnp.asarray(v),
            jnp.asarray(xyz), jnp.asarray(edges), None,
        )
        return jnp.sum(so**2) + jnp.sum(vo**2)

    def halo_loss(p):
        so, vo = halo_stack_apply(
            kw, p,
            jnp.asarray(s[plan.order]), jnp.asarray(v[plan.order]),
            jnp.asarray(xyz[plan.order]), plan, mesh,
        )
        return jnp.sum(so**2) + jnp.sum(vo**2)

    g_ref = jax.grad(ref_loss)(params)
    g_halo = jax.grad(halo_loss)(params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_halo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_halo_gradient_parity():
    """Gradients flow through the halo exchange (ppermute transposes to
    the reverse permutation) identically to the unsharded pass -- the
    property a TRAINING step over atom shards relies on."""
    n, n_shards, cutoff, feat_dim = 256, 4, 3.0, 8
    xyz, edges = _cloud(n, cutoff, seed=5)
    rng = np.random.default_rng(6)
    s = rng.normal(size=(n, feat_dim)).astype(np.float32)
    v = rng.normal(size=(n, 3, feat_dim)).astype(np.float32)

    module = EquiMessageBlock(
        feat_dim=feat_dim, activation="swish", n_rbf=6, cutoff=cutoff,
        edges_sorted=True,
    )
    r_ij = jnp.asarray(xyz[edges[:, 1]] - xyz[edges[:, 0]])
    params = module.init(
        jax.random.PRNGKey(0), jnp.asarray(s), jnp.asarray(v), r_ij,
        jnp.asarray(edges), None,
    )["params"]
    plan = plan_halo(xyz, edges, n_shards, halo=n // n_shards // 2)
    mesh = make_atom_mesh(n_shards)

    def ref_loss(p, s_in):
        ds, dv = _reference(module, p, s_in, v, xyz, edges)
        return jnp.sum(ds**2) + jnp.sum(dv**2)

    def halo_loss(p, s_in):
        ds, dv = halo_message(
            module, p, s_in[plan.order], jnp.asarray(v[plan.order]),
            jnp.asarray(xyz[plan.order]), plan, mesh,
        )
        return jnp.sum(ds**2) + jnp.sum(dv**2)

    g_ref = jax.grad(ref_loss, argnums=(0, 1))(params, jnp.asarray(s))
    g_halo = jax.grad(halo_loss, argnums=(0, 1))(params, jnp.asarray(s))
    for a, b in zip(jax.tree.leaves(g_ref[0]), jax.tree.leaves(g_halo[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(g_ref[1]), np.asarray(g_halo[1]), rtol=5e-4, atol=5e-5
    )


def test_halo_uneven_atom_count_ghost_padding():
    """N not divisible by n_shards: plan_halo pads with edge-less ghost
    atoms (plan.pad puts inputs in sharded order with zero ghost rows)
    and the sharded stack still matches the unsharded one on the real
    atoms."""
    from coarsegrainingvae_tpu.parallel.halo import (
        EquiStack,
        halo_stack_apply,
    )

    n, n_shards, cutoff, feat_dim = 500, 8, 2.5, 8  # 500 % 8 = 4
    xyz, edges = _cloud(n, cutoff, seed=21)
    rng = np.random.default_rng(22)
    s = rng.normal(size=(n, feat_dim)).astype(np.float32)
    v = rng.normal(size=(n, 3, feat_dim)).astype(np.float32)

    kw = dict(n_conv=2, feat_dim=feat_dim, n_rbf=6, activation="swish",
              cutoff=cutoff)
    stack = EquiStack(**kw)
    params = stack.init(
        jax.random.PRNGKey(0), jnp.asarray(s), jnp.asarray(v),
        jnp.asarray(xyz), jnp.asarray(edges), None,
    )["params"]
    s_ref, v_ref = stack.apply(
        {"params": params}, jnp.asarray(s), jnp.asarray(v),
        jnp.asarray(xyz), jnp.asarray(edges), None,
    )

    plan = plan_halo(xyz, edges, n_shards, halo=24)
    assert plan.n_padded == 504 and plan.shard_size == 63
    mesh = make_atom_mesh(n_shards)
    s_h, v_h = halo_stack_apply(
        kw, params,
        jnp.asarray(plan.pad(s)), jnp.asarray(plan.pad(v)),
        jnp.asarray(plan.pad(xyz)), plan, mesh,
    )
    s_h = np.asarray(jax.device_get(s_h))[plan.inv_order]
    v_h = np.asarray(jax.device_get(v_h))[plan.inv_order]
    np.testing.assert_allclose(s_h, np.asarray(s_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(v_h, np.asarray(v_ref), rtol=2e-4, atol=2e-4)
