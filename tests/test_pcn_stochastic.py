"""StochasticPCN (CVAE backmapping, repo extension -- the reference PCN
at /root/reference/CoarseGrainingVAE/cgvae.py:516-594 is deterministic).

Pins: forward contract (mu/sigma/prior heads populated), exact SO(3)
equivariance of both recon and prior sampling (the latent is invariant),
KL wiring in the trainer, ensemble sampling diversity, and the CLI
surface (--stochastic) end to end.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from coarsegrainingvae_tpu.config import ModelConfig
from coarsegrainingvae_tpu.data.sidechain import build_pcn_dataset
from coarsegrainingvae_tpu.data.synthetic import synthetic_protein
from coarsegrainingvae_tpu.models.cgvae import PCN, StochasticPCN
from coarsegrainingvae_tpu.train.pcn_trainer import PCNTrainer


@pytest.fixture(scope="module")
def setup():
    items = [synthetic_protein(6 + (i % 3), seed=i) for i in range(8)]
    ds = build_pcn_dataset(items, cg_cutoff=12.0)
    cfg = ModelConfig(n_basis=16, n_rbf=5, atom_cutoff=12.0, dec_nconv=1,
                      enc_nconv=1, activation="swish")
    model = StochasticPCN(cfg=cfg)
    trainer = PCNTrainer(model, gamma=1.0, kappa=0.5, lr=5e-3, beta=0.05)
    batch, ca_mask, quads, qmask = next(ds.iter_batches(4))
    state = trainer.init_state(batch, ca_mask)
    return ds, model, trainer, state, (batch, ca_mask, quads, qmask)


def test_forward_contract(setup):
    ds, model, trainer, state, (batch, ca_mask, quads, qmask) = setup
    out = model.apply(
        {"params": state.params}, batch, jnp.asarray(ca_mask),
        rngs={"sample": jax.random.PRNGKey(0)},
    )
    bm = batch.cg_z.reshape(-1).shape[0]
    assert out.mu.shape == (bm, 16) and out.sigma.shape == (bm, 16)
    assert out.prior_mu.shape == (bm, 16)
    assert np.isfinite(np.asarray(out.xyz_recon)).all()
    assert (np.asarray(out.sigma) > 0).all()


def _rotate_batch(batch, R):
    return batch.replace(
        xyz=jnp.einsum("bnc,cd->bnd", batch.xyz, R),
        cg_xyz=jnp.einsum("blc,cd->bld", batch.cg_xyz, R),
    )


def test_equivariance_recon_and_generate(setup):
    ds, model, trainer, state, (batch, ca_mask, quads, qmask) = setup
    # a proper rotation
    a_ = 0.7
    R = jnp.asarray(
        [[np.cos(a_), -np.sin(a_), 0], [np.sin(a_), np.cos(a_), 0], [0, 0, 1]],
        jnp.float32,
    )
    key = jax.random.PRNGKey(3)
    for method in ("reconstruct_mean", "generate"):
        xr = model.apply({"params": state.params}, batch, jnp.asarray(ca_mask),
                         method=method, rngs={"sample": key})
        xr_rot = model.apply({"params": state.params}, _rotate_batch(batch, R),
                             jnp.asarray(ca_mask), method=method,
                             rngs={"sample": key})
        np.testing.assert_allclose(
            np.asarray(xr_rot), np.asarray(xr) @ np.asarray(R),
            rtol=0, atol=2e-3, err_msg=method,
        )


def test_train_step_with_kl(setup):
    ds, model, trainer, state, (batch, ca_mask, quads, qmask) = setup
    args = (batch, jnp.asarray(ca_mask), jnp.asarray(quads),
            jnp.asarray(qmask), jnp.asarray(1.0, jnp.float32))
    # the train step donates its input state: run it on a copy so the
    # module-scoped fixture state survives, and snapshot params first
    old = jax.device_get(state.params)
    state2 = jax.tree.map(jnp.array, state)
    new_state, metrics = trainer._train_step(state2, *args)
    m = jax.device_get(metrics)
    assert np.isfinite(m["loss"]) and np.isfinite(m["kl"])
    # params actually moved
    new = jax.device_get(new_state.params)
    moved = jax.tree_util.tree_reduce(
        lambda acc, ab: acc or bool(np.any(ab)),
        jax.tree.map(lambda a, b: np.any(np.asarray(a) != np.asarray(b)),
                     old, new),
        False,
    )
    assert moved


def test_sample_ensemble_diverse(setup):
    ds, model, trainer, state, (batch, ca_mask, quads, qmask) = setup
    ens = np.asarray(jax.device_get(
        trainer.sample_ensemble(state.params, batch, ca_mask, 4, seed=0)
    ))
    assert ens.shape == (4, batch.z.size, 3)
    assert np.isfinite(ens).all()
    # prior noise must produce distinct conformers
    assert np.abs(ens[0] - ens[1]).max() > 1e-5
    # deterministic PCN refuses ensemble sampling
    det = PCNTrainer(PCN(cfg=model.cfg), gamma=1.0, kappa=0.5, lr=5e-3)
    with pytest.raises(ValueError):
        det.sample_ensemble(state.params, batch, ca_mask, 2)


def test_run_pcn_cli_stochastic(tmp_path):
    from coarsegrainingvae_tpu.cli.run_pcn import main

    rows = main([
        "-logdir", str(tmp_path / "spcn"), "-ndata", "10",
        "-n_basis", "16", "-dec_nconv", "1", "-nepochs", "1",
        "-batch_size", "2", "-n_dump", "0", "--stochastic",
        "-beta", "0.01", "-n_ensemble", "3",
    ])
    assert rows
    for r in rows:
        assert np.isfinite(r["rmsd"])
        assert np.isfinite(r["sample_best_rmsd"])
        assert r["sample_best_rmsd"] <= r["sample_mean_rmsd"] + 1e-9
