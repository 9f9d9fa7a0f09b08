"""Training smoke + sharding parity tests."""
import jax
import numpy as np
import pytest

from coarsegrainingvae_tpu.config import (
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    TrainConfig,
)
from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
from coarsegrainingvae_tpu.parallel.mesh import make_mesh
from coarsegrainingvae_tpu.train.trainer import Trainer
from coarsegrainingvae_tpu.train.controller import (
    EarlyStopping,
    LowessPlateauController,
    lowess_smooth,
)


def _cfg(batch_size=8, nepochs=2):
    return ExperimentConfig(
        # f32 pinned: multi-device parity asserts near-exact agreement
        model=ModelConfig(
            n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
            enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
            compute_dtype="float32",
        ),
        data=DataConfig(batch_size=batch_size, seed=0),
        train=TrainConfig(nepochs=nepochs, lr=1e-3, beta=0.05, gamma=1.0,
                          grad_clip=0.01),
    )


def test_train_step_decreases_loss(small_dataset):
    cfg = _cfg()
    model = CGequiVAE(cfg=cfg.model)
    trainer = Trainer(model, cfg, mesh=make_mesh(1))
    batch = small_dataset.batch(np.arange(8))
    state = trainer.init_state(batch, seed=0)

    rng = jax.random.PRNGKey(0)
    first = None
    last = None
    for i in range(12):
        state, metrics = trainer.train_step(state, batch, jax.random.fold_in(rng, i))
        loss = float(metrics["loss"])
        if first is None:
            first = loss
        last = loss
    assert np.isfinite(last)
    assert last < first, (first, last)


def test_multidevice_matches_single_device(small_dataset):
    """pjit single- vs 8-device numerical parity (SURVEY.md section 4f)."""
    cfg = _cfg(batch_size=8)
    model = CGequiVAE(cfg=cfg.model)
    batch = small_dataset.batch(np.arange(8))
    rng = jax.random.PRNGKey(3)

    t1 = Trainer(model, cfg, mesh=make_mesh(1))
    t8 = Trainer(model, cfg, mesh=make_mesh(8))
    s1 = t1.init_state(batch, seed=0)
    s8 = t8.init_state(batch, seed=0)

    for i in range(3):
        s1, m1 = t1.train_step(s1, batch, jax.random.fold_in(rng, i))
        s8, m8 = t8.train_step(s8, batch, jax.random.fold_in(rng, i))

    np.testing.assert_allclose(
        float(m1["loss"]), float(m8["loss"]), rtol=2e-4, atol=1e-5
    )
    l1 = jax.tree.leaves(jax.device_get(s1.params))
    l8 = jax.tree.leaves(jax.device_get(s8.params))
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_skip_guard_zeroes_update(small_dataset):
    """A batch with absurd coordinates (NaN loss) must not corrupt params."""
    cfg = _cfg()
    model = CGequiVAE(cfg=cfg.model)
    trainer = Trainer(model, cfg, mesh=make_mesh(1))
    batch = small_dataset.batch(np.arange(8))
    state = trainer.init_state(batch, seed=0)
    params_before = jax.device_get(state.params)

    bad = batch.replace(xyz=batch.xyz * np.nan)
    state, metrics = trainer.train_step(state, bad, jax.random.PRNGKey(0))
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(
        jax.tree.leaves(params_before), jax.tree.leaves(jax.device_get(state.params))
    ):
        np.testing.assert_array_equal(a, b)


def test_skip_guard_catches_finite_loss_nan_grad(small_dataset):
    """A finite loss whose GRADIENT is non-finite must also be skipped --
    the hole that poisoned the full-size chignolin -zeta run: the
    reference-style guard (utils.py:145-148) only inspects the loss, so
    one inf-gradient step NaN'd the params and tripped the NaN abort."""
    import jax.numpy as jnp

    cfg = _cfg()
    model = CGequiVAE(cfg=cfg.model)

    class PoisonGradTrainer(Trainer):
        def _loss_fn(self, params, batch, rng, zeta_scale=None):
            loss, metrics = super()._loss_fn(params, batch, rng, zeta_scale)
            # value 0 (finite), derivative 0.5/sqrt(0) = inf
            s = jax.tree.leaves(params)[0].sum()
            poison = jnp.sqrt(s - jax.lax.stop_gradient(s))
            return loss + poison, metrics

    trainer = PoisonGradTrainer(model, cfg, mesh=make_mesh(1))
    batch = small_dataset.batch(np.arange(8))
    state = trainer.init_state(batch, seed=0)
    params_before = jax.device_get(state.params)
    moments_before = jax.device_get(state.opt_state)

    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))  # the loss itself was fine
    assert float(metrics["skipped"]) == 1.0
    for a, b in zip(
        jax.tree.leaves(params_before), jax.tree.leaves(jax.device_get(state.params))
    ):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(
        jax.tree.leaves(moments_before),
        jax.tree.leaves(jax.device_get(state.opt_state)),
    ):
        np.testing.assert_array_equal(a, b)


def test_lowess_smooth_reduces_noise():
    rng = np.random.default_rng(0)
    x = np.linspace(0, 1, 60)
    y = 1.0 - x + rng.normal(scale=0.05, size=60)
    sm = lowess_smooth(y, frac=0.3)
    resid_raw = np.abs(y - (1 - x)).mean()
    resid_sm = np.abs(sm - (1 - x)).mean()
    assert resid_sm < resid_raw


def test_plateau_controller_decays_lr():
    c = LowessPlateauController(lr=1.0, factor=0.5, patience=1, min_lr=1e-3)
    for _ in range(12):
        c.step(1.0)  # flat -> no improvement
    assert c.lr < 1.0


def test_early_stopping():
    e = EarlyStopping(patience=2)
    for v in [1.0, 0.9, 0.95, 0.96, 0.97]:
        e(v)
    assert e.early_stop


def test_adam_compact_f32_matches_optax():
    """scale_by_adam_compact at float32 reproduces optax.scale_by_adam
    exactly; at bfloat16 it tracks it closely (moment rounding only)."""
    import jax
    import jax.numpy as jnp
    import optax

    from coarsegrainingvae_tpu.train.trainer import scale_by_adam_compact

    params = {
        "w": jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)),
                         jnp.float32),
        "b": jnp.asarray(np.random.default_rng(1).normal(size=(8,)),
                         jnp.float32),
    }
    ref = optax.scale_by_adam()
    for dtype, tol in ((jnp.float32, 1e-6), (jnp.bfloat16, 5e-2)):
        mine = scale_by_adam_compact(moment_dtype=dtype)
        s_ref, s_mine = ref.init(params), mine.init(params)
        for leaf in jax.tree.leaves(s_mine.mu):
            assert leaf.dtype == dtype
        for step in range(5):
            g = jax.tree.map(
                lambda p: jnp.asarray(
                    np.random.default_rng(step).normal(size=p.shape),
                    jnp.float32,
                ),
                params,
            )
            u_ref, s_ref = ref.update(g, s_ref, params)
            u_mine, s_mine = mine.update(g, s_mine, params)
            for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_mine)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=tol, atol=tol)


def test_trainer_bf16_adam_moments_trains(small_dataset):
    """adam_moment_dtype='bfloat16' end-to-end: loss decreases, moments are
    stored bf16."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from coarsegrainingvae_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
    from coarsegrainingvae_tpu.train.trainer import Trainer

    cfg = ExperimentConfig(
        model=ModelConfig(n_cgs=3, n_basis=32, n_rbf=5, atom_cutoff=8.5,
                          cg_cutoff=9.5, enc_nconv=1, dec_nconv=1,
                          dec_type="painn"),
        data=DataConfig(batch_size=8, seed=0),
        train=TrainConfig(lr=3e-3, beta=0.01, gamma=1.0,
                          adam_moment_dtype="bfloat16"),
    )
    tr = Trainer(CGequiVAE(cfg=cfg.model), cfg)
    batch = small_dataset.batch(np.arange(8))
    state = tr.init_state(batch, seed=0)
    mus = [l for l in jax.tree.leaves(state.opt_state)
           if getattr(l, "dtype", None) == jnp.bfloat16]
    assert mus, "no bfloat16 moment leaves found"
    losses = []
    for i in range(6):
        state, m = tr.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(jax.device_get(m["loss"])))
    assert losses[-1] < losses[0]


def test_lr_warmup_scales_first_update(small_dataset):
    """lr_warmup=N: the step-0 parameter update is exactly 1/N of the
    unwarmed update (same init/batch/rng); lr_warmup=0 is the default
    reference behavior."""
    import jax
    import numpy as np

    from coarsegrainingvae_tpu.config import (
        DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
    )
    from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
    from coarsegrainingvae_tpu.parallel.mesh import make_mesh
    from coarsegrainingvae_tpu.train.trainer import Trainer

    def mk(warm):
        cfg = ExperimentConfig(
            model=ModelConfig(
                n_cgs=3, n_basis=16, n_rbf=4, atom_cutoff=8.5, cg_cutoff=9.5,
                enc_nconv=1, dec_nconv=1, dec_type="pseudo", breaksym=True,
                compute_dtype="float32",
            ),
            data=DataConfig(batch_size=4, seed=0),
            train=TrainConfig(nepochs=1, lr=1e-3, beta=0.05, gamma=1.0,
                              lr_warmup=warm),
        )
        return Trainer(CGequiVAE(cfg=cfg.model), cfg, mesh=make_mesh(1))

    batch = small_dataset.batch(np.arange(4))
    rng = jax.random.PRNGKey(0)
    t0, t4 = mk(0), mk(4)
    s0 = t0.init_state(batch, seed=0)
    s4 = t4.init_state(batch, seed=0)
    # train_step donates the state: snapshot init params first
    init = [np.asarray(p).copy() for p in jax.tree.leaves(s0.params)]
    n0, _ = t0.train_step(s0, batch, rng)
    n4, _ = t4.train_step(s4, batch, rng)
    for p_init, a, b in zip(
        init, jax.tree.leaves(n0.params), jax.tree.leaves(n4.params),
    ):
        d0 = np.asarray(a) - np.asarray(p_init)
        d4 = np.asarray(b) - np.asarray(p_init)
        np.testing.assert_allclose(d4, d0 / 4.0, rtol=1e-4, atol=1e-7)
