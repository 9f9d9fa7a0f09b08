"""PCN (protein backmapping) trainer — reference scripts/run_pdb.py +
pcn_utils.py in /root/reference.

Loss = recon + gamma * graph + kappa * dihedral (pcn_utils.py:185-193);
PCN is deterministic (no VAE), so there is no KL term on the live path.
Batches are padded multi-topology CGBatches from data/sidechain.py; the
dihedral term runs on the flattened batch graph with per-sample index
offsets folded in on device.
"""
from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from coarsegrainingvae_tpu.data.batch import CGBatch, flatten_ids
from coarsegrainingvae_tpu.data.sidechain import PCNDatasetArrays
from coarsegrainingvae_tpu.models.cgvae import flatten_batch
from coarsegrainingvae_tpu.ops.geometry import dihedral
from coarsegrainingvae_tpu.train.controller import EarlyStopping, LowessPlateauController
from coarsegrainingvae_tpu.train.losses import graph_loss, kl_divergence, recon_loss


@struct.dataclass
class PCNTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    lr: jnp.ndarray


def pcn_loss(
    out, g, quads, quad_mask, gamma: float, kappa: float, aux_scale=1.0,
    zeta=0.0, steric_batch=None, steric_margin: float = 0.3,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """aux_scale ramps the graph/dihedral terms in (0 -> 1). Measured on
    50-60-residue synthetics: training against the full loss from step 0
    stalls recon at ~0.87 (the chaotic early dihedral/graph gradients
    drown the coordinate signal), while recon-first training reaches 0.011
    in the same 120 epochs -- the auxiliary terms exist to polish local
    geometry once coordinates are roughly right, which is also why the
    reference trains them at lr 1e-4 / clip 0.01 (pcn_utils.py:185-200)."""
    loss_recon = recon_loss(out.xyz, out.xyz_recon, g.atom_mask)
    loss_graph = graph_loss(out.xyz, out.xyz_recon, g.bonds, g.bond_mask)
    gen = dihedral(out.xyz_recon, quads)
    dat = dihedral(out.xyz, quads)
    m = quad_mask.astype(gen.dtype)
    loss_dihe = jnp.sum(((gen - dat) ** 2) * m) / jnp.maximum(jnp.sum(m), 1.0)
    total = loss_recon + aux_scale * (gamma * loss_graph + kappa * loss_dihe)
    metrics = {
        "loss": total,
        "recon": loss_recon,
        "graph": loss_graph,
        "dihe": loss_dihe,
    }
    # excluded-volume hinge (repo extension, zeta=0 default = reference
    # loss): PCN batches are multi-topology, so the tables come from the
    # batch arrays (losses.steric_loss_batched), not a host precompute
    from coarsegrainingvae_tpu.train.losses import (
        steric_active,
        steric_loss_batched,
    )

    if steric_active(zeta) and steric_batch is not None:
        z_b, bonds_b, bond_mask_b = steric_batch
        loss_steric = steric_loss_batched(
            out.xyz_recon, z_b, bonds_b, bond_mask_b, margin=steric_margin
        )
        total = total + zeta * loss_steric
        metrics = dict(metrics, loss=total, steric=loss_steric)
    return total, metrics


class PCNTrainer:
    def __init__(
        self,
        model,
        gamma: float = 25.0,
        kappa: float = 1.0,
        lr: float = 1e-4,
        grad_clip: float = 0.01,
        loss_skip_factor: float = 300.0,  # pcn_utils.py:197-200
        seed: int = 123,
        aux_warmup: int = 0,
        zeta: float = 0.0,
        steric_margin: float = 0.3,
        zeta_warmup: int = 0,
        bond_project: bool = False,
        bond_project_eval: bool = False,
        beta: float = 0.0,
    ):
        self.model = model
        # StochasticPCN (CVAE variant, models/cgvae.py): adds beta*KL to
        # the loss and routes the reparameterization RNG; the
        # deterministic PCN path is untouched when stochastic=False
        from coarsegrainingvae_tpu.models.cgvae import StochasticPCN

        self.stochastic = isinstance(model, StochasticPCN)
        self.beta = float(beta)
        self.gamma = gamma
        self.kappa = kappa
        self.base_lr = lr
        self.loss_skip_factor = loss_skip_factor
        self.seed = seed
        # epochs over which the graph/dihedral weights ramp 0 -> 1
        # (pcn_loss docstring); 0 = full loss from step 0
        self.aux_warmup = aux_warmup
        # excluded-volume hinge (repo extension, train/losses.py); the
        # warmup counts optimizer STEPS like the flagship trainer's
        self.zeta = zeta
        self.steric_margin = steric_margin
        self.zeta_warmup = int(zeta_warmup or 0)
        # depth-ordered covalent bond-length projection rooted at the
        # pinned C-alphas (models/cgvae.py::project_bonds_rooted) --
        # applies on the training loss AND reconstruct paths.
        # bond_project_eval projects ONLY on the recon/generate outputs,
        # leaving the training objective untouched (the PCN analogue of
        # ModelConfig.h_project_eval): training THROUGH the projection is
        # unstable -- the rest/nrm direction factor has near-singular
        # gradients when a decoded bond collapses, and the round-5 p7 chip
        # run (examples/results/pcn_demo/p7_*) NaN'd at epoch 30/300 that
        # way while the eval-projected variant sidesteps it entirely.
        self.bond_project = bool(bond_project)
        self.bond_project_eval = bool(bond_project_eval)
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip), optax.scale_by_adam()
        )
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._recon_step = jax.jit(self._recon_impl)
        self._gen_ens_step = jax.jit(self._gen_ens_impl)

    def init_state(self, batch: CGBatch, ca_mask: np.ndarray) -> PCNTrainState:
        k0, k1 = jax.random.split(jax.random.PRNGKey(self.seed))
        params = self.model.init(
            {"params": k0, "sample": k1}, batch, jnp.asarray(ca_mask)
        )["params"]
        return PCNTrainState(
            params=params,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(self.base_lr, jnp.float32),
        )

    def _project(self, xyz_recon, g, ca_mask):
        from coarsegrainingvae_tpu.models.cgvae import project_bonds_rooted

        return project_bonds_rooted(
            xyz_recon, g.xyz, g.bonds, g.bond_mask,
            jnp.asarray(ca_mask).reshape(-1), g.atom_mask,
        )

    def _loss(self, params, batch: CGBatch, ca_mask, quads, quad_mask,
              aux_scale=1.0, zeta_scale=None, rng=None):
        rngs = (
            {"sample": rng if rng is not None else jax.random.PRNGKey(self.seed)}
            if self.stochastic else None
        )
        out = self.model.apply({"params": params}, batch, ca_mask, rngs=rngs)
        g = flatten_batch(batch)
        if self.bond_project:
            out = out.replace(xyz_recon=self._project(out.xyz_recon, g, ca_mask))
        flat_quads = flatten_ids(quads, batch.n_atoms)  # (B*Q, 4)
        zeta = self.zeta if zeta_scale is None else self.zeta * zeta_scale
        steric_batch = (
            (batch.z, batch.bonds, batch.bond_mask) if self.zeta else None
        )
        total, metrics = pcn_loss(
            out, g, flat_quads, quad_mask.reshape(-1), self.gamma, self.kappa,
            aux_scale, zeta=zeta, steric_batch=steric_batch,
            steric_margin=self.steric_margin,
        )
        if self.stochastic and self.beta != 0.0:
            kl = kl_divergence(
                out.mu, out.sigma, out.prior_mu, out.prior_sigma,
                mask=g.cg_mask,
            )
            total = total + self.beta * kl
            metrics = dict(metrics, loss=total, kl=kl)
        return total, metrics

    def _train_step_impl(self, state, batch, ca_mask, quads, quad_mask,
                         aux_scale):
        zscale = (
            jnp.minimum(state.step.astype(jnp.float32) / self.zeta_warmup, 1.0)
            if self.zeta_warmup > 0 else None
        )
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed + 1), state.step)
        (_, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, batch, ca_mask, quads, quad_mask, aux_scale, zscale,
            rng,
        )
        loss = metrics["loss"]
        thresh = self.gamma * self.loss_skip_factor if self.gamma > 0 else jnp.inf
        # a finite loss can still carry a NaN/inf gradient -- guard both
        ok = (
            jnp.isfinite(loss)
            & (loss < thresh)
            & jnp.isfinite(optax.global_norm(grads))
        )
        grads = jax.tree.map(lambda g_: jnp.where(ok, g_, jnp.zeros_like(g_)), grads)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: jnp.where(ok, -state.lr * u, jnp.zeros_like(u)), updates)
        params = optax.apply_updates(state.params, updates)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt, state.opt_state
        )
        return (
            PCNTrainState(params=params, opt_state=opt_state,
                          step=state.step + 1, lr=state.lr),
            metrics,
        )

    def _eval_step_impl(self, params, batch, ca_mask, quads, quad_mask):
        _, metrics = self._loss(params, batch, ca_mask, quads, quad_mask)
        return metrics

    def _recon_impl(self, params, batch, ca_mask):
        if self.stochastic:
            # posterior-mean reconstruction (z = mu): the deterministic
            # "best single answer" of the CVAE
            xr = self.model.apply(
                {"params": params}, batch, ca_mask, method="reconstruct_mean"
            )
        else:
            xr = self.model.apply({"params": params}, batch, ca_mask).xyz_recon
        if self.bond_project or self.bond_project_eval:
            xr = self._project(xr, flatten_batch(batch), ca_mask)
        return xr

    def reconstruct(self, params, batch: CGBatch, ca_mask):
        return self._recon_step(params, batch, jnp.asarray(ca_mask))

    def _gen_ens_impl(self, params, batch, ca_mask, keys):
        def one(key):
            xr = self.model.apply(
                {"params": params}, batch, ca_mask, method="generate",
                rngs={"sample": key},
            )
            if self.bond_project or self.bond_project_eval:
                xr = self._project(xr, flatten_batch(batch), ca_mask)
            return xr

        return jax.vmap(one)(keys)  # (K, BN, 3)

    def sample_ensemble(self, params, batch: CGBatch, ca_mask, k: int,
                        seed: int = 0):
        """K prior-conditioned samples from the C-alpha trace
        (StochasticPCN only). Returns (K, B*N, 3)."""
        if not self.stochastic:
            raise ValueError("sample_ensemble needs a StochasticPCN model")
        keys = jax.random.split(jax.random.PRNGKey(seed), k)
        return self._gen_ens_step(params, batch, jnp.asarray(ca_mask), keys)

    def run_epoch(
        self,
        state: PCNTrainState,
        dataset: PCNDatasetArrays,
        batch_size: int,
        train: bool = True,
        shuffle_rng: Optional[np.random.Generator] = None,
        aux_scale: float = 1.0,
    ) -> Tuple[PCNTrainState, Dict[str, float]]:
        agg: Dict[str, list] = {}
        for batch, ca_mask, quads, quad_mask in dataset.iter_batches(
            batch_size, rng=shuffle_rng if train else None
        ):
            args = (batch, jnp.asarray(ca_mask), jnp.asarray(quads),
                    jnp.asarray(quad_mask))
            if train:
                state, metrics = self._train_step(
                    state, *args, jnp.asarray(aux_scale, jnp.float32)
                )
            else:
                metrics = self._eval_step(state.params, *args)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        return state, {k: float(np.mean(jax.device_get(v))) for k, v in agg.items()}

    def fit(
        self,
        state: PCNTrainState,
        trainset: PCNDatasetArrays,
        valset: PCNDatasetArrays,
        nepochs: int,
        batch_size: int,
        patience: int = 15,
        lr_patience: int = 2,
        lr_factor: float = 0.6,
        min_lr: float = 1e-8,
        log_fn=None,
    ):
        controller = LowessPlateauController(
            lr=self.base_lr, factor=lr_factor, patience=lr_patience, min_lr=min_lr
        )
        stopper = EarlyStopping(patience=patience)
        shuffle_rng = np.random.default_rng(self.seed)
        history = []
        # Track the best-val params: Adam renormalizes clipped gradients, so
        # a long run can destabilize late (observed at lr 3e-3 around epoch
        # 20 on 50-80-residue proteins); test metrics must come from the
        # best validation checkpoint, not whatever the final step left
        # behind (reference keeps best_model the same way, run_pdb.py).
        best_val = np.inf
        # host copies: the train step donates its input state, so holding a
        # device reference across epochs would alias invalidated buffers
        best_params = jax.device_get(state.params)
        # hold controller/stopper/best-val tracking while the warmup ramps
        # are active (aux_warmup counts EPOCHS, zeta_warmup counts STEPS):
        # the tracked loss moves because the objective moves
        steps_per_epoch = max(len(trainset) // max(batch_size, 1), 1)
        warm_epochs = max(
            int(self.aux_warmup or 0),
            (-(-int(self.zeta_warmup or 0) // steps_per_epoch)
             if self.zeta else 0),
        )
        for epoch in range(nepochs):
            t0 = time.time()
            aux = (min(1.0, (epoch + 1) / self.aux_warmup)
                   if self.aux_warmup > 0 else 1.0)
            state, train_m = self.run_epoch(
                state, trainset, batch_size, train=True,
                shuffle_rng=shuffle_rng, aux_scale=aux,
            )
            _, val_m = self.run_epoch(state, valset, batch_size, train=False)
            if epoch >= warm_epochs:
                smoothed = controller.step(val_m["loss"])
            else:
                smoothed = val_m["loss"]
            state = state.replace(lr=jnp.asarray(controller.lr, jnp.float32))
            row = {
                "epoch": epoch, "lr": controller.lr,
                "train_loss": train_m["loss"], "val_loss": val_m["loss"],
                "train_recon": train_m["recon"], "val_recon": val_m["recon"],
                "train_graph": train_m["graph"], "val_graph": val_m["graph"],
                "train_dihe": train_m["dihe"], "val_dihe": val_m["dihe"],
                "epoch_time_s": time.time() - t0,
            }
            if "kl" in train_m:
                row["train_kl"] = train_m["kl"]
                row["val_kl"] = val_m.get("kl", float("nan"))
            history.append(row)
            if log_fn is not None:
                log_fn(row)
            # best-val tracks EVERY epoch: _eval_step_impl scores validation
            # under the FULL objective (aux_scale=1, unwarmed zeta), so
            # warmup-epoch val losses are directly comparable -- only the
            # controller/stopper need the warmup hold
            if np.isfinite(val_m["loss"]) and val_m["loss"] < best_val:
                best_val = val_m["loss"]
                best_params = jax.device_get(state.params)
            if controller.converged:
                break
            if epoch >= warm_epochs:
                stopper(smoothed)
            if stopper.early_stop or not np.isfinite(val_m["recon"]):
                break
        return state.replace(params=best_params), history
