"""Trainer for the non-VAE baselines (run_baseline.py:121-408 in
/root/reference). Loss = coordinate MSE + gamma * hyperedge-distance MSE
(run_baseline.py:146-149)."""
from __future__ import annotations

import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from coarsegrainingvae_tpu.data.diffpool import DiffPoolBatch, DiffPoolDatasetArrays
from coarsegrainingvae_tpu.train.controller import EarlyStopping, LowessPlateauController

EPS = 1e-3


@struct.dataclass
class BaselineTrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    lr: jnp.ndarray


def baseline_loss(xyz, x_recon, bonds, gamma: float) -> Tuple[jnp.ndarray, Dict]:
    loss_recon = jnp.mean((x_recon - xyz) ** 2)
    gen_d = jnp.sqrt(
        jnp.sum((x_recon[:, bonds[:, 0]] - x_recon[:, bonds[:, 1]]) ** 2, -1) + EPS
    )
    dat_d = jnp.sqrt(
        jnp.sum((xyz[:, bonds[:, 0]] - xyz[:, bonds[:, 1]]) ** 2, -1) + EPS
    )
    loss_graph = jnp.mean((gen_d - dat_d) ** 2)
    total = loss_recon + gamma * loss_graph
    return total, {"loss": total, "recon": loss_recon, "graph": loss_graph}


class BaselineTrainer:
    """Jitted Adam training loop for any baseline from the zoo (the model's
    __call__ must be xyz -> (xyz_centered, x_recon))."""

    def __init__(self, model, gamma: float = 0.0, lr: float = 1e-3, seed: int = 123):
        self.model = model
        self.gamma = gamma
        self.base_lr = lr
        self.seed = seed
        self.tx = optax.scale_by_adam()
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._recon = jax.jit(
            lambda p, xyz: self.model.apply({"params": p}, xyz)
        )

    def init_state(self, batch: DiffPoolBatch) -> BaselineTrainState:
        params = self.model.init(jax.random.PRNGKey(self.seed),
                                 jnp.asarray(batch.xyz))["params"]
        return BaselineTrainState(
            params=params, opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(self.base_lr, jnp.float32),
        )

    def _loss(self, params, batch: DiffPoolBatch):
        xyz, x_recon = self.model.apply({"params": params}, jnp.asarray(batch.xyz))
        return baseline_loss(xyz, x_recon, jnp.asarray(batch.bonds), self.gamma)

    def _train_step_impl(self, state: BaselineTrainState, batch):
        (_, metrics), grads = jax.value_and_grad(self._loss, has_aux=True)(
            state.params, batch
        )
        # guard loss AND gradient finiteness; freeze params and moments on
        # a skipped batch (same semantics as train/trainer.py)
        ok = jnp.isfinite(metrics["loss"]) & jnp.isfinite(optax.global_norm(grads))
        grads = jax.tree.map(lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(
            lambda u: jnp.where(ok, -state.lr * u, jnp.zeros_like(u)), updates
        )
        params = optax.apply_updates(state.params, updates)
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt, state.opt_state
        )
        return (
            BaselineTrainState(params=params, opt_state=opt_state,
                               step=state.step + 1, lr=state.lr),
            metrics,
        )

    def _eval_step_impl(self, params, batch):
        _, metrics = self._loss(params, batch)
        return metrics

    def reconstruct(self, params, batch: DiffPoolBatch):
        return self._recon(params, jnp.asarray(batch.xyz))

    def run_epoch(
        self,
        state: BaselineTrainState,
        dataset: DiffPoolDatasetArrays,
        batch_size: int,
        train: bool = True,
        shuffle_rng: Optional[np.random.Generator] = None,
    ) -> Tuple[BaselineTrainState, Dict[str, float]]:
        agg: Dict[str, list] = {}
        for batch in dataset.iter_batches(batch_size, rng=shuffle_rng if train else None):
            if train:
                state, metrics = self._train_step(state, batch)
            else:
                metrics = self._eval_step(state.params, batch)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        return state, {k: float(np.mean(jax.device_get(v))) for k, v in agg.items()}

    def fit(
        self,
        state: BaselineTrainState,
        trainset: DiffPoolDatasetArrays,
        valset: DiffPoolDatasetArrays,
        nepochs: int,
        batch_size: int,
        patience: int = 20,
        lr_patience: int = 10,
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
        for epoch in range(nepochs):
            t0 = time.time()
            state, train_m = self.run_epoch(
                state, trainset, batch_size, train=True, shuffle_rng=shuffle_rng
            )
            _, val_m = self.run_epoch(state, valset, batch_size, train=False)
            smoothed = controller.step(val_m["loss"])
            state = state.replace(lr=jnp.asarray(controller.lr, jnp.float32))
            row = {
                "epoch": epoch, "lr": controller.lr,
                "train_loss": train_m["loss"], "val_loss": val_m["loss"],
                "train_recon": train_m["recon"], "val_recon": val_m["recon"],
                "train_graph": train_m["graph"], "val_graph": val_m["graph"],
                "epoch_time_s": time.time() - t0,
            }
            history.append(row)
            if log_fn is not None:
                log_fn(row)
            if controller.converged:
                break
            stopper(smoothed)
            if stopper.early_stop or not np.isfinite(val_m["recon"]):
                break
        return state, history
