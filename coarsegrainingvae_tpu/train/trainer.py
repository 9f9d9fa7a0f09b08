"""Jitted train/eval/sample steps + the epoch-loop Trainer.

TPU-native replacement for the reference's `loop` (scripts/utils.py:89-191
in /root/reference): the whole step (forward, losses, backward, clip,
update) is one XLA program; batches are sharded over the ('data',) mesh and
gradients all-reduce over ICI automatically. Reference behaviors preserved:
grad-norm clip 0.01 (utils.py:156), skip-batch guard on huge/NaN losses
(utils.py:145-148, realized as a zero-gradient mask since XLA control flow
must be branchless), LOWESS-plateau LR + early stop handled host-side by the
controller. The reference's val-branch backward (utils.py:159-161) is a bug
we do not replicate.
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from coarsegrainingvae_tpu.config import ExperimentConfig
from coarsegrainingvae_tpu.data.batch import CGBatch
from coarsegrainingvae_tpu.data.dataset import CGDatasetArrays
from coarsegrainingvae_tpu.models.cgvae import flatten_batch
from coarsegrainingvae_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from coarsegrainingvae_tpu.train.controller import EarlyStopping, LowessPlateauController
from coarsegrainingvae_tpu.train.losses import vae_loss


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    lr: jnp.ndarray  # current learning rate (device scalar, set by controller)


def scale_by_adam_compact(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """scale_by_adam with BOTH moments stored in ``moment_dtype``.

    The Adam update is HBM-bandwidth bound on TPU: per step it reads and
    writes params + mu + nu (3x param bytes each way). Storing the moments
    in bfloat16 halves two of those three streams (~1/3 less optimizer
    traffic); the update math still runs in float32 (moments are upcast,
    blended, and rounded back down once per step). bf16 keeps float32's
    exponent range, so only ~3 decimal digits of moment resolution are
    lost -- held-out accuracy parity is gated by examples/accuracy_ab.py
    exactly like the bf16-matmul default was.

    optax.scale_by_adam only offers mu_dtype (first moment); this covers nu
    as well. Parity with optax at float32 is pinned by
    tests/test_train.py."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=moment_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c1 = 1.0 - b1 ** count.astype(jnp.float32)
        c2 = 1.0 - b2 ** count.astype(jnp.float32)

        def blend(g, m, n):
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
            n32 = b2 * n.astype(jnp.float32) + (1.0 - b2) * (g * g)
            upd = (m32 / c1) / (jnp.sqrt(n32 / c2) + eps)
            return upd, m32.astype(moment_dtype), n32.astype(moment_dtype)

        out = jax.tree.map(blend, updates, state.mu, state.nu)
        upd = jax.tree.map(lambda t: t[0], out, is_leaf=lambda t: isinstance(t, tuple))
        mu = jax.tree.map(lambda t: t[1], out, is_leaf=lambda t: isinstance(t, tuple))
        nu = jax.tree.map(lambda t: t[2], out, is_leaf=lambda t: isinstance(t, tuple))
        return upd, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    grad_clip: float, moment_dtype: str = "float32"
) -> optax.GradientTransformation:
    """clip-by-global-norm + Adam with an externally-injected LR.

    The LR is passed per-step through the optimizer state-free way: we use
    optax.scale_by_adam + a multiply by -lr performed in the step (the
    plateau controller owns the schedule on host).

    moment_dtype="bfloat16" stores the Adam moments compactly
    (scale_by_adam_compact) -- the optimizer is the largest single HBM
    stream of the flagship step (DESIGN.md roofline)."""
    adam = (
        optax.scale_by_adam()
        if moment_dtype == "float32"
        else scale_by_adam_compact(moment_dtype=jnp.dtype(moment_dtype))
    )
    return optax.chain(optax.clip_by_global_norm(grad_clip), adam)


class Trainer:
    """Builds jitted steps bound to (model, config, mesh)."""

    def __init__(self, model, cfg: ExperimentConfig, mesh=None,
                 steric_tables=None):
        self.model = model
        self.cfg = cfg
        # (thresh (N,N) f32, pair_mask (N,N) bool) from
        # losses.build_steric_tables; used only when cfg.train.zeta > 0.
        # Captured as jit constants -- static per fold like channel_idx.
        self.steric_tables = (
            tuple(jnp.asarray(t) for t in steric_tables)
            if steric_tables is not None else None
        )
        self.mesh = mesh if mesh is not None else make_mesh(
            cfg.parallel.num_devices,
            model_devices=getattr(cfg.parallel, "model_devices", 1),
        )
        self.tx = make_optimizer(
            cfg.train.grad_clip,
            getattr(cfg.train, "adam_moment_dtype", "float32"),
        )
        # tensor (feature-dim) parallelism over a 2-D ('data','model') mesh:
        # params/moments column-sharded (parallel/mesh.py::tensor_shardings)
        self._tp = (
            "model" in self.mesh.axis_names and self.mesh.shape["model"] > 1
        )
        self._param_shardings = None
        # ZeRO-1 optimizer-state sharding (parallel/mesh.py::zero_shardings);
        # resolved to concrete shardings once the state exists (init_state).
        # With TP active the moments follow the params' tensor shardings
        # instead (already 1/model_devices per chip along the data axis).
        self._zero = (
            getattr(cfg.parallel, "zero_optimizer", False)
            and self.mesh.devices.size > 1
            and not self._tp
        )
        self._opt_shardings = None
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        self._eval_step = jax.jit(self._eval_step_impl)
        self._recon_step = jax.jit(self._recon_step_impl)
        self._generate_step = jax.jit(self._generate_step_impl)
        # device-resident data path: batch gather fused into the step
        self._train_step_idx = jax.jit(
            lambda state, dds, idx, rng: self._train_step_impl(
                state, dds.gather(idx), rng
            ),
            donate_argnums=(0,),
        )
        self._eval_step_idx = jax.jit(
            lambda params, dds, idx, rng: self._eval_step_impl(
                params, dds.gather(idx), rng
            )
        )

    # ------------------------------------------------------------------ init
    def init_state(self, batch: CGBatch, seed: int = 123) -> TrainState:
        # the per-bead channel lift reads vector channel `channel_idx[i]` of
        # the bead (cgvae.py:473 in the reference): every bead needs at most
        # n_basis atoms, or the gather runs out of bounds (silent garbage)
        max_ch = int(np.asarray(batch.channel_idx).max())
        n_basis = self.cfg.model.n_basis
        if max_ch >= n_basis:
            raise ValueError(
                f"largest CG bead has {max_ch + 1} atoms but n_basis="
                f"{n_basis}; the channel lift needs n_basis >= atoms-per-"
                f"bead -- raise n_basis or use more CG beads"
            )
        rng = jax.random.PRNGKey(seed)
        params = self.model.init(
            {"params": rng, "sample": jax.random.fold_in(rng, 1)}, batch
        )["params"]
        opt_state = self.tx.init(params)
        state = TrainState(
            params=params,
            opt_state=opt_state,
            step=jnp.zeros((), jnp.int32),
            lr=jnp.asarray(self.cfg.train.lr, jnp.float32),
        )
        state = replicate(state, self.mesh)
        if self._tp:
            from coarsegrainingvae_tpu.parallel.mesh import tensor_shardings

            self._param_shardings = tensor_shardings(state.params, self.mesh)
            self._opt_shardings = tensor_shardings(state.opt_state, self.mesh)
            state = state.replace(
                params=jax.device_put(state.params, self._param_shardings),
                opt_state=jax.device_put(state.opt_state, self._opt_shardings),
            )
        elif self._zero:
            from coarsegrainingvae_tpu.parallel.mesh import zero_shardings

            self._opt_shardings = zero_shardings(state.opt_state, self.mesh)
            state = state.replace(
                opt_state=jax.device_put(state.opt_state, self._opt_shardings)
            )
        return state

    # ----------------------------------------------------------------- steps
    def _loss_fn(
        self, params, batch: CGBatch, rng, zeta_scale=None
    ) -> Tuple[jnp.ndarray, Dict]:
        out = self.model.apply({"params": params}, batch, rngs={"sample": rng})
        g = flatten_batch(batch)
        zeta = getattr(self.cfg.train, "zeta", 0.0)
        if zeta_scale is not None:
            zeta = zeta * zeta_scale
        return vae_loss(
            out, g, self.cfg.train.beta, self.cfg.train.gamma,
            zeta=zeta,
            steric=self.steric_tables,
            h_bond_weight=getattr(self.cfg.train, "h_bond_weight", 1.0),
            eta_h=getattr(self.cfg.train, "eta_h", 0.0),
        )

    def _train_step_impl(self, state: TrainState, batch: CGBatch, rng):
        # zeta_warmup (steps): ramp the excluded-volume weight 0 -> zeta
        # over the first N steps. At full steric weight the step-0 Adam
        # update (sign-like: m/sqrt(v) has unit scale regardless of grad
        # magnitude) follows a pure all-pairs-expansion direction that the
        # deep decoder amplifies catastrophically (loss 271 -> 5.6e26 in
        # one accepted step, measured); ramping from the stable zeta=0
        # direction removes that failure mode without changing the
        # converged objective.
        warm = int(getattr(self.cfg.train, "zeta_warmup", 0) or 0)
        zscale = (
            jnp.minimum(state.step.astype(jnp.float32) / warm, 1.0)
            if warm > 0 else None
        )
        (loss, metrics), grads = jax.value_and_grad(self._loss_fn, has_aux=True)(
            state.params, batch, rng, zscale
        )

        # skip-batch guard (utils.py:145-148): zero the update instead of
        # data-dependent control flow. (A lax.cond around the optimizer
        # update measured SLOWER on v5e -- the conditional forces copies of
        # the 205 MB param/moment buffers -- so the branchless where-select
        # stays; it fuses into the optimizer's elementwise passes.)
        gamma = self.cfg.train.gamma
        thresh = gamma * self.cfg.train.loss_skip_factor if gamma > 0 else jnp.inf
        # guard the GRADIENT too: a loss can be finite while its gradient
        # is NaN/inf (observed on the full-size chignolin -zeta run: one
        # poisoned accepted step NaN'd the params and tripped the NaN
        # abort). global_norm is the same reduction clip_by_global_norm
        # already performs, so XLA CSEs it -- no extra HBM pass.
        ok = (
            jnp.isfinite(loss)
            & (loss < thresh)
            & jnp.isfinite(optax.global_norm(grads))
        )
        scale = ok.astype(jnp.float32)
        # NaN-safe: select zeros rather than multiply (0 * NaN = NaN)
        grads = jax.tree.map(lambda g_: jnp.where(ok, g_, jnp.zeros_like(g_)), grads)

        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        lr_eff = state.lr
        lr_warm = int(getattr(self.cfg.train, "lr_warmup", 0) or 0)
        if lr_warm > 0:
            # (step+1)/N so the ramp starts at 1/N, not a wasted 0-step
            lr_eff = lr_eff * jnp.minimum(
                (state.step.astype(jnp.float32) + 1.0) / lr_warm, 1.0
            )
        updates = jax.tree.map(
            lambda u: jnp.where(ok, -lr_eff * u, jnp.zeros_like(u)), updates
        )
        params = optax.apply_updates(state.params, updates)
        # a skipped batch must not advance optimizer moments either
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(ok, new, old), new_opt_state, state.opt_state
        )
        if self._opt_shardings is not None:
            # keep the moments ZeRO-/tensor-sharded: XLA partitions the Adam
            # update per shard and gathers only what the apply step needs
            opt_state = jax.lax.with_sharding_constraint(
                opt_state, self._opt_shardings
            )
        if self._param_shardings is not None:
            # tensor parallelism: params stay column-sharded across steps
            params = jax.lax.with_sharding_constraint(
                params, self._param_shardings
            )
        metrics = dict(metrics, skipped=1.0 - scale, grad_ok=scale)
        new_state = TrainState(
            params=params, opt_state=opt_state, step=state.step + 1, lr=state.lr
        )
        return new_state, metrics

    def _eval_step_impl(self, params, batch: CGBatch, rng):
        _, metrics = self._loss_fn(params, batch, rng)
        return metrics

    def _h_project_eval(self, xyz_recon, batch: CGBatch):
        """EVAL-ONLY H bond-length projection (ModelConfig.h_project_eval):
        training sees the raw decoder (reference loss dynamics untouched),
        inference output gets the constraint. Measured motivation: training
        THROUGH the constraint (h_project) costs sample heavy validity
        (0.899 -> 0.806 on the dipeptide zeta-100 recipe) while the
        post-hoc projection keeps it."""
        from coarsegrainingvae_tpu.models.cgvae import (
            flatten_batch,
            project_h_bonds,
        )

        g = flatten_batch(batch)
        return project_h_bonds(xyz_recon, g.z, g.xyz, g.bonds, g.bond_mask)

    def _recon_step_impl(self, params, batch: CGBatch, rng):
        out = self.model.apply({"params": params}, batch, rngs={"sample": rng})
        xr = out.xyz_recon
        if getattr(self.cfg.model, "h_project_eval", False):
            xr = self._h_project_eval(xr, batch)
        return xr

    def _generate_step_impl(self, params, batch: CGBatch, rng):
        xs = self.model.apply(
            {"params": params}, batch, method=self.model.generate,
            rngs={"sample": rng},
        )
        if getattr(self.cfg.model, "h_project_eval", False):
            xs = self._h_project_eval(xs, batch)
        return xs

    # ------------------------------------------------------------ public API
    def train_step(self, state, batch, rng):
        return self._train_step(state, shard_batch(batch, self.mesh), rng)

    def eval_step(self, params, batch, rng):
        return self._eval_step(params, shard_batch(batch, self.mesh), rng)

    def reconstruct(self, params, batch, rng):
        return self._recon_step(params, shard_batch(batch, self.mesh), rng)

    def generate(self, params, batch, rng):
        return self._generate_step(params, shard_batch(batch, self.mesh), rng)

    def set_lr(self, state: TrainState, lr: float) -> TrainState:
        return state.replace(lr=jnp.asarray(lr, jnp.float32))

    # -------------------------------------------------- device-resident path
    def _epoch_scan_impl(self, state: TrainState, dds, idx_batches, rng):
        """One WHOLE epoch as a single XLA program: lax.scan over the
        (S, B) index batches. No per-step Python dispatch; metrics come
        back stacked (S, ...).

        On a multi-device mesh, the gathered batch is constrained to the
        ('data',) sharding inside the step -- XLA shards the model forward/
        backward over the batch axis and all-reduces gradients over ICI,
        exactly as the host-streaming path does."""
        from coarsegrainingvae_tpu.parallel.mesh import batch_sharding

        multi = self.mesh.devices.size > 1
        sharding = batch_sharding(self.mesh) if multi else None

        def step(carry, inp):
            st = carry
            i, idx = inp
            batch = dds.gather(idx)
            if sharding is not None:
                batch = jax.lax.with_sharding_constraint(batch, sharding)
            st, metrics = self._train_step_impl(
                st, batch, jax.random.fold_in(rng, i)
            )
            return st, metrics

        steps = jnp.arange(idx_batches.shape[0])
        state, metrics = jax.lax.scan(step, state, (steps, idx_batches))
        return state, metrics

    def run_epoch_scan(
        self,
        state: TrainState,
        dds,
        rng: jax.Array,
        shuffle_rng: Optional[np.random.Generator] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """Train one epoch with the scan path (device-resident data)."""
        from coarsegrainingvae_tpu.data.device import epoch_index_batches

        if not hasattr(self, "_epoch_scan"):
            self._epoch_scan = jax.jit(self._epoch_scan_impl, donate_argnums=(0,))
        batches = jnp.asarray(
            epoch_index_batches(dds.n_frames, self.cfg.data.batch_size, shuffle_rng)
        )
        state, metrics = self._epoch_scan(state, dds, batches, rng)
        out = {k: float(np.mean(v)) for k, v in jax.device_get(metrics).items()}
        out["n_steps"] = int(batches.shape[0])
        return state, out

    def _val_scan_impl(self, params, dds, idx_batches, rng):
        """Whole validation epoch as one XLA program (same shape as
        _epoch_scan_impl minus the optimizer): on the tunneled backend a
        per-step host dispatch costs ~1 ms, so 50 val steps/epoch were a
        measurable tax (round-2 verdict)."""
        from coarsegrainingvae_tpu.parallel.mesh import batch_sharding

        multi = self.mesh.devices.size > 1
        sharding = batch_sharding(self.mesh) if multi else None

        def step(_, inp):
            i, idx = inp
            batch = dds.gather(idx)
            if sharding is not None:
                batch = jax.lax.with_sharding_constraint(batch, sharding)
            metrics = self._eval_step_impl(
                params, batch, jax.random.fold_in(rng, i)
            )
            return None, metrics

        steps = jnp.arange(idx_batches.shape[0])
        _, metrics = jax.lax.scan(step, None, (steps, idx_batches))
        return metrics

    def run_epoch_scan_eval(
        self, params, dds, rng: jax.Array
    ) -> Dict[str, float]:
        """Evaluate one epoch with the scan path (device-resident data)."""
        from coarsegrainingvae_tpu.data.device import epoch_index_batches

        if not hasattr(self, "_val_scan"):
            self._val_scan = jax.jit(self._val_scan_impl)
        batches = jnp.asarray(
            epoch_index_batches(dds.n_frames, self.cfg.data.batch_size, None)
        )
        metrics = self._val_scan(params, dds, batches, rng)
        out = {k: float(np.mean(v)) for k, v in jax.device_get(metrics).items()}
        out["n_steps"] = int(batches.shape[0])
        return out

    def run_epoch_device(
        self,
        state: TrainState,
        dds,
        rng: jax.Array,
        train: bool = True,
        shuffle_rng: Optional[np.random.Generator] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """Epoch over a data.device.DeviceDataset: per step the host sends
        only a (B,) index vector; gather + forward + backward + update is
        one XLA program."""
        from coarsegrainingvae_tpu.data.device import epoch_index_batches

        batches = epoch_index_batches(
            dds.n_frames, self.cfg.data.batch_size,
            shuffle_rng if train else None,
        )
        agg: Dict[str, list] = {}
        for i in range(batches.shape[0]):
            step_rng = jax.random.fold_in(rng, i)
            idx = jnp.asarray(batches[i])
            if train:
                state, metrics = self._train_step_idx(state, dds, idx, step_rng)
            else:
                metrics = self._eval_step_idx(state.params, dds, idx, step_rng)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
        out = {k: float(np.mean(jax.device_get(v))) for k, v in agg.items()}
        out["n_steps"] = batches.shape[0]
        return state, out

    def run_epoch_streamed(
        self,
        state: TrainState,
        dataset: CGDatasetArrays,
        rng: jax.Array,
        chunk_frames: int,
        shuffle_rng: Optional[np.random.Generator] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        """Epoch over a dataset too large for HBM: frames stream in chunks,
        each chunk trains as one lax.scan while the NEXT chunk's transfer is
        already in flight (jax.device_put is asynchronous, so host->device
        copy overlaps the previous chunk's compute).

        chunk_frames should be a multiple of the batch size; the tail chunk
        cycles as usual."""
        from coarsegrainingvae_tpu.data.device import DeviceDataset

        batch_size = self.cfg.data.batch_size
        order = np.arange(len(dataset))
        if shuffle_rng is not None:
            shuffle_rng.shuffle(order)
        chunks = [
            order[lo : lo + chunk_frames]
            for lo in range(0, len(order), chunk_frames)
            if len(order) - lo >= batch_size or lo == 0
        ]

        agg: Dict[str, list] = {}
        n_steps = 0
        next_dds = DeviceDataset.from_dataset(dataset.subset(chunks[0]))
        for c in range(len(chunks)):
            dds = next_dds
            if c + 1 < len(chunks):
                # enqueue the next chunk's transfer before compute
                next_dds = DeviceDataset.from_dataset(
                    dataset.subset(chunks[c + 1])
                )
            state, m = self.run_epoch_scan(
                state, dds, jax.random.fold_in(rng, c), shuffle_rng=None,
            )
            steps = m.pop("n_steps")
            n_steps += steps
            for k, v in m.items():
                agg.setdefault(k, []).append((v, steps))
        out = {
            k: float(sum(v * w for v, w in vs) / sum(w for _, w in vs))
            for k, vs in agg.items()
        }
        out["n_steps"] = n_steps
        return state, out

    # ------------------------------------------------------------- epoch loop
    def run_epoch(
        self,
        state: TrainState,
        dataset: CGDatasetArrays,
        rng: jax.Array,
        train: bool = True,
        epoch: int = 0,
        shuffle_rng: Optional[np.random.Generator] = None,
    ) -> Tuple[TrainState, Dict[str, float]]:
        batch_size = self.cfg.data.batch_size
        agg: Dict[str, list] = {}
        n_steps = 0
        for i, batch in enumerate(
            dataset.iter_batches(batch_size, rng=shuffle_rng if train else None)
        ):
            step_rng = jax.random.fold_in(rng, i)
            if train:
                state, metrics = self.train_step(state, batch, step_rng)
            else:
                metrics = self.eval_step(state.params, batch, step_rng)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(v)
            n_steps += 1
        out = {k: float(np.mean([jax.device_get(x) for x in v])) for k, v in agg.items()}
        out["n_steps"] = n_steps
        return state, out

    def fit(
        self,
        state: TrainState,
        trainset: CGDatasetArrays,
        valset: CGDatasetArrays,
        log_fn: Optional[Callable[[Dict[str, float]], None]] = None,
        nepochs: Optional[int] = None,
        ckpt=None,
        resume: bool = False,
        on_device: bool = True,
    ) -> Tuple[TrainState, list]:
        """Full training run with plateau LR + early stopping. Returns
        (final state, per-epoch history).

        ckpt: optional train.checkpoint.CheckpointManager. Saves the full
        train state every cfg.train.checkpoint_every epochs (plus final);
        resume=True restarts from the latest checkpoint (epoch, controller
        and early-stop counters included) -- capability the reference lacks
        (SURVEY.md section 5.4).

        on_device=True (default) moves both splits to HBM once and runs each
        training epoch as ONE lax.scan (zero per-step host work); pass False
        to stream batches from host (datasets too large for device memory)."""
        tc = self.cfg.train
        controller = LowessPlateauController(
            lr=tc.lr, factor=tc.lr_factor, patience=tc.lr_patience,
            min_lr=tc.min_lr, frac=tc.lowess_frac,
        )
        stopper = EarlyStopping(patience=tc.patience)
        shuffle_rng = np.random.default_rng(self.cfg.data.seed)
        base_rng = jax.random.PRNGKey(self.cfg.data.seed)
        history = []
        start_epoch = 0
        # hold the plateau controller/stopper while a step-warmup ramp is
        # active: the tracked loss moves because the OBJECTIVE moves, and
        # reacting to it collapses the LR before the ramp ends (measured
        # on the diffpool graph_warmup retrain; same hazard here)
        steps_per_epoch = max(
            len(trainset) // max(self.cfg.data.batch_size, 1), 1
        )
        warm_steps = max(
            (int(getattr(tc, "zeta_warmup", 0) or 0)
             if (tc.zeta and self.steric_tables is not None) else 0),
            int(getattr(tc, "lr_warmup", 0) or 0),
        )
        warm_epochs = -(-warm_steps // steps_per_epoch) if warm_steps else 0

        dds_train = dds_val = None
        if on_device:
            from coarsegrainingvae_tpu.data.device import DeviceDataset

            # aux-edge datasets carry per-frame bond lists not represented in
            # DeviceDataset; fall back to host streaming for those. On a
            # multi-device mesh the scan step constrains the gathered batch
            # to the ('data',) sharding (see _epoch_scan_impl); the batch
            # size must divide the mesh for that split to be even.
            data_par = self.mesh.shape.get("data", self.mesh.devices.size)
            mesh_ok = (
                data_par == 1 or self.cfg.data.batch_size % data_par == 0
            )
            if getattr(trainset, "aux_bonds", None) is None and mesh_ok:
                dds_train = DeviceDataset.from_dataset(trainset)
                dds_val = DeviceDataset.from_dataset(valset)

        if resume and ckpt is not None and ckpt.latest_step() is not None:
            state, meta, _ = ckpt.restore(state)
            state = replicate(state, self.mesh)
            start_epoch = int(meta.get("epoch", -1)) + 1
            controller.load_state(meta.get("controller", {}))
            stopper.load_state(meta.get("stopper", {}))
            history = meta.get("history", [])
            state = self.set_lr(state, controller.lr)

        for epoch in range(start_epoch, nepochs if nepochs is not None else tc.nepochs):
            t0 = time.time()
            epoch_rng = jax.random.fold_in(base_rng, epoch)
            if dds_train is not None:
                state, train_m = self.run_epoch_scan(
                    state, dds_train, epoch_rng, shuffle_rng=shuffle_rng,
                )
                val_m = self.run_epoch_scan_eval(
                    state.params, dds_val, jax.random.fold_in(epoch_rng, 999),
                )
            else:
                state, train_m = self.run_epoch(
                    state, trainset, epoch_rng, train=True, epoch=epoch,
                    shuffle_rng=shuffle_rng,
                )
                _, val_m = self.run_epoch(
                    state, valset, jax.random.fold_in(epoch_rng, 999),
                    train=False,
                )
            if epoch >= warm_epochs:
                smoothed = controller.step(val_m["loss"])
            else:
                smoothed = val_m["loss"]
            state = self.set_lr(state, controller.lr)
            # log the EFFECTIVE end-of-epoch LR: during an lr_warmup ramp
            # the applied LR is controller.lr * min(step/N, 1), and the
            # per-epoch CSV is the artifact LR-schedule diagnoses read
            lr_warm = int(getattr(tc, "lr_warmup", 0) or 0)
            lr_eff = controller.lr
            if lr_warm > 0:
                lr_eff *= min(((epoch + 1) * steps_per_epoch) / lr_warm, 1.0)
            row = {
                "epoch": epoch,
                "lr": lr_eff,
                "train_loss": train_m["loss"],
                "val_loss": val_m["loss"],
                "train_recon": train_m["recon"],
                "val_recon": val_m["recon"],
                "train_KL": train_m["kl"],
                "val_KL": val_m["kl"],
                "train_graph": train_m["graph"],
                "val_graph": val_m["graph"],
                "val_loss_smoothed": smoothed,
                "epoch_time_s": time.time() - t0,
            }
            history.append(row)
            if log_fn is not None:
                log_fn(row)

            stop = False
            if controller.converged:
                stop = True
            if epoch >= warm_epochs:
                stopper(smoothed)
            if stopper.early_stop:
                stop = True
            if not np.isfinite(val_m["recon"]):
                # NaN abort (run_ala.py:278-281)
                stop = True

            # save on stop, on the periodic schedule, and ALWAYS on the final
            # epoch (a run that exhausts its epoch budget must still leave a
            # restorable checkpoint)
            final = epoch + 1 == (nepochs if nepochs is not None else tc.nepochs)
            if ckpt is not None and (
                stop or final
                or (tc.checkpoint_every > 0 and (epoch + 1) % tc.checkpoint_every == 0)
            ):
                ckpt.save(
                    epoch, state,
                    metadata={
                        "epoch": epoch,
                        "controller": controller.save_state(),
                        "stopper": stopper.save_state(),
                        "history": history,
                    },
                )
            if stop:
                break
        return state, history
