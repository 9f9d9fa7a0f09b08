"""Inference/serving: load a trained run and backmap CG coordinates.

The reference has no serving path (sampling is interleaved with training,
scripts/sampling.py); production use needs the inverse entry point: given a
run directory (modelparams.json + per-fold mapping.json + ckpt/) and new CG
bead coordinates, produce all-atom ensembles with one jitted call.

    bm = Backmapper.from_run("run/modelparams.json", "run/fold0")
    ensemble = bm.backmap(cg_xyz, n_samples=16, seed=0)   # (16, N, 3)

Generation needs only CG geometry (prior -> decode -> channel lift,
cgvae.py:486-513 generate path of the reference); atom coordinates are not
required. Calls are jit-cached per (n_samples, n_frames) shape.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from coarsegrainingvae_tpu.config import ExperimentConfig
from coarsegrainingvae_tpu.data.batch import CGBatch
from coarsegrainingvae_tpu.data.neighbors import radius_graph_frames
from coarsegrainingvae_tpu.data.topology import channel_index_from_mapping


class Backmapper:
    """Jitted CG -> all-atom generator around a trained CGequiVAE/DenseCGVAE."""

    def __init__(self, model, params, mapping: np.ndarray,
                 atomic_nums: np.ndarray, cfg: ExperimentConfig,
                 bonds: Optional[np.ndarray] = None,
                 ref_xyz: Optional[np.ndarray] = None):
        self.model = model
        self.params = params
        self.mapping = np.asarray(mapping, np.int32)
        self.z = np.asarray(atomic_nums, np.int32)
        self.cfg = cfg
        self.n_atoms = self.mapping.shape[0]
        self.n_cgs = int(self.mapping.max()) + 1
        self.channel_idx = channel_index_from_mapping(self.mapping)
        # covalent bonds + one reference frame: the H bond-length
        # projection (ModelConfig.h_project / h_project_eval) reads bond
        # LENGTHS (chemical constants) from a true geometry -- without
        # them a projection-trained model would silently serve raw
        # (unprojected) hydrogens
        self.bonds = None if bonds is None else np.asarray(bonds, np.int32)
        self.ref_xyz = (
            None if ref_xyz is None else np.asarray(ref_xyz, np.float32)
        )
        wants_proj = getattr(cfg.model, "h_project", False) or getattr(
            cfg.model, "h_project_eval", False
        )
        if wants_proj and (self.bonds is None or self.ref_xyz is None):
            import warnings

            warnings.warn(
                "Backmapper: the run config enables H bond-length "
                "projection but no bonds/ref_xyz were provided -- served "
                "ensembles will carry RAW decoder hydrogens",
                RuntimeWarning,
            )
        self._gen = jax.jit(
            lambda p, batch, rng: self.model.apply(
                {"params": p}, batch, method=self.model.generate,
                rngs={"sample": rng},
            )
        )

    # ------------------------------------------------------------- loading
    @classmethod
    def from_run(cls, modelparams: str, fold_dir: str,
                 sparse: bool = False) -> "Backmapper":
        """Rebuild model + restore the latest checkpoint of a CV fold."""
        from coarsegrainingvae_tpu.data.proteins import load_frames
        from coarsegrainingvae_tpu.train.checkpoint import CheckpointManager
        from coarsegrainingvae_tpu.train.trainer import Trainer

        cfg = ExperimentConfig.load(modelparams)
        with open(os.path.join(fold_dir, "mapping.json")) as f:
            mapping = np.asarray(json.load(f), np.int32)
        z, frames, bonds = load_frames(cfg.data.dataset, 8, seed=cfg.data.seed)

        if sparse:
            from coarsegrainingvae_tpu.models.cgvae import CGequiVAE
            model = CGequiVAE(cfg=cfg.model)
        else:
            from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE
            model = DenseCGVAE(cfg=cfg.model)

        # template state for checkpoint restore
        from coarsegrainingvae_tpu.data.dataset import build_dataset
        ds = build_dataset(mapping, frames, cfg.model.atom_cutoff,
                           cfg.model.cg_cutoff, z, bonds,
                           order=cfg.data.edgeorder, rotate=False,
                           seed=cfg.data.seed)
        trainer = Trainer(model, cfg)
        template = trainer.init_state(ds.batch(np.arange(min(8, len(ds)))),
                                      seed=cfg.data.seed)
        mgr = CheckpointManager(os.path.join(fold_dir, "ckpt"))
        state, _, _ = mgr.restore(template)
        mgr.close()
        return cls(model, state.params, mapping, z, cfg,
                   bonds=bonds, ref_xyz=frames[0])

    # ------------------------------------------------------------ inference
    def _make_batch(self, cg_xyz: np.ndarray) -> CGBatch:
        """CG-only batch (atom coordinates zero; generation never reads
        them). Static shapes per (B,)."""
        cg_xyz = np.asarray(cg_xyz, np.float32)
        if cg_xyz.ndim == 2:
            cg_xyz = cg_xyz[None]
        b = cg_xyz.shape[0]
        n, m = self.n_atoms, self.n_cgs
        cg_nbrs, cg_mask = radius_graph_frames(
            cg_xyz, self.cfg.model.cg_cutoff,
            max_edges=max(m * (m - 1), 1), directed=True,
        )
        tile = lambda a: np.broadcast_to(a, (b,) + a.shape)
        xyz = (tile(self.ref_xyz) if self.ref_xyz is not None
               else np.zeros((b, n, 3), np.float32))
        if self.bonds is not None and len(self.bonds):
            bonds_b = tile(self.bonds)
            bond_mask = np.ones((b, self.bonds.shape[0]), bool)
        else:
            bonds_b = np.zeros((b, 1, 2), np.int32)
            bond_mask = np.zeros((b, 1), bool)
        return CGBatch(
            z=tile(self.z),
            xyz=xyz,
            atom_mask=np.ones((b, n), bool),
            cg_z=tile(np.arange(m, dtype=np.int32)),
            cg_xyz=cg_xyz,
            cg_mask=np.ones((b, m), bool),
            mapping=tile(self.mapping),
            channel_idx=tile(self.channel_idx),
            nbrs=np.zeros((b, 1, 2), np.int32),
            nbr_mask=np.zeros((b, 1), bool),
            cg_nbrs=cg_nbrs,
            cg_nbr_mask=cg_mask,
            bonds=bonds_b,
            bond_mask=bond_mask,
        )

    def backmap(
        self, cg_xyz: np.ndarray, n_samples: int = 1, seed: int = 0
    ) -> np.ndarray:
        """Generate all-atom ensembles for CG coordinates.

        cg_xyz: (M, 3) one frame or (F, M, 3). Returns
        (n_samples, N, 3) for one frame, else (F, n_samples, N, 3).
        """
        cg_xyz = np.asarray(cg_xyz, np.float32)
        single = cg_xyz.ndim == 2
        frames = cg_xyz[None] if single else cg_xyz
        rng = jax.random.PRNGKey(seed)

        apply_eval_proj = (
            getattr(self.cfg.model, "h_project_eval", False)
            and self.bonds is not None and self.ref_xyz is not None
        )
        outs = []
        for k, frame in enumerate(frames):
            batch = self._make_batch(np.repeat(frame[None], n_samples, axis=0))
            xyz = self._gen(self.params, batch, jax.random.fold_in(rng, k))
            if apply_eval_proj:
                from coarsegrainingvae_tpu.models.cgvae import (
                    flatten_batch,
                    project_h_bonds,
                )

                g = flatten_batch(batch)
                xyz = project_h_bonds(
                    jnp.asarray(xyz).reshape(-1, 3), g.z, g.xyz,
                    g.bonds, g.bond_mask,
                )
            outs.append(
                np.asarray(jax.device_get(xyz)).reshape(n_samples, self.n_atoms, 3)
            )
        out = np.stack(outs)
        return out[0] if single else out
