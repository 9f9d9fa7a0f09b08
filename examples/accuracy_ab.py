"""Accuracy A/B harness: train the dense flagship under two (or more)
configurations on identical data/seeds and compare held-out recon RMSD.

Round-1 used this protocol (ad hoc) for the sparse-vs-dense parity table in
DESIGN.md; round 2 added compute_dtype (f32 vs bf16 matmuls); round 3 adds
Adam-moment dtype and batch-size/LR-scaling variants (the north-star
levers). Each variant: 900 train / 200 test synthetic dipeptide frames,
n_basis=128, enc 2 / dec 3, 60 epochs. Prints one JSON line per variant.

Variant grammar: '+'-joined tokens, first = compute_dtype:
  float32 | bfloat16           matmul dtype
  +bf16adam                    Adam moments stored bfloat16
  +b<NN>                       batch size NN, LR scaled linearly by NN/32

Usage:
  python examples/accuracy_ab.py \
      --variants bfloat16,bfloat16+bf16adam,bfloat16+bf16adam+b64
"""
from __future__ import annotations

import argparse
import json

import jax
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--variants", default="float32,bfloat16",
                   help="comma list of compute_dtype values to compare")
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--n_basis", type=int, default=128)
    args = p.parse_args()

    from coarsegrainingvae_tpu.utils.compile_cache import enable as enable_cache

    enable_cache()
    from coarsegrainingvae_tpu.config import (
        DataConfig,
        ExperimentConfig,
        ModelConfig,
        TrainConfig,
    )
    from coarsegrainingvae_tpu.data.dataset import build_dataset
    from coarsegrainingvae_tpu.data.mappings import newman_mapping
    from coarsegrainingvae_tpu.data.synthetic import synthetic_peptide
    from coarsegrainingvae_tpu.eval.metrics import compute_rmsd_batch
    from coarsegrainingvae_tpu.eval.sampling import reconstruct_all
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE
    from coarsegrainingvae_tpu.parallel.mesh import make_mesh
    from coarsegrainingvae_tpu.train.trainer import Trainer

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=1100, seed=0)
    mapping = newman_mapping(bonds, z.shape[0], 3, seed=0)
    ds = build_dataset(
        mapping, frames, atom_cutoff=8.5, cg_cutoff=9.5, atomic_nums=z,
        bonds=bonds, order=2, rotate=True, seed=1,
    )
    train_ds = ds.subset(np.arange(0, 810))
    val_ds = ds.subset(np.arange(810, 900))
    test_ds = ds.subset(np.arange(900, 1100))

    for variant in args.variants.split(","):
        toks = variant.split("+")
        dtype = toks[0]
        adam_dtype = "float32"
        batch = 32
        for tok in toks[1:]:
            if tok == "bf16adam":
                adam_dtype = "bfloat16"
            elif tok.startswith("b") and tok[1:].isdigit():
                batch = int(tok[1:])
            else:
                raise ValueError(f"unknown variant token {tok!r}")
        cfg = ExperimentConfig(
            model=ModelConfig(
                n_cgs=3, n_basis=args.n_basis, n_rbf=8, atom_cutoff=8.5,
                cg_cutoff=9.5, enc_nconv=2, dec_nconv=3, activation="swish",
                dec_type="pseudo", breaksym=True, compute_dtype=dtype,
            ),
            data=DataConfig(batch_size=batch),
            train=TrainConfig(lr=3e-4 * batch / 32, beta=0.05, gamma=25.0,
                              grad_clip=0.01, adam_moment_dtype=adam_dtype),
        )
        trainer = Trainer(DenseCGVAE(cfg=cfg.model), cfg, mesh=make_mesh(1))
        state = trainer.init_state(train_ds.batch(np.arange(32)), seed=123)
        state, hist = trainer.fit(state, train_ds, val_ds, nepochs=args.epochs)

        out = reconstruct_all(
            trainer, state.params, test_ds, jax.random.PRNGKey(7),
            graph_eval=False,
        )
        rmsd = np.stack([
            compute_rmsd_batch(out["recon_xyzs"][i:i + 1],
                               out["true_xyzs"][i], z)[0]
            for i in range(len(test_ds))
        ])
        print(json.dumps({
            "variant": variant,
            "epochs_ran": len(hist),
            "final_val_recon": round(float(hist[-1]["val_recon"]), 4),
            "final_val_loss": round(float(hist[-1]["val_loss"]), 4),
            "test_rmsd_all_atom": round(float(rmsd[:, 0].mean()), 4),
            "test_rmsd_heavy": round(float(rmsd[:, 1].mean()), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
