"""Benchmark: dipeptide-config training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline derivation (reference README.md:53-58): one dipeptide CV fold
(~14,400 train frames after the 0.9 val split of a 16,000-frame fold,
600 epochs, batch 32) takes ~2 h on one GPU =>
600 * 14400 / 7200 s = 1200 samples/s/device.
"""
from __future__ import annotations

import json
import time

import jax
import numpy as np

REFERENCE_SAMPLES_PER_SEC = 1200.0


def main() -> None:
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
    from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE
    from coarsegrainingvae_tpu.parallel.mesh import make_mesh
    from coarsegrainingvae_tpu.train.trainer import Trainer

    # canonical dipeptide benchmark architecture (README.md:58) at the
    # round-3 training recipe: batch 128 + linearly-scaled LR, bf16 matmuls
    # AND bf16 Adam moments. Accuracy at this recipe is gated by the
    # committed full-600-epoch fold examples/results/dipeptide_fullbudget/
    # c2_warm_cv_stats.csv (batch 128 / lr 3.2e-4: test RMSD 1.477 A --
    # the best of any committed fold), so the bench batch is not a
    # throughput-only inflation.
    import os

    # default = the committed c2 north-star recipe; BENCH_BATCH lets a
    # probe measure other batch sizes without changing the contract
    batch_size = int(os.environ.get("BENCH_BATCH", "128"))
    # linear LR scaling around the measured-parity (batch 64, 1.6e-4) point
    lr = 1.6e-4 * (batch_size / 64)
    cfg = ExperimentConfig(
        model=ModelConfig(
            n_cgs=3, n_basis=600, n_rbf=8, atom_cutoff=8.5, cg_cutoff=9.5,
            enc_nconv=4, dec_nconv=5, activation="swish", dec_type="pseudo",
            breaksym=True,
        ),
        data=DataConfig(batch_size=batch_size),
        train=TrainConfig(lr=lr, beta=0.05, gamma=25.0, grad_clip=0.01,
                          adam_moment_dtype="bfloat16"),
    )

    z, frames, bonds = synthetic_peptide("dipeptide", n_frames=256, seed=0)
    mapping = newman_mapping(bonds, z.shape[0], 3, seed=0)
    ds = build_dataset(
        mapping, frames, atom_cutoff=8.5, cg_cutoff=9.5, atomic_nums=z,
        bonds=bonds, order=2, rotate=True,
    )

    from coarsegrainingvae_tpu.data.device import DeviceDataset

    # dense-regime flagship: same architecture, einsum aggregation (no
    # gathers/scatters) -- measured ~2.8x the segment-sum formulation on
    # one v5e chip at this system size
    model = DenseCGVAE(cfg=cfg.model)
    n_dev = 1
    trainer = Trainer(model, cfg, mesh=make_mesh(n_dev))
    batch = ds.batch(np.arange(batch_size))
    state = trainer.init_state(batch, seed=0)

    # device-resident data + epoch-as-one-jit: the whole measured run is a
    # single lax.scan over (S, B) index batches -- zero per-step host work
    dds = DeviceDataset.from_dataset(ds)
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(0)
    n_steps = 100
    idx = np.stack(
        [np.arange((i * batch_size) % (len(ds) - batch_size),
                   (i * batch_size) % (len(ds) - batch_size) + batch_size)
         for i in range(n_steps)]
    ).astype(np.int32)

    scan = jax.jit(trainer._epoch_scan_impl, donate_argnums=(0,))
    # warmup / compile at the same (S, B) shape as the timed call
    state, metrics = scan(state, dds, jnp.asarray(idx), rng)
    m0 = {k: np.asarray(jax.device_get(v)) for k, v in metrics.items()}

    t0 = time.perf_counter()
    state, metrics = scan(state, dds, jnp.asarray(idx), jax.random.fold_in(rng, 1))
    jax.device_get(metrics["loss"])  # true sync (block_until_ready does
    # not reliably synchronize on the tunneled axon backend)
    dt = time.perf_counter() - t0

    # accuracy tie-in: the throughput number is only meaningful if the SAME
    # run is learning -- record the loss/recon trend across the measured
    # scans to a side artifact (stdout stays ONE json line)
    m1 = {k: np.asarray(jax.device_get(v)) for k, v in metrics.items()}

    samples_per_sec = n_steps * batch_size / dt
    per_chip = samples_per_sec / n_dev
    details = {
        "config": f"dipeptide n_cgs=3 n_basis=600 enc4/dec5 pseudo "
                  f"batch{batch_size} lr-scaled bf16-matmuls bf16-adam",
        "pseudo_impl": cfg.model.pseudo_impl,
        "message_impl": cfg.model.message_impl,
        "ms_per_step": round(dt / n_steps * 1e3, 3),
        "loss_scan1_first10_mean": float(m0["loss"][:10].mean()),
        "loss_scan2_last10_mean": float(m1["loss"][-10:].mean()),
        "recon_scan1_first10_mean": float(m0["recon"][:10].mean()),
        "recon_scan2_last10_mean": float(m1["recon"][-10:].mean()),
        "learning": bool(m1["loss"][-10:].mean() < m0["loss"][:10].mean()),
    }
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip_dipeptide",
                "value": round(per_chip, 2),
                "unit": "samples/s/chip",
                "vs_baseline": round(per_chip / REFERENCE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
