"""End-to-end quickstart: data -> mapping -> training -> evaluation ->
generative backmapping -> artifacts.

Runs on whatever JAX device is available (TPU, or CPU with
JAX_PLATFORMS=cpu). Takes a couple of minutes on one chip; drop an
`{name}.npz` cache under $COARSEGRAININGVAE_DATA to use real trajectories
instead of the synthetic stand-in.

    python examples/quickstart.py
"""
import os

import jax
import numpy as np

from coarsegrainingvae_tpu.config import (
    DataConfig, ExperimentConfig, ModelConfig, TrainConfig,
)
from coarsegrainingvae_tpu.data.dataset import build_dataset
from coarsegrainingvae_tpu.data.mappings import get_mapping
from coarsegrainingvae_tpu.data.proteins import load_frames
from coarsegrainingvae_tpu.eval.sampling import reconstruct_all, sample_ensemble
from coarsegrainingvae_tpu.models.dense_cgvae import DenseCGVAE
from coarsegrainingvae_tpu.serve import Backmapper
from coarsegrainingvae_tpu.train.trainer import Trainer
from coarsegrainingvae_tpu.utils.compile_cache import enable as enable_cache
from coarsegrainingvae_tpu.utils.visualization import save_rotate_frames


def main(out_dir: str = "./quickstart_out", ndata: int = 400,
         nepochs: int = 20) -> dict:
    enable_cache()
    os.makedirs(out_dir, exist_ok=True)

    # 1. frames + a CG mapping (Girvan-Newman over the bond graph)
    z, frames, bonds = load_frames("dipeptide", ndata, seed=0)
    mapping = get_mapping("newman", 3, z.shape[0], bonds=bonds, frames=frames)

    # 2. preprocess once to fixed-shape arrays
    n_tr = int(ndata * 0.8)
    n_val = int(ndata * 0.1)
    kw = dict(atom_cutoff=8.5, cg_cutoff=9.5, atomic_nums=z, bonds=bonds,
              order=2, seed=0)
    ds_tr = build_dataset(mapping, frames[:n_tr], **kw)
    lim = dict(max_atom_edges=ds_tr.nbrs.shape[1],
               max_cg_edges=ds_tr.cg_nbrs.shape[1])
    ds_val = build_dataset(mapping, frames[n_tr:n_tr + n_val], rotate=False,
                           **lim, **kw)
    ds_te = build_dataset(mapping, frames[n_tr + n_val:], rotate=False,
                          **lim, **kw)

    # 3. train (each epoch = one XLA program on device-resident data)
    cfg = ExperimentConfig(
        model=ModelConfig(n_cgs=3, n_basis=128, n_rbf=8, atom_cutoff=8.5,
                          cg_cutoff=9.5, enc_nconv=2, dec_nconv=3,
                          dec_type="pseudo", breaksym=True),
        data=DataConfig(batch_size=32, seed=0),
        train=TrainConfig(lr=3e-4, beta=0.05, gamma=25.0),
    )
    trainer = Trainer(DenseCGVAE(cfg=cfg.model), cfg)
    state = trainer.init_state(ds_tr.batch(np.arange(32)))
    state, history = trainer.fit(state, ds_tr, ds_val, nepochs=nepochs)
    print(f"trained {len(history)} epochs; "
          f"val recon {history[-1]['val_recon']:.3f}")

    # 4. evaluate: reconstruction RMSD + prior-ensemble sampling quality
    rng = jax.random.PRNGKey(0)
    recon = reconstruct_all(trainer, state.params, ds_te, rng,
                            batch_size=32, graph_eval=True)
    print(f"test all-atom RMSD {recon['all_atom_rmsd']:.3f} A, "
          f"heavy {recon['heavy_atom_rmsd']:.3f} A")
    samples = sample_ensemble(trainer, state.params, ds_te,
                              np.arange(4), n_sample=8,
                              rng=jax.random.fold_in(rng, 1), graph_eval=True)

    # 5. generative backmapping of NEW CG coordinates through the serving API
    bm = Backmapper(trainer.model, jax.device_get(state.params), mapping, z, cfg)
    ensemble = bm.backmap(np.asarray(ds_te.cg_xyz[0]), n_samples=8, seed=3)
    print(f"backmapped ensemble: {ensemble.shape}")

    # 6. artifacts: rotating-grid movie of the generated ensemble
    save_rotate_frames(ensemble, z, os.path.join(out_dir, "ensemble.xyz"))
    print(f"wrote {out_dir}/ensemble.xyz")
    return {"rmsd": recon["all_atom_rmsd"], "ensemble": ensemble.shape}


if __name__ == "__main__":
    main()
