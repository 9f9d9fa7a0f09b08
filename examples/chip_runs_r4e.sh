#!/bin/bash
# Round-4 chip-run queue, part E (after r4d): chignolin validity push,
# informed by the round-4 census of the z200w run (fold0/test_recon.xyz):
# remaining failures = missing X-H covalent bonds (eta_h targets these;
# the steric hinge cannot) + spurious heavy contacts whose DATA margin
# (~0.55 A) exceeds the old hinge margin 0.3 (-> margin 0.5).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== [1/3] dipeptide c5: c3 recipe + --h_project (all-atom validity shot) ==="
timeout 2800 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -zeta 100.0 -steric_margin 0.3 -zeta_warmup 500 \
  --h_project -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -max_folds 1 -seed 123 -logdir /tmp/r4e_dipeptide_c5
echo "=== [2/3] chignolin v8: zeta 400 w1000, margin 0.5, --h_project ==="
timeout 3600 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 600 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 400.0 -steric_margin 0.5 -zeta_warmup 1000 \
  --h_project -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 600 -factor 0.3 -lr_patience 60 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r4e_chig_v8
echo "=== [3/3] chignolin v9: reference-recipe fidelity (batch 2, lr 1e-4, 100 epochs) + zeta/eta_h shaping ==="
timeout 5400 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 2 -ndata 5000 -nepochs 100 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 400.0 -steric_margin 0.5 -zeta_warmup 1000 \
  -eta_h 4.0 -dec_nconv 9 -enc_nconv 2 -lr 1e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 100 -factor 0.3 -lr_patience 30 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r4e_chig_v9

echo "=== [4/4] chignolin v10: zeta 800 dose-response rung ==="
timeout 3600 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 600 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 800.0 -steric_margin 0.5 -zeta_warmup 2000 \
  --h_project -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 600 -factor 0.3 -lr_patience 60 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r4e_chig_v10
echo "ALL DONE QUEUE_R4E"
