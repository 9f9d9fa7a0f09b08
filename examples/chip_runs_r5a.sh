#!/bin/bash
# Round-5 chip queue, part A (after the bench warm-up run):
# [1] chignolin v12 -- the per-pair data-margin steric lever at the v10
#     zeta-800 operating point (VERDICT r4 item 2, first orthogonal lever):
#     --steric_data_margin with the cap raised to 0.6 (the round-4 census
#     measured ~0.55 A data margins on the failing same-bead contacts; the
#     per-pair clip makes the higher cap safe because pairs the data brings
#     close keep their own lower threshold).
# [2] dipeptide c2 north-star recipe, ALL 5 folds, on the v7 vdW-floor
#     synthetic data (VERDICT r4 item 3: re-land the 5-fold rollup without
#     the fold-4 outlier class; cv_stats now also carries median/p99).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== [1/2] chignolin v12: v10 recipe + --steric_data_margin (cap 0.6) ==="
timeout 4200 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 600 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 800.0 -steric_margin 0.6 -zeta_warmup 2000 \
  --steric_data_margin --h_project -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 600 -factor 0.3 -lr_patience 60 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r5a_chig_v12
echo "=== [2/2] dipeptide c2 recipe, ALL 5 folds, v7 vdW-floor data ==="
timeout 9000 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -seed 123 -logdir /tmp/r5a_dipeptide_5fold
echo "ALL DONE QUEUE_R5A"
