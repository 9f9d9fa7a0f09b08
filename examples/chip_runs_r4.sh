#!/bin/bash
# Round-4 chip-run queue, part A (VERDICT.md round-3 items 1, 2, 4 + the
# ADVICE.md batch-32 control fold). One TPU process at a time -- this
# script serializes every chip job. Run: bash examples/chip_runs_r4.sh
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== [1/5] chignolin full-size, -zeta 200 (VERDICT item 1) ==="
timeout 3500 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 450 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 200.0 -steric_margin 0.3 \
  -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 450 -factor 0.3 -lr_patience 45 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r4_chig_z200
echo "=== [2/5] chignolin full-size, -zeta 400 ==="
timeout 3500 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 450 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 400.0 -steric_margin 0.3 \
  -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 450 -factor 0.3 -lr_patience 45 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r4_chig_z400
echo "=== [3/5] dipeptide c2 north-star recipe, ALL 5 CV folds (VERDICT item 2) ==="
timeout 9000 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -seed 123 -logdir /tmp/r4_dipeptide_5fold
echo "=== [4/5] DiffPool v4: --graph_grad -zeta 50 retrain (VERDICT item 4) ==="
timeout 3400 python -m coarsegrainingvae_tpu.cli.run_diffpool -ndata 2000 -n_cgs 8 \
  -nepochs 600 -batch_size 32 -lr 3e-4 -beta 0.02 -gamma 25.0 -n_pretrain 20 -tau_min 0.1 \
  -num_features 512 -nsplits 2 -patience 600 -lr_factor 0.6 \
  --sample_hard --graph_grad -zeta 50.0 -steric_margin 0.3 -logdir /tmp/r4_diffpool_v4
echo "=== [5/5] batch-32 full-600-epoch control fold (ADVICE.md item 1) ==="
timeout 3200 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 32 -ndata 20000 -nepochs 600 -lr 8e-5 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -max_folds 1 -seed 123 -logdir /tmp/r4_dipeptide_b32ctrl
echo "ALL DONE QUEUE_R4A"
