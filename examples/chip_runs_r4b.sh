#!/bin/bash
# Round-4 chip-run queue, part B: chignolin steric retrains with the
# -zeta_warmup ramp (part A's unwarmed runs died at step 0 -- the
# full-weight steric direction blows up the deep decoder; see
# train/trainer.py), the all-atom-validity A/B on dipeptide
# (-zeta + -eta_h additive X-H term), PCN aux_warmup, and the new bench.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== [1/6] chignolin full-size, -zeta 200 -zeta_warmup 1000 ==="
timeout 3500 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 450 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 200.0 -steric_margin 0.3 -zeta_warmup 1000 \
  -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 450 -factor 0.3 -lr_patience 45 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r4b_chig_z200w
echo "=== [2/6] dipeptide c3: c2 recipe + zeta 100 (warmup 500) ==="
timeout 2300 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -zeta 100.0 -steric_margin 0.3 -zeta_warmup 500 \
  -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -max_folds 1 -seed 123 -logdir /tmp/r4b_dipeptide_c3
echo "=== [3/6] dipeptide c4: c3 + additive X-H term (-eta_h 4) ==="
timeout 2300 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -zeta 100.0 -steric_margin 0.3 -zeta_warmup 500 \
  -eta_h 4.0 \
  -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -max_folds 1 -seed 123 -logdir /tmp/r4b_dipeptide_c4
echo "=== [4/6] chignolin full-size, -zeta 400 -zeta_warmup 1000 ==="
timeout 3500 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 450 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 400.0 -steric_margin 0.3 -zeta_warmup 1000 \
  -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 450 -factor 0.3 -lr_patience 45 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r4b_chig_z400w
echo "=== [5/6] PCN P3: aux_warmup 60, lr 3e-3, 50-80res ==="
timeout 2400 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
  -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
  -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
  -cutoff 10.0 -n_dump 6 --dec_type cross -logdir /tmp/r4b_pcn_p3
echo "=== [6/6] bench (new multi-config details) ==="
timeout 1800 python bench.py
echo "ALL DONE QUEUE_R4B"
