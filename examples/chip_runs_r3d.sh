#!/bin/bash
# Round-3 chip-run queue, part D (runs after examples/chip_runs_r3.sh).
# [1/4] DiffPool v4: v2 recipe + hard-assignment sampling + gradient-active
#       graph term + excluded-volume hinge (the committed v2/v3 runs carry
#       the reference loss surface; this measures the repo extensions).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
timeout 3400 python -m coarsegrainingvae_tpu.cli.run_diffpool -ndata 2000 -n_cgs 8 \
  -nepochs 600 -batch_size 32 -lr 3e-4 -beta 0.02 -gamma 25.0 -n_pretrain 20 -tau_min 0.1 \
  -num_features 512 -nsplits 2 -patience 600 -lr_factor 0.6 \
  --sample_hard --graph_grad -zeta 50.0 -steric_margin 0.3 -logdir /tmp/diffpool_v4
echo "=== [2/4] dipeptide c3: c2 north-star recipe + zeta 100 ==="
timeout 2200 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -zeta 100.0 -steric_margin 0.3 \
  -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -max_folds 1 -seed 123 -logdir /tmp/dipeptide_c3
echo "=== [3/4] bench probe: batch 128 ==="
BENCH_BATCH=128 timeout 900 python bench.py; cp BENCH_DETAILS.json /tmp/bench_b128.json
echo "=== [4/4] bench probe: batch 192 ==="
BENCH_BATCH=192 timeout 900 python bench.py; cp BENCH_DETAILS.json /tmp/bench_b192.json
git checkout -- BENCH_DETAILS.json 2>/dev/null
echo "ALL DONE QUEUE_R3D"
