#!/bin/bash
# Round-5 chip queue, part C:
# [1] dipeptide c6 -- the --h_project_eval arm of the all-atom-validity A/B
#     (VERDICT r4 item 4): training untouched (zeta 100 only), H projection
#     applied at EVAL, full 600-epoch budget, v7 data. Compare against the
#     committed trained-through c5 arm (sample all-atom 0.561).
# [2] batch-256 throughput probe (VERDICT r4 item 9): BENCH_BATCH=256, fast
#     mode (headline only) -- b128 vs b256 rung on the same chip session.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== [1/2] dipeptide c6: zeta 100 + --h_project_eval, full budget ==="
timeout 3300 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -zeta 100.0 -steric_margin 0.3 -zeta_warmup 500 \
  --h_project_eval -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -max_folds 1 -seed 123 -logdir /tmp/r5c_dipeptide_c6
echo "=== [2/2] batch-256 throughput probe (headline only) ==="
# run from /tmp so the probe's BENCH_DETAILS.json (headline-only, b256)
# does not clobber the committed full b128 artifact in the repo root
mkdir -p /tmp/r5c_b256 && cd /tmp/r5c_b256
BENCH_BATCH=256 BENCH_FAST=1 timeout 1800 python /root/repo/bench.py
cd /root/repo
echo "ALL DONE QUEUE_R5C"
