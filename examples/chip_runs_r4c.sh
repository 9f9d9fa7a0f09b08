#!/bin/bash
# Round-4 chip-run queue, part C (after r4b): PCN at 120-180 residues
# (VERDICT item 5 target scale) with the new batched steric term, the
# PCN pseudo-decoder A/B, a DiffPool retrain with the steric warmup, and
# a batch-192 bench probe.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== [1/4] PCN large: 120-180 res, aux_warmup 60, zeta 20 ==="
timeout 3600 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 300 -min_res 120 -max_res 181 \
  -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
  -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 \
  -batch_size 4 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
  -cutoff 10.0 -n_dump 6 --dec_type cross -logdir /tmp/r4c_pcn_large
echo "=== [2/4] PCN P5: p3 + batched steric (census: spurious contacts outnumber missing bonds 4:1) ==="
timeout 2400 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
  -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
  -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 \
  -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
  -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r4c_pcn_p5
echo "=== [3/4] DiffPool v5: graph_grad + warmups (v4 showed step-0 graph pressure stalls recon) ==="
timeout 3400 python -m coarsegrainingvae_tpu.cli.run_diffpool -ndata 2000 -n_cgs 8 \
  -nepochs 600 -batch_size 32 -lr 3e-4 -beta 0.02 -gamma 25.0 -n_pretrain 20 -tau_min 0.1 \
  -num_features 512 -nsplits 2 -patience 600 -lr_factor 0.6 \
  --sample_hard --graph_grad -graph_warmup 5000 -zeta 50.0 -steric_margin 0.3 -zeta_warmup 5000 --h_project \
  -logdir /tmp/r4c_diffpool_v5
echo "=== [4/4] bench probe: batch 192 ==="
BENCH_BATCH=192 BENCH_FAST=1 timeout 1200 python bench.py
git checkout -- BENCH_DETAILS.json 2>/dev/null
echo "ALL DONE QUEUE_R4C"
