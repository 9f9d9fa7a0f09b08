#!/bin/bash
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
# Round-3 chip-run queue (blocked at round end by a ~12h TPU-tunnel outage;
# re-run when the tunnel is back). [1/5] = chignolin S1: fix2 recipe + zeta 100.
timeout 3500 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 450 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 100.0 -steric_margin 0.3 \
  -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 450 -factor 0.3 -lr_patience 45 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/chignolin_s1
echo "=== [2/5] chignolin S2: zeta 400 ==="
timeout 3500 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 450 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 400.0 -steric_margin 0.3 \
  -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 450 -factor 0.3 -lr_patience 45 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/chignolin_s2
echo "=== [3/5] DiffPool v3: v2 recipe + hard-assignment sampling ==="
timeout 3400 python -m coarsegrainingvae_tpu.cli.run_diffpool -ndata 2000 -n_cgs 8 \
  -nepochs 600 -batch_size 32 -lr 3e-4 -beta 0.02 -gamma 25.0 -n_pretrain 20 -tau_min 0.1 \
  -num_features 512 -nsplits 2 -patience 600 -lr_factor 0.6 \
  --sample_hard -logdir /tmp/diffpool_v3
echo "=== [4/5] PCN P3: aux_warmup 60, lr 3e-3, 50-80res ==="
timeout 2400 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
  -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
  -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
  -cutoff 10.0 -n_dump 6 --dec_type cross -logdir /tmp/pcn_p3
echo "=== [5/5] PCN P4: pseudo decoder A/B ==="
timeout 2400 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
  -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
  -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
  -cutoff 10.0 -n_dump 2 --dec_type pseudo -logdir /tmp/pcn_p4
echo "ALL DONE QUEUE_R3C"
# (queued rounds continue in /tmp/chip_queue_r3d.sh / r3e.sh: DiffPool v4
# with --graph_grad -zeta 50, the c2 dipeptide full-budget fold -zeta 100,
# and BENCH_BATCH=128/192 bench probes)
