#!/bin/bash
# Round-5 chip queue, part B:
# [1] DiffPool v6 -- the queued v5 recipe rerun now that the LR-collapse
#     controller bug is fixed (warmup-held plateau controller; VERDICT r4
#     item 5: cash the >=0.3 sample-validity target on both folds).
# [2] PCN p7 -- p6 recipe (+ --bond_project) on WELL-POSED data
#     (--well_posed_data: truth graphs are the intended covalent trees, so
#     GED 0 is achievable; VERDICT r4 item 6).
# [3] PCN p7s -- the StochasticPCN A/B arm: identical budget + --stochastic
#     (best-of-K prior sampling vs the deterministic conditional-mean floor;
#     VERDICT r4 item 7).
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== [1/3] DiffPool v6: v5 recipe with the warmup-held controller ==="
timeout 3400 python -m coarsegrainingvae_tpu.cli.run_diffpool -ndata 2000 -n_cgs 8 \
  -nepochs 600 -batch_size 32 -lr 3e-4 -beta 0.02 -gamma 25.0 -n_pretrain 20 -tau_min 0.1 \
  -num_features 512 -nsplits 2 -patience 600 -lr_factor 0.6 \
  --sample_hard --graph_grad -graph_warmup 5000 -zeta 50.0 -steric_margin 0.3 -zeta_warmup 5000 --h_project \
  -logdir /tmp/r5b_diffpool_v6
echo "=== [2/3] PCN p7: well-posed data + bond projection ==="
timeout 2700 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
  -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
  -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 --bond_project --well_posed_data \
  -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
  -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r5b_pcn_p7
echo "=== [3/3] PCN p7s: the --stochastic A/B arm at matched budget ==="
timeout 2700 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
  -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
  -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 --bond_project --well_posed_data \
  --stochastic -beta 0.05 -n_ensemble 8 \
  -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
  -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r5b_pcn_p7s
echo "ALL DONE QUEUE_R5B"
