#!/bin/bash
# Round-4 chip-run queue, part D (after r4c): the spike-protein-scale
# TRAINED run (VERDICT round-3 "missing" item 4 -- the 62 ms/step smoke
# never produced a trained model or metrics). Synthetic 'covid' preset
# (~9.5k atoms, data/synthetic.py), sparse segment-sum formulation with
# degree_norm, learned cgae mapping at 500 beads. Dataset generation
# (TPU-relaxed) is cached under /tmp/cgvae_synth_cache on first run.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
echo "=== [1/1] covid spike-scale trained run: 9.5k atoms, 500 beads ==="
timeout 9000 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
  -n_cgs 500 -batch_size 2 -ndata 240 -nepochs 120 -lr 3e-4 \
  -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -enc_nconv 2 -dec_nconv 4 -cg_method cgae \
  -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
  -n_ensemble 4 -nevals 8 -patience 120 -factor 0.6 -lr_patience 15 \
  -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r4d_covid
echo "ALL DONE QUEUE_R4D"
