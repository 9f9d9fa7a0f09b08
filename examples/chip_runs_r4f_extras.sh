echo "=== [extra1] covid spike-scale trained run, take 2 (slim-compile relax) ==="
timeout 9000 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
  -n_cgs 500 -batch_size 2 -ndata 240 -nepochs 100 -lr 3e-4 \
  -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -enc_nconv 2 -dec_nconv 4 -cg_method cgae \
  -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
  -n_ensemble 4 -nevals 8 -patience 100 -factor 0.6 -lr_patience 15 \
  -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r4i_covid
echo "=== [extra2] DiffPool v6: v5 recipe with the warmup-held controller ==="
timeout 3400 python -m coarsegrainingvae_tpu.cli.run_diffpool -ndata 2000 -n_cgs 8 \
  -nepochs 600 -batch_size 32 -lr 3e-4 -beta 0.02 -gamma 25.0 -n_pretrain 20 -tau_min 0.1 \
  -num_features 512 -nsplits 2 -patience 600 -lr_factor 0.6 \
  --sample_hard --graph_grad -graph_warmup 5000 -zeta 50.0 -steric_margin 0.3 -zeta_warmup 5000 --h_project \
  -logdir /tmp/r4h_diffpool_v6
echo "=== [extra3] PCN P6: p5 recipe + --bond_project ==="
timeout 2400 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
  -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
  -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 --bond_project \
  -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
  -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r4g_pcn_p6
echo "=== [extra4] dipeptide c6: c3 recipe + --h_project_eval ==="
timeout 2800 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -zeta 100.0 -steric_margin 0.3 -zeta_warmup 500 \
  --h_project_eval -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -max_folds 1 -seed 123 -logdir /tmp/r4i_dipeptide_c6
echo "ALL DONE QUEUE_EXTRAS"
