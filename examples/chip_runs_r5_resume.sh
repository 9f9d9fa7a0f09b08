#!/bin/bash
# Round-5 resumed chip queue (stage [1] chig v12 already landed & committed
# as a negative result -> the fold-1/2 recipe below is the committed v10).
#
# Deadline-aware: each stage only STARTS if enough budget remains, and the
# final bench refresh (which re-warms the persistent XLA cache for the
# driver's end-of-round capture -- VERDICT r4 item 1) ALWAYS runs last.
# The whole queue drains before the round ends so the driver's bench client
# never contends with a still-running training client (one TPU process at
# a time, CLAUDE.md).
#
# Run detached: setsid nohup bash examples/chip_runs_r5_resume.sh &
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
S=/tmp/r5_resume_status.log
LIVE=/root/repo/examples/results/_r5_live
mkdir -p "$LIVE"
TOTAL=${R5_TOTAL_BUDGET:-24000}   # seconds of queue budget (default ~6h40m)
left() { echo $(( TOTAL - SECONDS )); }
note() { echo "$1 t=${SECONDS}s left=$(left)s $(date)" >> "$S"; }
save() { # save <prefix> <logdir>: copy small artifacts into the repo tree
  for f in "$2"/*.csv "$2"/*.json; do
    [ -f "$f" ] && cp "$f" "$LIVE/$1_$(basename "$f")"
  done
}
note "RESUME START"

# [A] chignolin folds 1-2, committed v10 recipe (VERDICT item 2: make the
#     0.469 operating point a >=3-fold statistic).
if [ "$(left)" -ge 5600 ]; then
  timeout 5400 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
    -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 600 -atom_cutoff 12.0 -cg_cutoff 25.0 \
    -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 800.0 -steric_margin 0.5 -zeta_warmup 2000 \
    --h_project -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
    -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
    -patience 600 -factor 0.3 -lr_patience 60 -min_lr 1e-13 \
    -fold_offset 1 -max_folds 2 \
    --dec_type cross -seed 123 -logdir /tmp/r5d_chig_folds12 > /tmp/r5_chig_f12.log 2>&1
  note "STAGE chig_folds12 rc=$?"
  save chig_folds12 /tmp/r5d_chig_folds12
else note "SKIP chig_folds12 (budget)"; fi

# [B] dipeptide north-star, ALL 5 folds, SYNTH v7 vdW-floor data
#     (VERDICT item 3: re-land the rollup without the fold-4 outlier class).
if [ "$(left)" -ge 7400 ]; then
  timeout 7200 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
    -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
    -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
    -beta 0.05 -gamma 25.0 -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
    -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
    -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
    -seed 123 -logdir /tmp/r5a_dipeptide_5fold > /tmp/r5_dip5fold.log 2>&1
  note "STAGE dipeptide_5fold rc=$?"
  save dip5fold /tmp/r5a_dipeptide_5fold
else note "SKIP dipeptide_5fold (budget)"; fi

# [C] DiffPool v6 (VERDICT item 5: warmup-held controller, cash >=0.3).
if [ "$(left)" -ge 3600 ]; then
  timeout 3400 python -m coarsegrainingvae_tpu.cli.run_diffpool -ndata 2000 -n_cgs 8 \
    -nepochs 600 -batch_size 32 -lr 3e-4 -beta 0.02 -gamma 25.0 -n_pretrain 20 -tau_min 0.1 \
    -num_features 512 -nsplits 2 -patience 600 -lr_factor 0.6 \
    --sample_hard --graph_grad -graph_warmup 5000 -zeta 50.0 -steric_margin 0.3 -zeta_warmup 5000 --h_project \
    -logdir /tmp/r5b_diffpool_v6 > /tmp/r5_diffpool_v6.log 2>&1
  note "STAGE diffpool_v6 rc=$?"
  save diffpool_v6 /tmp/r5b_diffpool_v6
else note "SKIP diffpool_v6 (budget)"; fi

# [D] PCN p7: well-posed data + bond projection (VERDICT item 6).
if [ "$(left)" -ge 2900 ]; then
  timeout 2700 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
    -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
    -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 --bond_project --well_posed_data \
    -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
    -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r5b_pcn_p7 > /tmp/r5_pcn_p7.log 2>&1
  note "STAGE pcn_p7 rc=$?"
  save pcn_p7 /tmp/r5b_pcn_p7
else note "SKIP pcn_p7 (budget)"; fi

# [E] PCN p7s: the --stochastic A/B arm at matched budget (VERDICT item 7).
if [ "$(left)" -ge 2900 ]; then
  timeout 2700 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
    -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
    -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 --bond_project --well_posed_data \
    --stochastic -beta 0.05 -n_ensemble 8 \
    -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
    -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r5b_pcn_p7s > /tmp/r5_pcn_p7s.log 2>&1
  note "STAGE pcn_p7s rc=$?"
  save pcn_p7s /tmp/r5b_pcn_p7s
else note "SKIP pcn_p7s (budget)"; fi

# [F] dipeptide c6: --h_project_eval A/B arm, full budget (VERDICT item 4).
if [ "$(left)" -ge 3500 ]; then
  timeout 3300 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
    -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
    -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
    -beta 0.05 -gamma 25.0 -zeta 100.0 -steric_margin 0.3 -zeta_warmup 500 \
    --h_project_eval -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
    -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
    -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
    -max_folds 1 -seed 123 -logdir /tmp/r5c_dipeptide_c6 > /tmp/r5_dip_c6.log 2>&1
  note "STAGE dipeptide_c6 rc=$?"
  save dip_c6 /tmp/r5c_dipeptide_c6
else note "SKIP dipeptide_c6 (budget)"; fi

# [G] batch-256 throughput probe (VERDICT item 9) -- run from /tmp so its
#     BENCH_DETAILS.json does not clobber the committed b128 artifact.
if [ "$(left)" -ge 2000 ]; then
  mkdir -p /tmp/r5c_b256 && cd /tmp/r5c_b256
  BENCH_BATCH=256 BENCH_FAST=1 timeout 1800 python /root/repo/bench.py > /tmp/r5_b256.log 2>&1
  note "STAGE b256_probe rc=$?"
  cp /tmp/r5c_b256/BENCH_DETAILS.json "$LIVE/b256_BENCH_DETAILS.json" 2>/dev/null
  cd /root/repo
else note "SKIP b256_probe (budget)"; fi

# [H] covid spike-scale trained run (VERDICT item 8) -- only with room to
#     spare for the final bench; timeout capped to what's left minus bench.
COVID_T=$(( $(left) - 3000 ))
if [ "$COVID_T" -ge 3600 ]; then
  [ "$COVID_T" -gt 7200 ] && COVID_T=7200
  timeout "$COVID_T" python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
    -n_cgs 500 -batch_size 2 -ndata 240 -nepochs 100 -lr 3e-4 \
    -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
    -beta 0.05 -gamma 25.0 -enc_nconv 2 -dec_nconv 4 -cg_method cgae \
    -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
    -n_ensemble 4 -nevals 8 -patience 100 -factor 0.6 -lr_patience 15 \
    -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r5d_covid > /tmp/r5_covid.log 2>&1
  note "STAGE covid rc=$? (cap ${COVID_T}s)"
  save covid /tmp/r5d_covid
else note "SKIP covid (budget)"; fi

# [I] final bench refresh: fresh BENCH_DETAILS.json at the repo root and a
#     WARM persistent XLA cache for the driver's end-of-round capture.
timeout 2700 python /root/repo/bench.py > /tmp/r5_final_bench.log 2>&1
note "STAGE bench_refresh rc=$?"
note "RESUME ALL DONE"
