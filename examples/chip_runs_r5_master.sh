#!/bin/bash
# Round-5 master chip queue: the full remaining sequence, one TPU client
# at a time, in VERDICT-r4 priority order. Generous per-stage timeouts
# (the tunnel can wedge 15-30 min at device open; the client must sit
# through it, CLAUDE.md). Designed to run detached (setsid) so it
# survives builder-session restarts; progress lands in
# /tmp/r5_master_status.log and per-stage logs.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
S=/tmp/r5_master_status.log
echo "MASTER START $(date)" >> "$S"

# [1] chignolin v12: per-pair data-margin steric at the v10 zeta-800
#     operating point (VERDICT item 2, lever 1), fold 0.
timeout 6600 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 600 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 800.0 -steric_margin 0.6 -zeta_warmup 2000 \
  --steric_data_margin --h_project -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 600 -factor 0.3 -lr_patience 60 -min_lr 1e-13 -max_folds 1 \
  --dec_type cross -seed 123 -logdir /tmp/r5a_chig_v12 > /tmp/r5_chig_v12.log 2>&1
echo "STAGE chig_v12 rc=$? $(date)" >> "$S"

# [2] dipeptide c2 north-star recipe, ALL 5 folds, SYNTH v7 vdW-floor data
#     (VERDICT item 3: re-land the rollup without the fold-4 outlier).
timeout 10800 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset dipeptide \
  -n_cgs 3 -batch_size 128 -ndata 20000 -nepochs 600 -lr 3.2e-4 \
  -n_basis 600 -n_rbf 8 -atom_cutoff 8.5 -cg_cutoff 9.5 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -enc_nconv 4 -dec_nconv 5 -cg_method cgae \
  -edgeorder 2 --dec_type pseudo --graph_eval -n_ensemble 16 \
  -nevals 36 -patience 600 -factor 0.9 -lr_patience 10 -min_lr 1e-13 \
  -seed 123 -logdir /tmp/r5a_dipeptide_5fold > /tmp/r5_dip5fold.log 2>&1
echo "STAGE dipeptide_5fold rc=$? $(date)" >> "$S"

# [3] chignolin folds 1-2 of the winner recipe (multi-fold statistic,
#     VERDICT item 2). Winner = v12 if its fold-0 sample heavy validity
#     matched/beat v10's 0.469, else the committed v10 recipe.
WINNER=$(python3 - <<'PY'
import csv, glob
best = -1.0
for p in glob.glob('/tmp/r5a_chig_v12*/cv_stats.csv'):
    with open(p) as f:
        for r in csv.DictReader(f):
            best = max(best, float(r['sample_heavy_valid_ratio']))
print('v12' if best >= 0.469 else 'v10')
PY
)
if [ "$WINNER" = "v12" ]; then
  EXTRA="-steric_margin 0.6 --steric_data_margin"
else
  EXTRA="-steric_margin 0.5"
fi
echo "STAGE winner=$WINNER extra='$EXTRA' $(date)" >> "$S"
timeout 9000 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset chignolin \
  -n_cgs 6 -batch_size 16 -ndata 5000 -nepochs 600 -atom_cutoff 12.0 -cg_cutoff 25.0 \
  -nsplits 5 -beta 0.05 -gamma 50.0 -zeta 800.0 -zeta_warmup 2000 $EXTRA \
  --h_project -dec_nconv 9 -enc_nconv 2 -lr 3e-4 -n_basis 600 \
  -n_rbf 10 -cg_method cgae --graph_eval -n_ensemble 8 -nevals 24 \
  -patience 600 -factor 0.3 -lr_patience 60 -min_lr 1e-13 \
  -fold_offset 1 -max_folds 2 \
  --dec_type cross -seed 123 -logdir /tmp/r5d_chig_folds12 > /tmp/r5_chig_f12.log 2>&1
echo "STAGE chig_folds12 rc=$? $(date)" >> "$S"

# [4] DiffPool v6 + PCN p7 + PCN p7s (VERDICT items 5, 6, 7).
bash /root/repo/examples/chip_runs_r5b.sh > /tmp/r5b.log 2>&1
echo "STAGE r5b rc=$? $(date)" >> "$S"

# [5] dipeptide c6 (--h_project_eval A/B arm) + b256 probe (items 4, 9).
bash /root/repo/examples/chip_runs_r5c.sh > /tmp/r5c.log 2>&1
echo "STAGE r5c rc=$? $(date)" >> "$S"

# [6] full bench refresh: fresh BENCH_DETAILS.json (now incl. the pcn row)
#     and a warm XLA cache for the driver's end-of-round capture.
timeout 3600 python /root/repo/bench.py > /tmp/r5_final_bench.log 2>&1
echo "STAGE bench_refresh rc=$? $(date)" >> "$S"

# [7] covid spike-scale trained run (VERDICT item 8; SYNTH v7 regen
#     happens in-run and is cached).
timeout 7200 python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
  -n_cgs 500 -batch_size 2 -ndata 240 -nepochs 100 -lr 3e-4 \
  -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -enc_nconv 2 -dec_nconv 4 -cg_method cgae \
  -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
  -n_ensemble 4 -nevals 8 -patience 100 -factor 0.6 -lr_patience 15 \
  -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r5d_covid > /tmp/r5_covid.log 2>&1
echo "STAGE covid rc=$? $(date)" >> "$S"
echo "MASTER ALL DONE $(date)" >> "$S"
