#!/bin/bash
# Round-5 recovery queue after the r5g covid stage failed at init: the cgae
# mapping at 500 beads over 10,333 atoms degenerated into one 494-atom bead
# (> n_basis=192; the channel-lift guard fired, trainer.py::init_state).
# CPU pre-validation: seqpartition at the same scale gives max bead 109-112.
#   [1] covid_retry -- same run with -cg_method seqpartition; the synthetic
#                      ensemble is already cached (v7_covid_64_123.npz), so
#                      generation is skipped.
#   [2] pcn p8      -- deterministic PCN, well-posed data, eval-only bond
#                      projection; nepochs right-sized to COMPLETE (a
#                      finished 120-epoch run writes test_results.csv; a
#                      timeout-killed 300-epoch run writes nothing).
# Usage: setsid nohup bash examples/chip_runs_r5h.sh WALL_EPOCH &
set -u
WALL=${1:?usage: chip_runs_r5h.sh WALL_EPOCH_SECONDS}
P=/tmp/r5h_status.log
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
note() { echo "$1 $(date) left=$(( WALL - $(date +%s) ))s" >> "$P"; }
left() { echo $(( WALL - $(date +%s) )); }
note "R5H START"

# [1] covid spike-scale retry, 25 epochs, balanced contiguous mapping
if [ "$(left)" -ge 1200 ]; then
  CAP=$(( $(left) - 1100 )); [ "$CAP" -gt 2100 ] && CAP=2100
  note "covid_retry cap=${CAP}s"
  timeout "$CAP" python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
    -n_cgs 500 -batch_size 2 -ndata 64 -nepochs 25 -lr 3e-4 \
    -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
    -beta 0.05 -gamma 25.0 -enc_nconv 2 -dec_nconv 4 -cg_method seqpartition \
    -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
    -n_ensemble 4 -nevals 4 -patience 100 -factor 0.6 -lr_patience 15 \
    -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r5h_covid \
    > /tmp/r5h_covid.log 2>&1
  note "STAGE covid_retry rc=$?"
else note "SKIP covid_retry (wall)"; fi

# [2] deterministic PCN, eval-only rooted bond projection on well-posed data
if [ "$(left)" -ge 700 ]; then
  timeout $(( $(left) - 120 )) python -m coarsegrainingvae_tpu.cli.run_pcn \
    -ndata 400 -min_res 50 -max_res 81 \
    -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
    -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 --bond_project_eval --well_posed_data \
    -batch_size 8 -nepochs 120 -patience 120 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
    -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r5h_pcn_p8 \
    > /tmp/r5h_pcn_p8.log 2>&1
  note "STAGE pcn_p8 rc=$?"
else note "SKIP pcn_p8 (wall)"; fi

# collect everything small into the repo tree
LIVE=/root/repo/examples/results/_r5_live
mkdir -p "$LIVE"
for pair in "covid:/tmp/r5h_covid*" "pcn_p8:/tmp/r5h_pcn_p8*"; do
  pre=${pair%%:*}; glob=${pair#*:}
  for d in $glob; do
    [ -d "$d" ] || continue
    for f in "$d"/*.csv "$d"/*.json "$d"/fold*/train_log.csv "$d"/fold*/cv_stats.csv \
             "$d"/fold*/test_results.csv; do
      [ -f "$f" ] && cp "$f" "$LIVE/${pre}_$(echo "$f" | sed "s|^$d/||; s|/|_|g")"
    done
  done
done
note "R5H ALL DONE"
