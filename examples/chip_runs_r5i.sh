#!/bin/bash
# Round-5 covid retry #2: the r5h covid run trained 25 epochs at 10,333
# atoms but every update was skipped (graph loss is extensive in system
# size; reference-parity guard loss >= gamma*200 rejected all batches --
# see commit 03a64d0). Rerun with -loss_skip_factor 1e6 so updates land.
# Eval slimmed (nevals 2, ensemble 2): the r5h eval died in the recon
# program's remote compile; smaller eval = smaller programs + less wall.
# Waits for the r5h queue (PCN p8) to release the TPU first -- one TPU
# process at a time.
# Usage: setsid nohup bash examples/chip_runs_r5i.sh WALL_EPOCH &
set -u
WALL=${1:?usage: chip_runs_r5i.sh WALL_EPOCH_SECONDS}
P=/tmp/r5i_status.log
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
note() { echo "$1 $(date) left=$(( WALL - $(date +%s) ))s" >> "$P"; }
left() { echo $(( WALL - $(date +%s) )); }
note "R5I START (waiting for r5h)"

until grep -q "R5H ALL DONE" /tmp/r5h_status.log 2>/dev/null; do
  [ "$(left)" -le 780 ] && { note "GIVE UP waiting for r5h"; exit 0; }
  sleep 20
done
note "r5h done"

if [ "$(left)" -ge 780 ]; then
  CAP=$(( $(left) - 60 )); [ "$CAP" -gt 1500 ] && CAP=1500
  note "covid2 cap=${CAP}s"
  timeout "$CAP" python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
    -n_cgs 500 -batch_size 2 -ndata 64 -nepochs 25 -lr 3e-4 \
    -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
    -beta 0.05 -gamma 25.0 -enc_nconv 2 -dec_nconv 4 -cg_method seqpartition \
    -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
    -loss_skip_factor 1e6 \
    -n_ensemble 2 -nevals 2 -patience 100 -factor 0.6 -lr_patience 15 \
    -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r5i_covid \
    > /tmp/r5i_covid.log 2>&1
  note "STAGE covid2 rc=$?"
else note "SKIP covid2 (wall)"; fi

LIVE=/root/repo/examples/results/_r5_live
mkdir -p "$LIVE"
for d in /tmp/r5i_covid*; do
  [ -d "$d" ] || continue
  for f in "$d"/*.csv "$d"/*.json "$d"/fold*/train_log.csv "$d"/fold*/cv_stats.csv; do
    [ -f "$f" ] && cp "$f" "$LIVE/covid2_$(echo "$f" | sed "s|^$d/||; s|/|_|g")"
  done
done
note "R5I ALL DONE"
