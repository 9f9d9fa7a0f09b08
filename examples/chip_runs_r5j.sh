#!/bin/bash
# Round-5 covid rung 3: covid2 proved the 10,333-atom pipeline end-to-end
# (train+eval+sampling, rc=0, 2.5 s/epoch) but its loss was misbalanced --
# the graph term is extensive in system size, so gamma=25 (dipeptide-scale,
# 27 atoms) weights graph:recon ~100:1 at 10.3k atoms and recon barely
# optimizes (test RMSD ~87 A after 25 epochs). Scale gamma by system size
# (25 * 27/10333 ~= 0.065 -> 0.1) and give it the 100-epoch budget the
# wall allows.
# Usage: setsid nohup bash examples/chip_runs_r5j.sh WALL_EPOCH &
set -u
WALL=${1:?usage: chip_runs_r5j.sh WALL_EPOCH_SECONDS}
P=/tmp/r5j_status.log
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
note() { echo "$1 $(date) left=$(( WALL - $(date +%s) ))s" >> "$P"; }
left() { echo $(( WALL - $(date +%s) )); }
note "R5J START"

if [ "$(left)" -ge 600 ]; then
  CAP=$(( $(left) - 60 ))
  note "covid3 cap=${CAP}s"
  timeout "$CAP" python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
    -n_cgs 500 -batch_size 2 -ndata 64 -nepochs 100 -lr 3e-4 \
    -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
    -beta 0.05 -gamma 0.1 -enc_nconv 2 -dec_nconv 4 -cg_method seqpartition \
    -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
    -loss_skip_factor 1e6 \
    -n_ensemble 2 -nevals 2 -patience 100 -factor 0.6 -lr_patience 25 \
    -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r5j_covid \
    > /tmp/r5j_covid.log 2>&1
  note "STAGE covid3 rc=$?"
else note "SKIP covid3 (wall)"; fi

LIVE=/root/repo/examples/results/_r5_live
mkdir -p "$LIVE"
for d in /tmp/r5j_covid_*; do
  [ -d "$d" ] || continue
  for f in "$d"/*.csv "$d"/*.json "$d"/fold*/train_log.csv; do
    [ -f "$f" ] && cp "$f" "$LIVE/covid3_$(echo "$f" | sed "s|^$d/||; s|/|_|g")"
  done
done
note "R5J ALL DONE"
