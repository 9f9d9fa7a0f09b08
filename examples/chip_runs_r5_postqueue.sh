#!/bin/bash
# Round-5 post-queue chip runs: fill the TPU window between the resume
# queue's RESUME ALL DONE and the driver's end-of-round capture.
#
# Stages (priority order, each gated on an ABSOLUTE wall-clock deadline
# so nothing holds the TPU when the driver's bench client arrives):
#   [1] covid_short  -- shortened spike-scale trained run (VERDICT r4
#       item 8; the resume queue's full stage [H] was budget-skipped and
#       the chip_runs_r5_covid_short.sh waiter died).
#   [2] pcn p8s      -- StochasticPCN A/B arm rerun with
#       --bond_project_eval (train-through projection NaN'd p7s at
#       epoch 3; this is the matched-budget arm, VERDICT r4 item 7).
#   [3] pcn p8       -- deterministic arm rerun with --bond_project_eval
#       (p7 NaN'd at epoch 30 under train-through; clean comparator).
# No code is edited, so the persistent XLA cache stays warm for the
# driver's capture.
#
# Usage: setsid nohup bash examples/chip_runs_r5_postqueue.sh WALL_EPOCH &
set -u
WALL=${1:?usage: chip_runs_r5_postqueue.sh WALL_EPOCH_SECONDS}
S=/tmp/r5_resume_status.log
P=/tmp/r5_postqueue_status.log
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
note() { echo "$1 $(date) left=$(( WALL - $(date +%s) ))s" >> "$P"; }
left() { echo $(( WALL - $(date +%s) )); }
note "POSTQUEUE WAITING"
until grep -q "RESUME ALL DONE" "$S" 2>/dev/null; do
  sleep 30
  [ "$(left)" -le 600 ] && { note "GAVE UP WAITING"; exit 1; }
done
note "QUEUE DRAINED"

# [1] covid spike-scale, 40 epochs (trained + eval'd, not converged).
# Skipped only if the resume queue's own full covid stage [H] ran to a
# COMPLETE eval (cv_stats.csv exists) — a timeout there leaves no
# reconstruction artifact, and the shortened run is then still needed.
CAP=$(( $(left) - 200 )); [ "$CAP" -gt 2500 ] && CAP=2500
if ls /tmp/r5d_covid*/cv_stats.csv >/dev/null 2>&1; then
  note "SKIP covid_short (queue stage H completed with cv_stats)"
elif [ "$CAP" -ge 1700 ]; then
  # Host-side conformer generation at 9.5k atoms is single-core-bound
  # (~tens of minutes for 240 frames on this 1-cpu box). Use the full
  # ensemble only if the queue stage's generation reached the synth
  # cache; otherwise generate a 64-frame ensemble -- the item under
  # test is the 10k-atom SCALE, not ensemble breadth.
  NDATA=64
  [ -f /tmp/cgvae_synth_cache/v7_covid_240_123.npz ] && NDATA=240
  note "covid_short ndata=$NDATA cap=${CAP}s"
  timeout "$CAP" python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
    -n_cgs 500 -batch_size 2 -ndata "$NDATA" -nepochs 25 -lr 3e-4 \
    -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
    -beta 0.05 -gamma 25.0 -enc_nconv 2 -dec_nconv 4 -cg_method cgae \
    -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
    -n_ensemble 4 -nevals 4 -patience 100 -factor 0.6 -lr_patience 15 \
    -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r5e_covid_short \
    > /tmp/r5_covid_short.log 2>&1
  note "STAGE covid_short rc=$?"
else note "SKIP covid_short (wall)"; fi

# [2] StochasticPCN, eval-only bond projection (matched-budget A/B arm)
if [ "$(left)" -ge 2300 ]; then
  timeout 2100 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
    -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
    -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 --bond_project_eval --well_posed_data \
    --stochastic -beta 0.05 -n_ensemble 8 \
    -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
    -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r5e_pcn_p8s \
    > /tmp/r5_pcn_p8s.log 2>&1
  note "STAGE pcn_p8s rc=$?"
else note "SKIP pcn_p8s (wall)"; fi

# [3] deterministic PCN, eval-only bond projection (clean comparator)
if [ "$(left)" -ge 1500 ]; then
  timeout 1300 python -m coarsegrainingvae_tpu.cli.run_pcn -ndata 400 -min_res 50 -max_res 81 \
    -n_basis 256 -dec_nconv 4 -lr 3e-3 -grad_clip 1.0 -gamma 5.0 -kappa 1.0 -aux_warmup 60 \
    -zeta 20.0 -steric_margin 0.3 -zeta_warmup 500 --bond_project_eval --well_posed_data \
    -batch_size 8 -nepochs 300 -patience 300 -lr_patience 30 -lr_factor 0.5 -min_lr 1e-5 \
    -cutoff 10.0 -n_dump 2 --dec_type cross -logdir /tmp/r5e_pcn_p8 \
    > /tmp/r5_pcn_p8.log 2>&1
  note "STAGE pcn_p8 rc=$?"
else note "SKIP pcn_p8 (wall)"; fi

# collect everything small into the repo tree (incl. queue-stage dirs)
bash examples/r5_collect.sh >/dev/null 2>&1
LIVE=/root/repo/examples/results/_r5_live
mkdir -p "$LIVE"
for pair in "covid_short:/tmp/r5e_covid_short*" "pcn_p8s:/tmp/r5e_pcn_p8s*" "pcn_p8:/tmp/r5e_pcn_p8_*"; do
  pre=${pair%%:*}; glob=${pair#*:}
  for d in $glob; do
    [ -d "$d" ] || continue
    for f in "$d"/*.csv "$d"/*.json "$d"/fold*/train_log.csv "$d"/fold*/cv_stats.csv; do
      [ -f "$f" ] && cp "$f" "$LIVE/${pre}_$(echo "$f" | sed "s|^$d/||; s|/|_|g")"
    done
  done
done
note "POSTQUEUE ALL DONE"
