#!/bin/bash
# Round-5 fallback: shortened covid spike-scale trained run (VERDICT r4
# item 8), for when the resume queue's full stage [H] is budget-skipped.
# 40 epochs instead of 100 -- enough for a TRAINED (loss-decreasing,
# eval'd) artifact at >=10k atoms, not a converged one; honesty note goes
# in the results README.  Runs only AFTER the resume queue logs
# RESUME ALL DONE (one TPU process at a time), and takes a hard cap so it
# exits well before the driver's end-of-round capture.
#
# Usage: setsid nohup bash examples/chip_runs_r5_covid_short.sh CAP_SECONDS &
set -u
CAP=${1:-2400}
S=/tmp/r5_resume_status.log
until grep -q "RESUME ALL DONE" "$S" 2>/dev/null; do sleep 30; done
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
timeout "$CAP" python -m coarsegrainingvae_tpu.cli.run_cgvae -dataset covid \
  -n_cgs 500 -batch_size 2 -ndata 240 -nepochs 40 -lr 3e-4 \
  -n_basis 192 -n_rbf 8 -atom_cutoff 5.0 -cg_cutoff 15.0 -nsplits 5 \
  -beta 0.05 -gamma 25.0 -enc_nconv 2 -dec_nconv 4 -cg_method cgae \
  -edgeorder 2 --dec_type cross --sparse --degree_norm --graph_eval \
  -n_ensemble 4 -nevals 8 -patience 100 -factor 0.6 -lr_patience 15 \
  -min_lr 1e-6 -max_folds 1 -seed 123 -logdir /tmp/r5e_covid_short \
  > /tmp/r5_covid_short.log 2>&1
echo "COVID_SHORT rc=$? $(date)" >> "$S"
bash examples/r5_collect.sh >/dev/null 2>&1
for d in /tmp/r5e_covid_short*; do
  [ -d "$d" ] || continue
  for f in "$d"/*.csv "$d"/*.json "$d"/fold0/train_log.csv "$d"/fold0/*.csv; do
    [ -f "$f" ] && cp "$f" "/root/repo/examples/results/_r5_live/covid_short_$(echo "$f" | sed "s|^$d/||; s|/|_|g")"
  done
  # first frame only of the reconstructed structure (full file is ~20+ MB)
  for x in "$d"/fold0/test_recon.xyz "$d"/fold0/test_samples.xyz; do
    [ -f "$x" ] && python - "$x" <<'PY'
import sys
src = sys.argv[1]
with open(src) as f:
    n = int(f.readline())
    f.seek(0)
    frame = [f.readline() for _ in range(n + 2)]
out = "/root/repo/examples/results/_r5_live/covid_short_" + src.split("/")[-1].replace(".xyz", "_frame0.xyz")
open(out, "w").writelines(frame)
print("wrote", out, n, "atoms")
PY
  done
done
