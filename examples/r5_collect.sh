#!/bin/bash
# Collect small artifacts from round-5 chip-run logdirs into the repo tree.
#
# The CLIs append a run-suffix to -logdir (e.g. /tmp/r5d_chig_folds12 ->
# /tmp/r5d_chig_folds12_08-20_cgae_sample_ndata5000_N6), so the resume
# queue's inline `save` globs miss them; this helper globs the suffixed
# dirs.  Idempotent -- safe to run after every stage.
LIVE=/root/repo/examples/results/_r5_live
mkdir -p "$LIVE"
collect() { # collect <prefix> <logdir-glob>
  for d in $2; do
    [ -d "$d" ] || continue
    for f in "$d"/*.csv "$d"/*.json "$d"/fold*/train_log.csv \
             "$d"/fold*/test_results.csv "$d"/*.csv; do
      [ -f "$f" ] || continue
      rel=$(echo "$f" | sed "s|^$d/||; s|/|_|g")
      cp "$f" "$LIVE/${1}_${rel}"
    done
  done
}
collect chig_folds12 "/tmp/r5d_chig_folds12*"
collect dip5fold    "/tmp/r5a_dipeptide_5fold*"
collect diffpool_v6 "/tmp/r5b_diffpool_v6*"
collect pcn_p7      "/tmp/r5b_pcn_p7_*  /tmp/r5b_pcn_p7"
collect pcn_p7s     "/tmp/r5b_pcn_p7s*"
collect dip_c6      "/tmp/r5c_dipeptide_c6*"
collect covid       "/tmp/r5d_covid*"
[ -f /tmp/r5c_b256/BENCH_DETAILS.json ] && cp /tmp/r5c_b256/BENCH_DETAILS.json "$LIVE/b256_BENCH_DETAILS.json"
ls -la "$LIVE" | tail -n +2
