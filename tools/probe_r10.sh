#!/bin/bash
# Round-10 isolated probe batch (VERDICT r9 item 1): extend the SCREENED
# LSH twins' measured curve to sf10 (100x) — the last extrapolated scale
# claim — with q325's bucket/candidate audit row stamped alongside.
# Protocol: one query per JVM, SPARK_GRAFT_RUNS=1, and the sbt-default
# 8g heap (NOT the 64g of probe_r8/r9): round 9 measured 8g ~3x FASTER
# than 64g on the sort-heavy LSH verify shapes — page-cache-backed spill
# beats a GC-bound in-heap sort on this 125 GB-RAM VM (probe_r9 _8g
# records; the screened twins' whole sf0.1..sf5 curve is 8g, so sf10
# must be too for the curve to be one protocol).
set -u
cd /root/repo
mkdir -p probe_r10
LOG=tools/probe_r10.log
echo "=== probe_r10 batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

run_one() {  # query sfdir label runs [suffix]
  local q="$1" dir="$2" label="$3" runs="$4" suffix="${5:-_8g}"
  echo "--- $q @ $label pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SF1_DIR="" \
  SPARK_GRAFT_RUNS="$runs" \
  SPARK_GRAFT_BENCH_OUT="probe_r10/${q}_${label}${suffix}.json" \
    sbt -batch "runMain graft.Bench $q" >> "$LOG" 2>&1
  echo "--- $q @ $label done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
  cat "probe_r10/${q}_${label}${suffix}.json" >> "$LOG" 2>/dev/null
  echo >> "$LOG"
}

SF10=/root/repo/testdata-ext/sf10

for q in q331_minhash_lsh_screened q332_weighted_lsh_screened q325_lsh_bucket_audit; do
  run_one "$q" "$SF10" sf10 1
done

echo "=== probe_r10 batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
