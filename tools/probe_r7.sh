#!/bin/bash
# Round-7 isolated probe batch (VERDICT r6 items 1 + 2):
#
#  A. The sf10 rung (100x sf0.1 rows, tools/gen_sf10.py) for the seven
#     operators whose 100 TB story carries the repo: each gets an
#     isolated JVM at sf0.1 (2-run-min, JIT warm) and at sf10 (1 run —
#     SPARK_GRAFT_RUNS=1; a second 10-minute run doubles the batch for
#     <5% precision, and the residual warmup bias is UPWARD, i.e.
#     conservative for a scaling ratio).
#  B. Isolated 2-run pins for q230_compression_ratio / q204_heavy_hitters
#     at sf0.1 and sf1 — the two rung members whose busy-window driver
#     readings (34.8x/20.5x) lacked isolated evidence.
#
# One query per JVM; loadavg logged before each run; every bench JSON is
# kept under probe_r7/. Run on a QUIET machine (check loadavg first).
set -u
cd /root/repo
mkdir -p probe_r7
LOG=tools/probe_r7.log
echo "=== probe_r7 batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

run_one() {  # query sfdir label runs
  local q="$1" dir="$2" label="$3" runs="$4"
  echo "--- $q @ $label pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SF1_DIR="" \
  SPARK_GRAFT_RUNS="$runs" SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_BENCH_OUT="probe_r7/${q}_${label}.json" \
    sbt -batch "runMain graft.Bench $q" >> "$LOG" 2>&1
  echo "--- $q @ $label done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
  cat "probe_r7/${q}_${label}.json" >> "$LOG" 2>/dev/null
  echo >> "$LOG"
}

SF01=/root/testdata/sf0.1
SF1=/root/repo/testdata-ext/sf1
SF10=/root/repo/testdata-ext/sf10

# B first (cheap): the q230/q204 pins
for q in q230_compression_ratio q204_heavy_hitters; do
  run_one "$q" "$SF01" sf0.1 2
  run_one "$q" "$SF1"  sf1   2
done

# A: the sf10 rung — sf0.1 comparator then sf10, per query
for q in q49_neardup_corpus q208_semdedup q321_semantic_decontaminate \
         q194_link_scores q142_dup_substrings q97_edit_distance_pairs \
         q154_triangles; do
  run_one "$q" "$SF01" sf0.1 2
  run_one "$q" "$SF10" sf10  1
done

echo "=== probe_r7 batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
