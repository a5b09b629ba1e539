#!/bin/bash
set -u
cd /root/repo
LOG=tools/probe_r7.log
echo "=== probe_r7d batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
run_one() {
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
# q154 sf1 re-pin: the batch-C reading overlapped builder sbt activity
run_one q154_triangles /root/repo/testdata-ext/sf1 sf1 1
# q21 after the fold fix: both rungs fresh under the fixed operator
run_one q21_simhash_pairs /root/testdata/sf0.1 sf0.1 2
run_one q21_simhash_pairs /root/repo/testdata-ext/sf1 sf1 2
echo "=== probe_r7d batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
