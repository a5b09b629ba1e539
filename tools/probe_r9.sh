#!/bin/bash
# Round-9 isolated probe batch (VERDICT r8 item 6): extend the
# production-LSH curve beyond the 10x rung — q328/q329 (rows=8 twins)
# at sf3 (30x) and sf5 (50x), with q325's bucket/candidate audit row
# stamped alongside at each rung. Protocol identical to probe_r8.sh:
# one query per JVM, SPARK_DRIVER_MEM=64g, SPARK_GRAFT_RUNS=1 at the
# big rungs, loadavg + shuffle-write/spill bytes in every record.
#
# Heap note (learned this round): a first pass at the sbt default 8g
# heap completed sf3 (q328 79.4 s / 3.2 GB spill, q329 114.0 s /
# 4.8 GB spill) but DNF'd BOTH twins at sf5 on the 78 GB scratch wall —
# execution memory of 0.6*(8g-300m) ~ 4.6 GB forces the candidate-
# verify sort to spill its whole working set. 64g is the r7/r8
# protocol heap and the honest stand-in for a real executor fleet
# (32 cores x 2 GB/core); the 8g DNF records are kept in tools/ logs
# as the measured price of under-provisioned sort memory.
set -u
cd /root/repo
mkdir -p probe_r9
LOG=tools/probe_r9.log
echo "=== probe_r9 batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

run_one() {  # query sfdir label runs [suffix]
  local q="$1" dir="$2" label="$3" runs="$4" suffix="${5:-}"
  echo "--- $q @ $label pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SF1_DIR="" \
  SPARK_GRAFT_RUNS="$runs" SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_BENCH_OUT="probe_r9/${q}_${label}${suffix}.json" \
    sbt -batch "runMain graft.Bench $q" >> "$LOG" 2>&1
  echo "--- $q @ $label done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
  cat "probe_r9/${q}_${label}${suffix}.json" >> "$LOG" 2>/dev/null
  echo >> "$LOG"
}

SF3=/root/repo/testdata-ext/sf3
SF5=/root/repo/testdata-ext/sf5

for q in q328_minhash_lsh_rows8 q329_weighted_lsh_rows8 q325_lsh_bucket_audit; do
  run_one "$q" "$SF3" sf3 1
  run_one "$q" "$SF5" sf5 1
done

echo "=== probe_r9 batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
