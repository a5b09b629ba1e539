#!/bin/bash
# Round-7 probe batch B — retries after the batch-A findings:
#  - q97: segment join re-pinned to sort-merge (the Generate-estimate
#    broadcast bug died at 15.8 GiB on sf10); fresh sf0.1 comparator
#    under the SAME plan, then sf10.
#  - q49: staged LSH verification (mh screen before sh payload); fresh
#    sf0.1 comparator, then sf10.
#  - q142: sf0.1 comparator re-pin (batch-A reading started at load 15.8
#    — the q194-sf10 tail; the sf10 number itself ran clean).
#  - q154/q194: the linearly-scaled scratch footprint exceeds this VM's
#    78 GB at 100x (a cluster has 100x aggregate scratch; one VM does
#    not) — measured at the sf3 (30x) rung instead, documented as the
#    VM-disk ceiling, not an operator property.
set -u
cd /root/repo
mkdir -p probe_r7
LOG=tools/probe_r7.log
echo "=== probe_r7b batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

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
SF3=/root/repo/testdata-ext/sf3
SF10=/root/repo/testdata-ext/sf10

run_one q142_dup_substrings "$SF01" sf0.1 2

run_one q97_edit_distance_pairs "$SF01" sf0.1 2
run_one q97_edit_distance_pairs "$SF10" sf10  1

run_one q49_neardup_corpus "$SF01" sf0.1 2
run_one q49_neardup_corpus "$SF10" sf10  1

run_one q154_triangles "$SF3" sf3 1
run_one q194_link_scores "$SF3" sf3 1

echo "=== probe_r7b batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
