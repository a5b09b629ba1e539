#!/bin/bash
# Round-12 graph-band final pass, after the second storage fix (LPA now
# materializes its edge frame ONCE internally — q248 was re-executing
# the co-purchase self-join every round — and q268's entry checkpoint
# moved to DISK_ONLY after its scoring aggregates hit
# AGGREGATE_OUT_OF_MEMORY at sf3 with the edge blocks in unified
# storage). Re-measures q248 (its plan changed) and runs the two
# queries the earlier passes never reached (q268, q110).
set -u
cd /root/repo
mkdir -p probe_r12
LOG=tools/probe_r12.log
echo "=== probe_r12d start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

skew_one() {  # sfdir queries...
  local dir="$1"; shift
  echo "--- skewprobe $* @ $dir pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_PROBE_DIR=probe_r12 \
  SPARK_GRAFT_STAGE_DUMP=1 \
    sbt -batch "runMain graft.SkewProbe $*" >> "$LOG" 2>&1
  echo "--- skewprobe done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
}

skew_one testdata-ext/sf3 q248_label_propagation q268_modularity q110_pagerank
skew_one testdata-ext/sf5 q248_label_propagation q268_modularity q110_pagerank

echo "=== probe_r12d end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
