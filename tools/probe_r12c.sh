#!/bin/bash
# Round-12 graph-band re-probe, after the rotate() fix (DISK_ONLY
# per-round checkpoints + superseded-round release in Graph's pageRank/
# kCore/LPA loops). The first sf3 attempt completed q248 (66.0 s,
# critical ratio 1.49) and then died in q174's peel with
# AGGREGATE_OUT_OF_MEMORY — six generations of MEMORY_AND_DISK
# edge-frame checkpoints accumulated in unified storage and starved the
# degree aggregation (the q334 storage-squeeze failure class, re-bought
# in the loops that predate it).
set -u
cd /root/repo
mkdir -p probe_r12
LOG=tools/probe_r12.log
echo "=== probe_r12c start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

skew_one() {  # sfdir queries...
  local dir="$1"; shift
  echo "--- skewprobe $* @ $dir pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_PROBE_DIR=probe_r12 \
  SPARK_GRAFT_STAGE_DUMP=1 \
    sbt -batch "runMain graft.SkewProbe $*" >> "$LOG" 2>&1
  echo "--- skewprobe done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
}

# one JVM per scale; q248 re-run at sf3 so the whole band shares one
# post-fix protocol (its first record predates the rotate fix)
skew_one testdata-ext/sf3 q248_label_propagation q174_kcore q268_modularity q110_pagerank
skew_one testdata-ext/sf5 q248_label_propagation q174_kcore q268_modularity q110_pagerank

echo "=== probe_r12c end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
