#!/bin/bash
# Round-12 isolated probe batch (VERDICT r11 items 1, 2, 3, 5):
#  1. The screened incremental gate (q335 / dedupIngestStreamScreened) at
#     the 500k-delivery scale, novel + replica arms — done = a measured
#     rows/s multiple over the exact gate's 1661 rows/s novel record.
#     Plus q335 rungs at 10x/30x/100x (the round's operator needs its own
#     scale curve; q331's machinery, bipartite, so expected cheaper).
#  2. The iterative-graph band (q248 label propagation, q174 k-core,
#     q268 modularity, q110 pagerank) at sf3/sf5 with stage dumps — the
#     most expensive catalog family had no beyond-sf1 rung record.
#  3. The semantic gate's nCells knob on the 500k novel delivery
#     (8/32/64 beside r11's nCells=16 = 1797 rows/s record) + recall per
#     nCells at sf0.1 (replica delivery vs exact bipartite truth).
#  5. q334 quiet isolated sf1 re-pin (the in-window close seeded its
#     reference at 64.2 s; the r11 isolated probe read 44.2 s).
# Protocol: one query per JVM, SPARK_GRAFT_RUNS=1 for sf10 rungs,
# sbt-default 8 g heap (probe_r9: 8 g ~3x faster than 64 g on the
# sort-heavy LSH shapes; page-cache-backed spill beats GC-bound sort).
set -u
cd /root/repo
mkdir -p probe_r12
LOG=tools/probe_r12.log
echo "=== probe_r12 batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

bench_one() {  # query sfdir label runs
  local q="$1" dir="$2" label="$3" runs="$4"
  echo "--- bench $q @ $label pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SF1_DIR="" \
  SPARK_GRAFT_RUNS="$runs" \
  SPARK_GRAFT_BENCH_OUT="probe_r12/${q}_${label}_8g.json" \
    sbt -batch "runMain graft.Bench $q" >> "$LOG" 2>&1
  echo "--- bench $q @ $label done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
  cat "probe_r12/${q}_${label}_8g.json" >> "$LOG" 2>/dev/null
  echo >> "$LOG"
}

skew_one() {  # sfdir queries...
  local dir="$1"; shift
  echo "--- skewprobe $* @ $dir pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_PROBE_DIR=probe_r12 \
  SPARK_GRAFT_STAGE_DUMP=1 \
    sbt -batch "runMain graft.SkewProbe $*" >> "$LOG" 2>&1
  echo "--- skewprobe done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
}

gates() {  # sfdir arms...
  local dir="$1"; shift
  echo "--- gates $* @ $dir pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_PROBE_DIR=probe_r12 \
    sbt -batch "runMain graft.StreamGateProbe $*" >> "$LOG" 2>&1
  echo "--- gates done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
}

# item 1: the screened gate at delivery scale (novel = the production
# number), same sf0.01 corpus as the r11 records it is measured against
gates /root/testdata/sf0.01 dedup_screened_novel dedup_screened

# item 1b: q335 rung curve (one JVM per rung; sf10 single-run)
bench_one q335_incremental_lsh_screened testdata-ext/sf1 sf1 2
bench_one q335_incremental_lsh_screened testdata-ext/sf3 sf3 1
bench_one q335_incremental_lsh_screened testdata-ext/sf10 sf10 1

# item 2: the iterative-graph band at 30x/50x, stage dump on
skew_one testdata-ext/sf3 q248_label_propagation q174_kcore q268_modularity q110_pagerank
skew_one testdata-ext/sf5 q248_label_propagation q174_kcore q268_modularity q110_pagerank

# item 3: semantic-gate nCells sweep — novel 500k throughput (16 is the
# r11 record) + replica-delivery recall at sf0.1
gates /root/testdata/sf0.01 semdedup_novel_cells8 semdedup_novel_cells32 semdedup_novel_cells64
gates /root/testdata/sf0.1 semdedup_recall_cells8 semdedup_recall_cells16 semdedup_recall_cells32 semdedup_recall_cells64

# item 5: q334 quiet isolated sf1 re-pin
bench_one q334_doulion_errmodel testdata-ext/sf1 sf1 2

echo "=== probe_r12 batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
