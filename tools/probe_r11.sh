#!/bin/bash
# Round-11 isolated probe batch (VERDICT r10 items 1, 2, 5, 6):
#  1. the role-split triangle grid (q45/q19) at sf3 and sf5 with the
#     per-stage dump on — the round-10 plan change's evidence stopped at
#     10x; done = critical-stage ratio < 3 and a sub-linear wall curve.
#  2. q332 (weighted screened LSH) at sf10 on the 8 g protocol heap —
#     round 11 stages the verify so only screen survivors carry the
#     occurrence-expanded arrays (the r10 16 g floor was the full-sig
#     SMJ sort). q331 re-run too: its verify plan changed the same way,
#     so the 100x number must be re-pinned.
#  6. q334 (arms-only DOULION error model) at sf10 — must complete where
#     the exact-arm q330 DNFs, alongside q326's 273 s.
#  5. StreamGateProbe novel-content arms at 500k rows — the expected-case
#     candidate/screen cost beside the r10 replica worst-case records —
#     plus replica re-runs (the delivery stride derivation changed).
# Protocol: one query per JVM, SPARK_GRAFT_RUNS=1 for the sf10 rungs,
# sbt-default 8 g heap (probe_r9 finding: 8 g ~3x faster than 64 g on the
# sort-heavy LSH shapes; page-cache-backed spill beats GC-bound sort).
set -u
cd /root/repo
mkdir -p probe_r11
LOG=tools/probe_r11.log
echo "=== probe_r11 batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

bench_one() {  # query sfdir label runs
  local q="$1" dir="$2" label="$3" runs="$4"
  echo "--- bench $q @ $label pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SF1_DIR="" \
  SPARK_GRAFT_RUNS="$runs" \
  SPARK_GRAFT_BENCH_OUT="probe_r11/${q}_${label}_8g.json" \
    sbt -batch "runMain graft.Bench $q" >> "$LOG" 2>&1
  echo "--- bench $q @ $label done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
  cat "probe_r11/${q}_${label}_8g.json" >> "$LOG" 2>/dev/null
  echo >> "$LOG"
}

skew_one() {  # sfdir queries...
  local dir="$1"; shift
  echo "--- skewprobe $* @ $dir pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_PROBE_DIR=probe_r11 \
  SPARK_GRAFT_STAGE_DUMP=1 \
    sbt -batch "runMain graft.SkewProbe $*" >> "$LOG" 2>&1
  echo "--- skewprobe done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
}

# item 1: the grid at 30x / 50x, stage dump on (one JVM per scale)
skew_one testdata-ext/sf3 q45_dedup_clusters q19_ngram_jaccard_pairs
skew_one testdata-ext/sf5 q45_dedup_clusters q19_ngram_jaccard_pairs

# item 2: the staged screened twins at 100x on the 8 g protocol heap
SF10=/root/repo/testdata-ext/sf10
bench_one q331_minhash_lsh_screened "$SF10" sf10 1
bench_one q332_weighted_lsh_screened "$SF10" sf10 1

# item 6: the arms-only error model at 100x (exact-arm q330 DNFs here)
bench_one q334_doulion_errmodel "$SF10" sf10 1

# item 5: gates — novel-content arms first (the new record), then the
# replica worst-case re-runs under the derived-stride delivery builder
echo "--- gates pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_PROBE_DIR=probe_r11 \
  sbt -batch "runMain graft.StreamGateProbe dedup_novel semdedup_novel" >> "$LOG" 2>&1
echo "--- novel gates done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_PROBE_DIR=probe_r11 \
  sbt -batch "runMain graft.StreamGateProbe dedup semdedup" >> "$LOG" 2>&1
echo "--- replica gates done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"

echo "=== probe_r11 batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
