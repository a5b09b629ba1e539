#!/bin/bash
# Round-7 probe batch C: isolated 10x-rung pins for the operators whose
# ENTRIES changed this round — q20/q21/q53 are now the md5-affine
# engine-portable variants (full pair-set oracles; q20 rejoined the
# recurring rung, q53 is a rung candidate pending this evidence).
set -u
cd /root/repo
mkdir -p probe_r7
LOG=tools/probe_r7.log
echo "=== probe_r7c batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
run_one() {
  local q="$1" dir="$2" label="$3"
  echo "--- $q @ $label pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SF1_DIR="" \
  SPARK_GRAFT_RUNS=2 SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_BENCH_OUT="probe_r7/${q}_${label}.json" \
    sbt -batch "runMain graft.Bench $q" >> "$LOG" 2>&1
  echo "--- $q @ $label done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
  cat "probe_r7/${q}_${label}.json" >> "$LOG" 2>/dev/null
  echo >> "$LOG"
}
for q in q20_minhash_lsh_pairs q21_simhash_pairs q53_weighted_lsh_pairs; do
  run_one "$q" /root/testdata/sf0.1 sf0.1
  run_one "$q" /root/repo/testdata-ext/sf1 sf1
done
# q49 at the 30x rung: its ~880 MB/sf0.1 candidate stream (the corpus is
# a 20-word-vocabulary template — within-replica banding floor ~13% of
# pairs, all verify-killed) scales ~linearly to ~88 GB at 100x — over
# this VM's scratch even with the staged screen; the sf3 rung is the
# VM-feasible linearity evidence (finding 3's family).
SPARK_GRAFT_SF_DIR=/root/repo/testdata-ext/sf3 SPARK_GRAFT_SF1_DIR="" \
SPARK_GRAFT_RUNS=1 SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_BENCH_OUT="probe_r7/q49_neardup_corpus_sf3.json" \
  sbt -batch "runMain graft.Bench q49_neardup_corpus" >> "$LOG" 2>&1
echo "--- q49_neardup_corpus @ sf3 done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
cat probe_r7/q49_neardup_corpus_sf3.json >> "$LOG" 2>/dev/null; echo >> "$LOG"
echo "=== probe_r7c batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
# q154 at the 10x rung (isolated): completes the sf0.1 -> sf1 -> sf3
# three-point curve that localizes the superlinear knee to the
# single-VM memory wall (q194's r6 sf1 iso point already exists)
SPARK_GRAFT_SF_DIR=/root/repo/testdata-ext/sf1 SPARK_GRAFT_SF1_DIR="" \
SPARK_GRAFT_RUNS=1 SPARK_DRIVER_MEM=64g \
SPARK_GRAFT_BENCH_OUT="probe_r7/q154_triangles_sf1.json" \
  sbt -batch "runMain graft.Bench q154_triangles" >> "$LOG" 2>&1
echo "--- q154_triangles @ sf1 done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
cat probe_r7/q154_triangles_sf1.json >> "$LOG" 2>/dev/null; echo >> "$LOG"
