#!/bin/bash
# Round-8 isolated probe batch (VERDICT r7 items 1, 2, 4, 5):
#
#  A. The DOULION approximate graph arm at the sf10 (100x) rung —
#     q326/q327 each get an isolated JVM at sf0.1 (2-run-min) and sf10
#     (1 run, SPARK_GRAFT_RUNS=1; warmup bias is upward = conservative).
#     This is the arm built BECAUSE exact q154/q194 DNF'd at sf10 on
#     this VM's 78 GB scratch — the probe closes the graph family's
#     100x story.
#  B. The rows=8 LSH scale twins q328/q329 at the 10x rung (sf1) — the
#     floor-collapse claim (j0^8 vs j0^4) measured, with q20's r7
#     reading (47.6x @ 10x) as the comparator.
#  C. q49_neardup_corpus at sf5 (50x) — the largest VM-feasible rung
#     (q325-priced candidate stream ~44 GB < 78 GB scratch); extends
#     the measured curve beyond the r7 30x point.
#  D. The q174_kcore drift pin: two isolated 2-run-min JVMs at sf0.1 —
#     adjudicates the +3.2 s r6->r7 in-catalog drift (context vs real).
#
# One query per JVM; loadavg logged; every record also carries
# shuffle-write/spill bytes (new this round). Run on a QUIET machine.
set -u
cd /root/repo
mkdir -p probe_r8
LOG=tools/probe_r8.log
echo "=== probe_r8 batch start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

run_one() {  # query sfdir label runs [suffix]
  local q="$1" dir="$2" label="$3" runs="$4" suffix="${5:-}"
  echo "--- $q @ $label pre-load $(cat /proc/loadavg)" | tee -a "$LOG"
  SPARK_GRAFT_SF_DIR="$dir" SPARK_GRAFT_SF1_DIR="" \
  SPARK_GRAFT_RUNS="$runs" SPARK_DRIVER_MEM=64g \
  SPARK_GRAFT_BENCH_OUT="probe_r8/${q}_${label}${suffix}.json" \
    sbt -batch "runMain graft.Bench $q" >> "$LOG" 2>&1
  echo "--- $q @ $label done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
  cat "probe_r8/${q}_${label}${suffix}.json" >> "$LOG" 2>/dev/null
  echo >> "$LOG"
}

SF01=/root/testdata/sf0.1
SF1=/root/repo/testdata-ext/sf1
SF5=/root/repo/testdata-ext/sf5
SF10=/root/repo/testdata-ext/sf10

# D first (cheap): the q174 pin — two separate JVMs
run_one q174_kcore "$SF01" sf0.1 2 _pin1
run_one q174_kcore "$SF01" sf0.1 2 _pin2

# B: the rows=8 twins at the 10x rung
for q in q328_minhash_lsh_rows8 q329_weighted_lsh_rows8; do
  run_one "$q" "$SF01" sf0.1 2
  run_one "$q" "$SF1"  sf1   2
done

# A: the DOULION arm — sf0.1 comparator then sf10, per query
for q in q326_triangles_doulion q327_link_scores_sampled; do
  run_one "$q" "$SF01" sf0.1 2
  run_one "$q" "$SF10" sf10  1
done

# C: q49 at the 50x rung
run_one q49_neardup_corpus "$SF5" sf5 1

echo "=== probe_r8 batch end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
