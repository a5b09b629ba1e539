#!/bin/bash
# Round-12 gate follow-up (after the main probe_r12 batch):
#  - dedup_screened_novel at 500k rows: the VERDICT r11 item-1 done-bar
#    (rows/s multiple over the exact gate's 1661 novel record).
#  - dedup_screened REPLICA at 50k rows: the replica-flood arm priced at
#    a bounded size. The 500k replica run was killed at 44 min (in-batch
#    budget): a ~100%-duplicate delivery is the screened gate's WORST
#    case by construction — identical docs collide in all 8 bands, so
#    every true pair crosses the candidate distinct 8×, where the exact
#    gate's block join sees it once. The novel (production) arm is what
#    the screen exists for; the bounded replica point quantifies the
#    flood wall's shape without re-paying it at 500k.
set -u
cd /root/repo
LOG=tools/probe_r12.log
echo "=== probe_r12b start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_PROBE_DIR=probe_r12 \
  sbt -batch "runMain graft.StreamGateProbe dedup_screened_novel" >> "$LOG" 2>&1
echo "--- screened novel done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 SPARK_GRAFT_PROBE_DIR=probe_r12 \
SPARK_GRAFT_GATE_ROWS=50000 \
  sbt -batch "runMain graft.StreamGateProbe dedup_screened" >> "$LOG" 2>&1
echo "--- screened replica-50k done rc=$? post-load $(cat /proc/loadavg)" | tee -a "$LOG"
echo "=== probe_r12b end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
