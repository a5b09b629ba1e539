#!/bin/bash
# Round-12 adversarial rung refresh: the fingerprint gate grew 17→21→26
# (r12 adds q248/q174/q268/q110 + q335) and q334/q330's stderr
# arithmetic changed, so the r11 sweep's conclusions need re-proving on
# the hostile-value profile. Same testdata-ext/advA1 as rounds 10-11.
#  (1) fingerprints of ALL 26 gated queries on advA1 at local[32]/32,
#      diffed against tools/plan_fingerprints_sf1.txt;
#  (2) Verify crash sweep on advA1 of the round-12 changed/new queries.
set -u
cd /root/repo
LOG=tools/adversarial_r12.log
echo "=== adversarial_r12 start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

sbt -batch "runMain graft.PlanFingerprint testdata-ext/advA1 /tmp/fp_advA1_r12.txt 32" >> "$LOG" 2>&1
echo "fingerprint rc=$?" | tee -a "$LOG"
diff <(grep -v '^#' tools/plan_fingerprints_sf1.txt) <(grep -v '^#' /tmp/fp_advA1_r12.txt) | tee -a "$LOG"
echo "diff rc=$? (0 = identical)" | tee -a "$LOG"

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify testdata-ext/advA1 /tmp/verify_advA1_r12 q335_incremental_lsh_screened,q334_doulion_errmodel,q330_doulion_accuracy,q248_label_propagation,q174_kcore,q268_modularity,q110_pagerank" >> "$LOG" 2>&1
echo "crash sweep rc=$?" | tee -a "$LOG"
echo "=== adversarial_r12 end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
