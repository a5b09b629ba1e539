#!/bin/bash
# Round-13 adversarial rung refresh: the optimization round changed the
# iterative-graph round bodies (q110/q248/q268/q174), the CC family
# (q45/q141/q212/q324/q49), the weighted ppjoin verify (q52), q142's
# scan spread, and q150/q207. Re-prove on the hostile-value profile:
#  (1) fingerprints of all 26 gated queries on advA1 at local[32]/32,
#      diffed against tools/plan_fingerprints_sf1.txt;
#  (2) Verify crash sweep on advA1 of the round-13 changed queries.
set -u
cd /root/repo
LOG=tools/adversarial_r13.log
echo "=== adversarial_r13 start $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"

sbt -batch "runMain graft.PlanFingerprint testdata-ext/advA1 /tmp/fp_advA1_r13.txt 32" >> "$LOG" 2>&1
echo "fingerprint rc=$?" | tee -a "$LOG"
diff <(grep -v '^#' tools/plan_fingerprints_sf1.txt) <(grep -v '^#' /tmp/fp_advA1_r13.txt) | tee -a "$LOG"
echo "diff rc=$? (0 = identical)" | tee -a "$LOG"

SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Verify testdata-ext/advA1 /tmp/verify_advA1_r13 q268_modularity,q248_label_propagation,q110_pagerank,q174_kcore,q45_dedup_clusters,q141_cluster_sizes,q212_leakage_split,q324_soft_dedup_weights,q49_neardup_corpus,q52_weighted_jaccard_pairs,q51_ppjoin_pairs,q142_dup_substrings,q150_source_overlap,q207_phonetic_pairs" >> "$LOG" 2>&1
echo "crash sweep rc=$?" | tee -a "$LOG"
echo "=== adversarial_r13 end $(date -u +%FT%TZ) loadavg $(cat /proc/loadavg)" | tee -a "$LOG"
