#!/bin/bash
# Round 15: the deferred sf100d1 PRODUCTION escalation run (round-14
# verdict item 2). data/sf100d1 (one decorrelated 218k block,
# KSWEEP_SF100D1) measured converged K=48 recall@3 = 0.8586 — below
# the 0.9 gate. Under the round-15 ladder dispatcher, Verify's
# knn_graph entry probes that itself and CLIMBS the K ladder (48 → 64;
# the default rung work budget 4x admits exactly this one full-corpus
# rung); the hash gate then asserts recall_ok on the FINAL graph.
# Either outcome is the measurement: >=0.9 proves self-healing closes
# the structure-free worst case; <0.9 is the honest loud-failure path
# with the K=64 trend recorded. Wall timing is captured for the
# artifact (round-14 advice item 1).
set -x
cd /root/repo
export SPARK_DRIVER_MEM=96g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 \
       SPARK_GRAFT_MAXPART=16m
rm -rf data/verify_sf100d1_r15
T0=$(date +%s)
tools/run_main_snapshot.sh graft.Verify data/sf100d1 data/verify_sf100d1_r15 \
  knn_graph > /tmp/r15_sf100d1_verify.log 2>&1
T1=$(date +%s)
echo "=== verify wall: $((T1-T0)) s"
/root/.pyenv/shims/python3 tools/check_oracle.py data/sf100d1 \
  data/verify_sf100d1_r15 knn_graph > /tmp/r15_sf100d1_check.log 2>&1
echo "=== sf100d1 escalation gate: $(tail -1 /tmp/r15_sf100d1_check.log)"
echo "=== escalation log lines:"
grep -E "escalation|delta-stop at|sampleMod|probe" /tmp/r15_sf100d1_verify.log | tail -40
echo "=== R15 ESCALATION RUN DONE ($((T1-T0)) s verify wall) ==="
