#!/bin/bash
# Round 14: the production recall escalation exercised at the
# structure-free worst case. data/sf100d1 (one decorrelated 218k
# block, KSWEEP_SF100D1) measured converged K=48 recall@3 = 0.8586 —
# below the 0.9 gate. Under the round-14 dispatcher, Verify's
# knn_graph entry probes that itself and re-runs the block at the
# next K rung (64) — the trend point round 13's wall budget cut; the
# hash gate then asserts recall_ok on the FINAL (escalated) graph.
# Either outcome is the measurement: >=0.9 proves self-healing closes
# the worst case; <0.9 is the honest loud-failure path with the K=64
# trend recorded.
set -x
cd /root/repo
export SPARK_DRIVER_MEM=96g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 \
       SPARK_GRAFT_MAXPART=16m
rm -rf data/verify_sf100d1_r14
tools/run_main.sh graft.Verify data/sf100d1 data/verify_sf100d1_r14 \
  knn_graph > /tmp/r14_sf100d1_verify.log 2>&1
python3 tools/check_oracle.py data/sf100d1 data/verify_sf100d1_r14 \
  knn_graph > /tmp/r14_sf100d1_check.log 2>&1
echo "=== sf100d1 escalation gate: $(tail -1 /tmp/r14_sf100d1_check.log)"
echo "=== R14 ESCALATION RUN DONE ==="
