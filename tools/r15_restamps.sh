#!/bin/bash
# Round 15: re-stamp the NN-descent-branch knn_graph gates ON HEAD
# under the fixed-COUNT probe rule (round-15 item 1 "done" criteria):
# sf1 (10-label, auto-K=30) and sf100b (2 x 218k blocks, auto-K=48).
# The derived modulus is 100 at BOTH shapes (spent/5e9 = 0.008 and 19,
# floored at 100), so the gate rows must reproduce the committed
# values bit-for-bit — this run proves the derivation is
# selection-neutral where it must be, and records wall secs
# (round-14 advice item 1). Uses the class snapshot.
set -x
cd /root/repo
export SPARK_GRAFT_SHUFFLE=32 SPARK_GRAFT_MAXPART=16m

export SPARK_DRIVER_MEM=24g SPARK_GRAFT_CPUS=16
rm -rf data/verify_sf1knn_r15
T0=$(date +%s)
tools/run_main_snapshot.sh graft.Verify data/sf1 data/verify_sf1knn_r15 \
  knn_graph > /tmp/r15_sf1knn_verify.log 2>&1
T1=$(date +%s)
echo "=== sf1 knn_graph verify wall: $((T1-T0)) s"
/root/.pyenv/shims/python3 tools/check_oracle.py data/sf1 \
  data/verify_sf1knn_r15 knn_graph > /tmp/r15_sf1knn_check.log 2>&1
echo "=== sf1 gate: $(tail -1 /tmp/r15_sf1knn_check.log)"

export SPARK_DRIVER_MEM=96g SPARK_GRAFT_CPUS=32
rm -rf data/verify_sf100b_r15
T2=$(date +%s)
tools/run_main_snapshot.sh graft.Verify data/sf100b data/verify_sf100b_r15 \
  knn_graph > /tmp/r15_sf100b_verify.log 2>&1
T3=$(date +%s)
echo "=== sf100b knn_graph verify wall: $((T3-T2)) s"
/root/.pyenv/shims/python3 tools/check_oracle.py data/sf100b \
  data/verify_sf100b_r15 knn_graph > /tmp/r15_sf100b_check.log 2>&1
echo "=== sf100b gate: $(tail -1 /tmp/r15_sf100b_check.log)"
grep -E "delta-stop|fresh edges" /tmp/r15_sf100b_verify.log | tail -20
echo "=== R15 RESTAMPS DONE (sf1 $((T1-T0)) s, sf100b $((T3-T2)) s) ==="
