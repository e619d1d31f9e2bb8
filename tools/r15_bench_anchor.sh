#!/bin/bash
# Round 15 item 3: re-anchor the bench baseline ON THIS HOST — the
# round-1-chained ratio carries two host migrations of noise, so this
# pins a median-of-3 full-catalog measurement (+ TopKMicro + the
# in-artifact sentinel blocks) on HEAD that round-16+ driver-to-driver
# deltas can cite directly. MUST run on a quiet machine (no concurrent
# graft jobs) — the whole point is a clean reference.
set -x
cd /root/repo
export SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_DRIVER_MEM=48g \
       SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32
for i in 1 2 3; do
  T0=$(date +%s)
  tools/run_main_snapshot.sh graft.Bench > /tmp/r15_anchor_run$i.stdout 2>&1
  T1=$(date +%s)
  cp BENCH_FULL.json /tmp/r15_anchor_run$i.json
  echo "=== anchor run $i wall: $((T1-T0)) s"
done
tools/run_main_snapshot.sh graft.tools.TopKMicro > /tmp/r15_anchor_micro.json 2>&1
echo "=== micro: $(cat /tmp/r15_anchor_micro.json)"
echo "=== R15 BENCH ANCHOR RUNS DONE ==="
