#!/bin/bash
# Round 15 item 4: the unlabeled-corpus (labels=1) knn_graph gate runs
# under the PRODUCTION Verify main with the quantizer blocking knob —
# BOTH guard branches, each on the geometry class that selects it:
#
#  - data/sf10u1 (100x of sf0.1 label 2, plain rotation, ONE distinct
#    label, 21,800 vectors): at 100 copies only ~1/3 of vectors have an
#    exact mate, so most true top-3 edges are cross-copy extreme-value
#    noise — spatial blocking MUST lose them; expected path: quantize
#    probes below 0.9, guard escalates to the unblocked construction
#    (the sf10d1-proven auto-K=39 path), gate green on the healed graph.
#
#  - data/sf10u2 (1000x of sf0.01 label 2, plain rotation, ONE distinct
#    label, ~22,000 vectors): the 64-dim rotation period makes every
#    vector exact-duplicate-dense (~15 cos-1.0 mates) and identical
#    vectors land in identical cells, so the quantized graph recovers
#    the true top-3 inside its cells; expected path: quantize ACCEPTED.
#
# Uses the class snapshot (long runs must not race sbt recompiles).
set -x
cd /root/repo
export SPARK_DRIVER_MEM=48g SPARK_GRAFT_CPUS=16 SPARK_GRAFT_SHUFFLE=32 \
       SPARK_GRAFT_MAXPART=16m \
       SPARK_GRAFT_KNN_BLOCKING=auto SPARK_GRAFT_KNN_BLOCK_SIZE=4000

if [ ! -d data/sf10u2 ]; then
  tools/run_main_snapshot.sh graft.GenScaleVec /root/testdata/sf0.01 \
    data/sf10u2 1000 --labels=2 > /tmp/r15_sf10u2_gen.log 2>&1
fi

for C in sf10u1 sf10u2; do
  rm -rf data/verify_${C}_r15
  T0=$(date +%s)
  tools/run_main_snapshot.sh graft.Verify data/$C data/verify_${C}_r15 \
    knn_graph > /tmp/r15_${C}_verify.log 2>&1
  T1=$(date +%s)
  echo "=== $C verify wall: $((T1-T0)) s"
  /root/.pyenv/shims/python3 tools/check_oracle.py data/$C \
    data/verify_${C}_r15 knn_graph > /tmp/r15_${C}_check.log 2>&1
  echo "=== $C gate: $(tail -1 /tmp/r15_${C}_check.log)"
  grep -E "quantize|escalat|sampleMod" /tmp/r15_${C}_verify.log | tail -8
done
echo "=== R15 AUTOBLOCK GATES DONE ==="
