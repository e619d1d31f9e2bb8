#!/bin/bash
# Round-14 gate re-stamp pipeline (verdict items 1 and 4): the
# NN-descent-branch knn_graph gates re-run ON HEAD (the delta-rule +
# detachStats + escalation dispatcher code), then the 1M-doc-shape
# LSH-branch residue slice. Serial on purpose - one heavy engine at a
# time (the round-7/9 disk/RAM discipline).
set -x
cd /root/repo
export SPARK_DRIVER_MEM=96g SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SHUFFLE=32 \
       SPARK_GRAFT_MAXPART=16m

# --- 1. sf1 knn_graph gate on HEAD (NN-descent branch, auto-K=30) ---
rm -rf data/verify_sf1_r14
tools/run_main.sh graft.Verify data/sf1 data/verify_sf1_r14 knn_graph \
  > /tmp/r14_sf1_verify.log 2>&1
python3 tools/check_oracle.py data/sf1 data/verify_sf1_r14 knn_graph \
  > /tmp/r14_sf1_check.log 2>&1
echo "=== sf1 gate: $(tail -1 /tmp/r14_sf1_check.log)"

# --- 2. sf100b knn_graph gate on HEAD (auto-K=48, 96g profile) ---
rm -rf data/verify_sf100b_r14
tools/run_main.sh graft.Verify data/sf100b data/verify_sf100b_r14 knn_graph \
  > /tmp/r14_sf100b_verify.log 2>&1
python3 tools/check_oracle.py data/sf100b data/verify_sf100b_r14 knn_graph \
  > /tmp/r14_sf100b_check.log 2>&1
echo "=== sf100b gate: $(tail -1 /tmp/r14_sf100b_check.log)"

# --- 3. 1M-doc-shape residue slice: mod 16 of sf20docs (62500 docs) ---
if [ ! -d data/sf20s16/documents.parquet ]; then
  tools/run_main.sh graft.GenSlice data/sf20docs data/sf20s16 16 \
    /root/testdata/sf0.01 > /tmp/r14_genslice.log 2>&1
fi
rm -rf data/verify_sf20s16
SPARK_GRAFT_PAIRS=lsh tools/run_main.sh graft.Verify data/sf20s16 \
  data/verify_sf20s16 dedup_minhash minhash_band_profile lsh_recall \
  > /tmp/r14_sf20_verify.log 2>&1
mkdir -p data/ducktmp
GRAFT_DUCK_MEM=100GB GRAFT_DUCK_TMP=/root/repo/data/ducktmp \
  GRAFT_DUCK_THREADS=16 SPARK_GRAFT_PAIRS=lsh \
  python3 tools/sweep_keys.py data/sf20s16 data/verify_sf20s16 \
  /tmp/r14_sf20_sweep.json --timeout=7200 \
  dedup_minhash minhash_band_profile lsh_recall \
  > /tmp/r14_sf20_check.log 2>&1
echo "=== sf20 slice sweep: $(tail -3 /tmp/r14_sf20_check.log)"
echo "=== R14 GATE PIPELINE DONE ==="
