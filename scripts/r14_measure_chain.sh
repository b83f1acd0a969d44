#!/bin/bash
# Round-14 serialized measurement chain. Order matters: nothing else may
# run during a timed leg (the host's ±25% swing is contention-driven),
# and the canary stamps host state BEFORE the oracle sweep it guards.
set -uo pipefail
cd /root/repo
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g

echo "== [1/5] sf1 full Spark bench, min-of-3 =="
python3 scripts/bench_min3.py /root/repo/testdata_sf1 BENCH_local_sf1_full.json 3 \
  || echo "LEG1_FAILED"

echo "== [2/5] host canary (pinned-verdict version) =="
python3 scripts/host_canary.py /root/repo/testdata_sf1 /tmp/vdelta_sf1 HOST_CANARY_r14.json \
  || echo "LEG2_FAILED"

echo "== [3/5] DuckDB sf1 baseline, pinned regime (8t/48GB, 5 runs) =="
python3 scripts/duckdb_baseline.py measure /root/repo/testdata_sf1 /tmp/vdelta_sf1 \
  /tmp/BASELINE_duckdb_fresh.json || echo "LEG3_FAILED"

echo "== [4/5] sf10 full Spark bench, min-of-2 =="
python3 scripts/bench_min3.py /root/repo/target/testdata_sf10 BENCH_sf10_full.json 2 \
  || echo "LEG4_FAILED"

echo "== [5/5] perturbed-corpus control, min-of-2 (d2/d13/d14) =="
export SPARK_GRAFT_BENCH_ONLY=d2,d13,d14
python3 scripts/bench_min3.py /root/repo/target/testdata_sf1p /tmp/BENCH_sf1p_spot.json 2 \
  || echo "LEG5A_FAILED"
python3 scripts/bench_min3.py /root/repo/target/testdata_sf10p /tmp/BENCH_sf10p_spot.json 2 \
  || echo "LEG5B_FAILED"
echo "R14_MEASURE_CHAIN_DONE"
