#!/bin/bash
# Round-14 item 1: refresh the committed multi-decade VERIFY artifacts for
# the entries the r13 d13 rewrite touched (d2/d13/d14 at sf1, d13 at sf10).
# VERDICT r13 "missing" item 1: the bounded-pairing d13 had no committed
# multi-decade oracle artifact — only sf0.1 green plus a commit message.
set -euo pipefail
cd /root/repo
export SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=16g

echo "== sf1 delta verify (d2/d13/d14) =="
rm -rf /tmp/vdelta_sf1
sbt -batch "runMain graft.Verify /root/repo/testdata_sf1 /tmp/vdelta_sf1 d2_dedup_minhash d13_lsh_calibration d14_retention_policies"
python3 scripts/verify_local.py /root/repo/testdata_sf1 /tmp/vdelta_sf1 \
  d2_dedup_minhash d13_lsh_calibration d14_retention_policies \
  --json /tmp/vdelta_sf1.json

echo "== sf10 delta verify (d13) =="
rm -rf /tmp/vdelta_sf10
sbt -batch "runMain graft.Verify /root/repo/testdata_sf10 /tmp/vdelta_sf10 d13_lsh_calibration"
python3 scripts/verify_local.py /root/repo/testdata_sf10 /tmp/vdelta_sf10 \
  d13_lsh_calibration --json /tmp/vdelta_sf10.json

echo "== merge =="
python3 scripts/merge_verify.py VERIFY_sf1.json /tmp/vdelta_sf1.json
python3 scripts/merge_verify.py VERIFY_sf10.json /tmp/vdelta_sf10.json
echo "R14_VERIFY_DELTA_DONE"
