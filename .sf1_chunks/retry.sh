#!/bin/bash
cd /root/repo
SF=.fixtures/sf1
C=.sf1_chunks
export SPARK_GRAFT_DRIVER_MEM=24g
for q in dedup_lsh_quality_audit dedup_minhash_calibration graph_link_prediction split_leakage_safe; do
  python tools/selfcheck.py --json $C/retry_$q.json $SF $q > $C/retry_$q.log 2>&1
done
echo RETRIES_DONE
