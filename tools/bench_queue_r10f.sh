#!/bin/bash
# ds06/ds07 sf30 pair, after the sf100 pair finishes.
set -x
cd /root/repo
while [ ! -f /tmp/bq10/DONE4 ]; do sleep 60; done
tools/run.sh graft.tools.BenchSubset /tmp/graft_sf30 ds06_bucket_counts ds07_rollup_topk \
  > /tmp/bq10/ds67_spark.json
python3 tools/duck_bench.py /tmp/graft_sf30 /tmp/v10c_oracle.json ds06_bucket_counts ds07_rollup_topk \
  > /tmp/bq10/ds67_duck.json
uptime > /tmp/bq10/ds67_load
date > /tmp/bq10/DONE5
