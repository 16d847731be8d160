#!/bin/bash
set -x
cd /root/repo
QUIET_MAX=3 QUIET_TIMEOUT_MIN=75 tools/quiet_run.sh true
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench 2>/dev/null | tail -1 \
  > /tmp/gatef/BENCH_sf01_r10_builder.json
date > /tmp/gatef/BUILDER_BENCH_DONE
