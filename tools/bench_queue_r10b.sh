#!/bin/bash
# Round-10 second bench stage: waits for bq10 to finish, then runs the
# DS-shape sf30 pair and quiet-window re-runs of the h05 pair and h18 A/B.
set -x
cd /root/repo
mkdir -p /tmp/bq10
ORACLE=/tmp/v10b/oracle_sql.json
SF30=/tmp/graft_sf30

while [ ! -f /tmp/bq10/DONE ]; do sleep 30; done

# 1. DS-shape sf30 pair (back-to-back)
tools/run.sh graft.tools.BenchSubset $SF30 \
  ds01_star_rollup ds02_moving_rank ds03_channel_union ds04_yoy_growth \
  ds05_gsets_rank > /tmp/bq10/ds_spark.json
python3 tools/duck_bench.py $SF30 $ORACLE \
  ds01_star_rollup ds02_moving_rank ds03_channel_union ds04_yoy_growth \
  ds05_gsets_rank > /tmp/bq10/ds_duck.json
uptime > /tmp/bq10/ds_load

# 2. quiet-window h05 pair (back-to-back, gated on load < 4)
QUIET_MAX=4 QUIET_TIMEOUT_MIN=90 tools/quiet_run.sh true
tools/run.sh graft.tools.BenchSubset $SF30 h05_local_supplier \
  > /tmp/bq10/h05b_spark.json
python3 tools/duck_bench.py $SF30 $ORACLE h05_local_supplier \
  > /tmp/bq10/h05b_duck.json
uptime > /tmp/bq10/h05b_load

# 3. quiet-window h18 A/B re-run
QUIET_MAX=4 QUIET_TIMEOUT_MIN=60 tools/quiet_run.sh true
tools/run.sh graft.tools.ABInterleave $SF30 h18_large_volume \
  spark.graft.eagerAgg 3 > /tmp/bq10/h18ab_b.json

date > /tmp/bq10/DONE2; uptime >> /tmp/bq10/DONE2
