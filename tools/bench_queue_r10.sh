#!/bin/bash
# Round-10 quiet-window bench evidence queue. Run from /root/repo inside
# tmux so it survives tool timeouts. Each step logs to /tmp/bq10/.
set -x
cd /root/repo
mkdir -p /tmp/bq10
ORACLE=/tmp/v10a/oracle_sql.json
SF30=/tmp/graft_sf30

date > /tmp/bq10/START; uptime >> /tmp/bq10/START

# 1. h18 eagerAgg interleaved A/B (VERDICT item 1)
tools/run.sh graft.tools.ABInterleave $SF30 h18_large_volume \
  spark.graft.eagerAgg 4 > /tmp/bq10/h18ab.json
uptime >> /tmp/bq10/h18ab.json

# 2. h05 same-hour pair + stage breakdown (VERDICT item 2)
tools/run.sh graft.tools.BenchSubset $SF30 h05_local_supplier \
  > /tmp/bq10/h05_spark.json
python3 tools/duck_bench.py $SF30 $ORACLE h05_local_supplier \
  > /tmp/bq10/h05_duck.json
tools/run.sh graft.tools.MetricsPlan h05_local_supplier $SF30 \
  > /tmp/bq10/h05_metrics.txt 2>&1
uptime > /tmp/bq10/h05_load

# 3. cluster-posture A/B on the four shuffle-floor queries (VERDICT item 4):
#    shipped defaults = compression on, no tmpfs override, 10 MB broadcast,
#    broadcast-semi tier enabled
SPARK_GRAFT_CONF="spark.shuffle.compress=true,spark.shuffle.spill.compress=true,spark.local.dir=/tmp/graft-shuffle-cluster,spark.sql.autoBroadcastJoinThreshold=10485760,spark.graft.dynamicFilter.maxBroadcastKeys=2000000" \
  tools/run.sh graft.tools.BenchSubset $SF30 \
  h10_returned_items h02_min_cost_supplier q22_tpch_q3 h18_large_volume \
  > /tmp/bq10/cluster_posture.json
tools/run.sh graft.tools.BenchSubset $SF30 \
  h10_returned_items h02_min_cost_supplier q22_tpch_q3 h18_large_volume \
  > /tmp/bq10/local_posture.json
uptime > /tmp/bq10/posture_load

# 4. the r10 sf30 soak pair (full headliners, both engines back-to-back)
SPARK_GRAFT_SF_DIR=$SF30 tools/run.sh graft.Bench \
  > /tmp/bq10/BENCH_sf30_r10_spark.json
python3 tools/duck_bench.py $SF30 $ORACLE \
  > /tmp/bq10/BENCH_sf30_r10_duckdb.json
uptime > /tmp/bq10/soak_load

date > /tmp/bq10/DONE; uptime >> /tmp/bq10/DONE
