#!/bin/bash
# Round-12 quiet-window soak evidence queue (sequential — parallel Spark
# runs pollute each other). Logs to /tmp/bq12/.
set -x
cd /root/repo
mkdir -p /tmp/bq12
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
B30=/tmp/graft_sf30_bucketed
B100=/tmp/graft_sf100_bucketed
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"

date > /tmp/bq12/START; uptime >> /tmp/bq12/START

# 0. oracle SQL dump for duck_bench
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/v12_oracle q51_values \
  2>/dev/null | tail -1

# 1. h02 runtime-broadcast A/B (AQE decides with RUNTIME bytes instead of
#    the static 4m estimate compromise): interleaved, one JVM
QUIET_MAX=5 QUIET_TIMEOUT_MIN=45 tools/quiet_run.sh \
  tools/run.sh graft.tools.ABInterleave $SF30 h02_min_cost_supplier \
  spark.sql.adaptive.autoBroadcastJoinThreshold 4 33554432 __unset__ \
  > /tmp/bq12/AB_h02_runtime_broadcast.json 2>/dev/null
date > /tmp/bq12/DONE1

# 1b. same conf on h05/h18 (regression check for the runtime threshold)
tools/run.sh graft.tools.ABInterleave $SF30 h05_local_supplier \
  spark.sql.adaptive.autoBroadcastJoinThreshold 3 33554432 __unset__ \
  > /tmp/bq12/AB_h05_runtime_broadcast.json 2>/dev/null
tools/run.sh graft.tools.ABInterleave $SF30 h18_large_volume \
  spark.sql.adaptive.autoBroadcastJoinThreshold 3 33554432 __unset__ \
  > /tmp/bq12/AB_h18_runtime_broadcast.json 2>/dev/null
date > /tmp/bq12/DONE1b

# 2. sorted-bucket-scan A/B on the bucketed layout (one file per bucket =
#    the safe regime for legacy outputOrdering; kills the SMJ Sorts)
SPARK_GRAFT_CONF="spark.graft.bucketedDir=$B30" \
  tools/run.sh graft.tools.ABInterleave $SF30 h18_large_volume \
  spark.sql.legacy.bucketedTableScan.outputOrdering 3 \
  > /tmp/bq12/AB_h18_sortedscan.json 2>/dev/null
SPARK_GRAFT_CONF="spark.graft.bucketedDir=$B30" \
  tools/run.sh graft.tools.ABInterleave $SF30 h21_waiting_supplier \
  spark.sql.legacy.bucketedTableScan.outputOrdering 3 \
  > /tmp/bq12/AB_h21_sortedscan.json 2>/dev/null
date > /tmp/bq12/DONE2

# 3. sf30 committed pair: flat spark, bucketed spark, duckdb (same bytes)
QUIET_MAX=5 QUIET_TIMEOUT_MIN=60 tools/quiet_run.sh \
  tools/run.sh graft.tools.BenchSubset $SF30 $HEAD \
  > /tmp/bq12/BENCH_sf30_r12_spark.json 2>/dev/null
SPARK_GRAFT_CONF="spark.graft.bucketedDir=$B30" \
  tools/run.sh graft.tools.BenchSubset $SF30 $HEAD \
  > /tmp/bq12/BENCH_sf30_r12_spark_bucketed.json 2>/dev/null
python3 tools/duck_bench.py $SF30 /tmp/v12_oracle/oracle_sql.json $HEAD \
  > /tmp/bq12/BENCH_sf30_r12_duckdb.json
uptime > /tmp/bq12/sf30_load
date > /tmp/bq12/DONE3

# 4. sf100 fixture rebuild + bucketize
if ! python3 -c "import duckdb; assert duckdb.sql(\"SELECT count(*) FROM read_parquet('$SF100/lineitem.parquet/*.parquet')\").fetchone()[0] == 600000000" 2>/dev/null; then
  tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 $SF100 1000 96 2>/dev/null | tail -1
fi
tools/run.sh graft.tools.Bucketize $SF100 $B100 32 2>/dev/null | tail -2
date > /tmp/bq12/DONE4

# 5. sf100 committed pair: flat spark, bucketed spark, duckdb
QUIET_MAX=5 QUIET_TIMEOUT_MIN=60 tools/quiet_run.sh \
  tools/run.sh graft.tools.BenchSubset $SF100 $HEAD \
  > /tmp/bq12/BENCH_sf100_r12_spark.json 2>/dev/null
SPARK_GRAFT_CONF="spark.graft.bucketedDir=$B100" \
  tools/run.sh graft.tools.BenchSubset $SF100 $HEAD \
  > /tmp/bq12/BENCH_sf100_r12_spark_bucketed.json 2>/dev/null
python3 tools/duck_bench.py $SF100 /tmp/v12_oracle/oracle_sql.json $HEAD \
  > /tmp/bq12/BENCH_sf100_r12_duckdb.json
uptime > /tmp/bq12/sf100_load
date > /tmp/bq12/DONE5

# 6. builder sf0.1 quiet artifact
QUIET_MAX=4 QUIET_TIMEOUT_MIN=30 tools/quiet_run.sh \
  bash -c 'SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench 2>/dev/null | tail -1' \
  > /tmp/bq12/BENCH_sf01_r12_builder.json
uptime > /tmp/bq12/sf01_load
date > /tmp/bq12/ALL_DONE
