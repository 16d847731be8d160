#!/bin/bash
# Round-12 quiet confirmation pairs (r12b): waits for gate12, then runs
# the sf30 and sf100 trios of Spark-flat / Spark-bucketed / DuckDB under
# a strict quiet gate. Logs to /tmp/bq12b/.
set -x
cd /root/repo
mkdir -p /tmp/bq12b
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
B30=/tmp/graft_sf30_bucketed
B100=/tmp/graft_sf100_bucketed
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"

for i in $(seq 1 300); do
  [ -f /tmp/gate12/ALL_DONE ] && break
  sleep 60
done
date > /tmp/bq12b/START

QUIET_MAX=3 QUIET_TIMEOUT_MIN=180 tools/quiet_run.sh \
  tools/run.sh graft.tools.BenchSubset $SF30 $HEAD \
  > /tmp/bq12b/BENCH_sf30_r12b_spark.json 2>/dev/null
SPARK_GRAFT_CONF="spark.graft.bucketedDir=$B30" \
  tools/run.sh graft.tools.BenchSubset $SF30 $HEAD \
  > /tmp/bq12b/BENCH_sf30_r12b_spark_bucketed.json 2>/dev/null
python3 tools/duck_bench.py $SF30 /tmp/v12_oracle/oracle_sql.json $HEAD \
  > /tmp/bq12b/BENCH_sf30_r12b_duckdb.json
uptime > /tmp/bq12b/sf30_load
date > /tmp/bq12b/DONE30

QUIET_MAX=4 QUIET_TIMEOUT_MIN=120 tools/quiet_run.sh \
  tools/run.sh graft.tools.BenchSubset $SF100 $HEAD \
  > /tmp/bq12b/BENCH_sf100_r12b_spark.json 2>/dev/null
SPARK_GRAFT_CONF="spark.graft.bucketedDir=$B100" \
  tools/run.sh graft.tools.BenchSubset $SF100 $HEAD \
  > /tmp/bq12b/BENCH_sf100_r12b_spark_bucketed.json 2>/dev/null
python3 tools/duck_bench.py $SF100 /tmp/v12_oracle/oracle_sql.json $HEAD \
  > /tmp/bq12b/BENCH_sf100_r12b_duckdb.json
uptime > /tmp/bq12b/sf100_load
date > /tmp/bq12b/ALL_DONE
