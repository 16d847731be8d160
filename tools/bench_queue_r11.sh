#!/bin/bash
# Round-11 quiet-window soak evidence queue: one sf30 pair + one sf100
# pair (10 TPC-H headliners, Spark then DuckDB back-to-back), plus a
# quiet builder sf0.1 Bench artifact. Logs to /tmp/bq11/.
set -x
cd /root/repo
mkdir -p /tmp/bq11
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"

date > /tmp/bq11/START; uptime >> /tmp/bq11/START

# 0. oracle SQL dump for duck_bench
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/v11_oracle q51_values \
  2>/dev/null | tail -1

# 1. sf30 pair (quiet-gated start)
QUIET_MAX=5 QUIET_TIMEOUT_MIN=60 tools/quiet_run.sh \
  tools/run.sh graft.tools.BenchSubset $SF30 $HEAD \
  > /tmp/bq11/BENCH_sf30_r11_spark.json 2>/dev/null
python3 tools/duck_bench.py $SF30 /tmp/v11_oracle/oracle_sql.json $HEAD \
  > /tmp/bq11/BENCH_sf30_r11_duckdb.json
uptime > /tmp/bq11/sf30_load
date > /tmp/bq11/DONE1

# 2. sf100 pair (quiet-gated start)
QUIET_MAX=5 QUIET_TIMEOUT_MIN=60 tools/quiet_run.sh \
  tools/run.sh graft.tools.BenchSubset $SF100 $HEAD \
  > /tmp/bq11/BENCH_sf100_r11_spark.json 2>/dev/null
python3 tools/duck_bench.py $SF100 /tmp/v11_oracle/oracle_sql.json $HEAD \
  > /tmp/bq11/BENCH_sf100_r11_duckdb.json
uptime > /tmp/bq11/sf100_load
date > /tmp/bq11/DONE2

# 3. builder sf0.1 quiet artifact
QUIET_MAX=4 QUIET_TIMEOUT_MIN=30 tools/quiet_run.sh \
  bash -c 'SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench 2>/dev/null | tail -1' \
  > /tmp/bq11/BENCH_sf01_r11_builder.json
uptime > /tmp/bq11/sf01_load
date > /tmp/bq11/DONE3
rm -rf /dev/shm/graft-shuffle/blockmgr-* /dev/shm/graft-shuffle/spark-* 2>/dev/null
