#!/bin/bash
# Round-11c: rebuild the sf30 soak fixture (fresh session wiped /tmp) and
# run one more quiet-window sf30 headliner pair on the shipped build.
# Logs to /tmp/bq11c/.
set -x
cd /root/repo
mkdir -p /tmp/bq11c
SF30=/tmp/graft_sf30
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"

date > /tmp/bq11c/START; uptime >> /tmp/bq11c/START

# 0. fixture rebuild (cardinality-preserving 300x multi-file)
if [ ! -d "$SF30/lineitem.parquet" ] && [ ! -e "$SF30/lineitem.parquet" ]; then
  tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 $SF30 300 96 2>/dev/null | tail -2
fi
date > /tmp/bq11c/FIXTURE_DONE

# 1. oracle SQL dump for duck_bench
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/v11c_oracle q51_values \
  2>/dev/null | tail -1

# 2. sf30 pair (quiet-gated start, Spark then DuckDB back-to-back)
QUIET_MAX=5 QUIET_TIMEOUT_MIN=60 tools/quiet_run.sh \
  tools/run.sh graft.tools.BenchSubset $SF30 $HEAD \
  > /tmp/bq11c/BENCH_sf30_r11c_spark.json 2>/dev/null
python3 tools/duck_bench.py $SF30 /tmp/v11c_oracle/oracle_sql.json $HEAD \
  > /tmp/bq11c/BENCH_sf30_r11c_duckdb.json
uptime > /tmp/bq11c/sf30_load
date > /tmp/bq11c/DONE
rm -rf /dev/shm/graft-shuffle/blockmgr-* /dev/shm/graft-shuffle/spark-* 2>/dev/null
