#!/bin/bash
# Round-10 sf100 ladder pair: waits for the r10b soak pair (DONE3), then
# runs the 10-headliner pair at /tmp/graft_sf100 back-to-back.
set -x
cd /root/repo
ORACLE=/tmp/v10b/oracle_sql.json
SF100=/tmp/graft_sf100
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"

while [ ! -f /tmp/bq10/DONE3 ]; do sleep 60; done

uptime > /tmp/bq10/sf100_load_start
tools/run.sh graft.tools.BenchSubset $SF100 $HEAD \
  > /tmp/bq10/BENCH_sf100_r10_spark.json
python3 tools/duck_bench.py $SF100 $ORACLE \
  > /tmp/bq10/BENCH_sf100_r10_duckdb.json
uptime > /tmp/bq10/sf100_load_end
date > /tmp/bq10/DONE4
