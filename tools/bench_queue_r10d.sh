#!/bin/bash
# Round-10 final soak pair: waits for the correctness gates, then runs the
# 10-headliner sf30 pair back-to-back in the quietest window available.
set -x
cd /root/repo
ORACLE=/tmp/v10b/oracle_sql.json
SF30=/tmp/graft_sf30
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"

while [ ! -f /tmp/gate10/GATES_DONE ]; do sleep 60; done
QUIET_MAX=4 QUIET_TIMEOUT_MIN=90 tools/quiet_run.sh true

uptime > /tmp/bq10/soakb_load_start
tools/run.sh graft.tools.BenchSubset $SF30 $HEAD \
  > /tmp/bq10/BENCH_sf30_r10b_spark.json
python3 tools/duck_bench.py $SF30 $ORACLE \
  > /tmp/bq10/BENCH_sf30_r10b_duckdb.json
uptime > /tmp/bq10/soakb_load_end
date > /tmp/bq10/DONE3
