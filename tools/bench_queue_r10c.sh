#!/bin/bash
# Round-10 sequential follow-up queue (replaces r10b): soak spark side
# (10-headliner BenchSubset — the full 33-query graft.Bench at sf30 fills
# tmpfs with uncompressed shuffle and gets OOM-killed), DS pair, q22
# generic-eager A/B, then quiet-window h05 pair + h18 A/B re-runs.
set -x
cd /root/repo
mkdir -p /tmp/bq10
ORACLE=/tmp/v10b/oracle_sql.json
SF30=/tmp/graft_sf30
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"

while [ ! -f /tmp/bq10/DONE ]; do sleep 20; done

# 1. soak pair spark side (duck side just ran in bq10 step 4)
tools/run.sh graft.tools.BenchSubset $SF30 $HEAD \
  > /tmp/bq10/BENCH_sf30_r10_spark.json
uptime > /tmp/bq10/soak_spark_load

# 2. DS-shape sf30 pair (back-to-back)
tools/run.sh graft.tools.BenchSubset $SF30 \
  ds01_star_rollup ds02_moving_rank ds03_channel_union ds04_yoy_growth \
  ds05_gsets_rank > /tmp/bq10/ds_spark.json
python3 tools/duck_bench.py $SF30 $ORACLE \
  ds01_star_rollup ds02_moving_rank ds03_channel_union ds04_yoy_growth \
  ds05_gsets_rank > /tmp/bq10/ds_duck.json
uptime > /tmp/bq10/ds_load

# 3. q22 generic-eager-push interleaved A/B (variant 3)
tools/run.sh graft.tools.ABInterleave $SF30 q22_tpch_q3 \
  spark.graft.eagerAgg.generic 4 > /tmp/bq10/q22_generic_ab.json

# 4. quiet-window h05 pair
QUIET_MAX=4 QUIET_TIMEOUT_MIN=60 tools/quiet_run.sh true
tools/run.sh graft.tools.BenchSubset $SF30 h05_local_supplier \
  > /tmp/bq10/h05b_spark.json
python3 tools/duck_bench.py $SF30 $ORACLE h05_local_supplier \
  > /tmp/bq10/h05b_duck.json
uptime > /tmp/bq10/h05b_load

# 5. quiet-window h18 A/B re-run
QUIET_MAX=4 QUIET_TIMEOUT_MIN=45 tools/quiet_run.sh true
tools/run.sh graft.tools.ABInterleave $SF30 h18_large_volume \
  spark.graft.eagerAgg 3 > /tmp/bq10/h18ab_b.json

date > /tmp/bq10/DONE2; uptime >> /tmp/bq10/DONE2
