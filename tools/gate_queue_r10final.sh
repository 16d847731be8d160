#!/bin/bash
# FINAL round-10 gates on the shipped build: default sweep, opt-in sweep
# (all three opt-in tiers forced on), full test suite, then a fresh sf30
# pair reflecting the cascade rule.
set -x
cd /root/repo
mkdir -p /tmp/gatef
# wait for the stale sf0.1 check to drain (same box)
while tmux has-session -t gate10g 2>/dev/null && [ ! -f /tmp/gate10/SF01_DONE ]; do sleep 60; done

tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gatef/v_default \
  > /tmp/gatef/verify_default.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gatef/v_default \
  > /tmp/gatef/check_default.txt 2>&1

SPARK_GRAFT_CONF="spark.graft.eagerAgg.generic=true,spark.graft.eagerAgg.genericMinBytes=0,spark.graft.fuseUnionScans=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gatef/v_optin \
  > /tmp/gatef/verify_optin.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gatef/v_optin \
  > /tmp/gatef/check_optin.txt 2>&1

sbt test > /tmp/gatef/sbt_test.log 2>&1
tail -15 /tmp/gatef/sbt_test.log > /tmp/gatef/sbt_test_tail.txt

# fresh sf30 pair on the cascade build
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"
QUIET_MAX=5 QUIET_TIMEOUT_MIN=60 tools/quiet_run.sh true
tools/run.sh graft.tools.BenchSubset /tmp/graft_sf30 $HEAD \
  > /tmp/gatef/BENCH_sf30_r10c_spark.json
python3 tools/duck_bench.py /tmp/graft_sf30 /tmp/v10c_oracle.json \
  > /tmp/gatef/BENCH_sf30_r10c_duckdb.json
uptime > /tmp/gatef/soak_load
# DS set too (cascade moves ds01/ds05/ds07)
tools/run.sh graft.tools.BenchSubset /tmp/graft_sf30 \
  ds01_star_rollup ds02_moving_rank ds03_channel_union ds04_yoy_growth \
  ds05_gsets_rank ds06_bucket_counts ds07_rollup_topk \
  > /tmp/gatef/ds_r10c_spark.json
python3 tools/duck_bench.py /tmp/graft_sf30 /tmp/v10c_oracle.json \
  ds01_star_rollup ds02_moving_rank ds03_channel_union ds04_yoy_growth \
  ds05_gsets_rank ds06_bucket_counts ds07_rollup_topk \
  > /tmp/gatef/ds_r10c_duck.json
date > /tmp/gatef/ALL_DONE
