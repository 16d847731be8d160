#!/bin/bash
# Round-14 QUIET-WINDOW re-run (r14a ran under co-tenant load 17-26):
# q22 hybrid attribution A/B, committed pairs at sf30+sf100, and the
# sf0.1 builder bench artifact. Artifacts land in /tmp/bq14b/.
set -x
cd /root/repo
mkdir -p /tmp/bq14b
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h10_returned_items_orig h14_promo_effect h18_large_volume h21_waiting_supplier"
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
L30=/tmp/graft_sf30_bucketed2
L100=/tmp/graft_sf100_bucketed2
clean_tmpfs() { rm -rf /dev/shm/graft-shuffle/* 2>/dev/null; }
clean_tmpfs
cut -d' ' -f1-3 /proc/loadavg > /tmp/bq14b/LOAD_AT_START
date > /tmp/bq14b/START

# q22 attribution: the hybrid aggregate is what improved q22 over the
# orderkey layout this round (plan shows RunHashAggregate) — measure it
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF30 q22_tpch_q3 \
  spark.graft.streamingSortedAgg.hybrid 4 2>/dev/null | tail -1 \
  > /tmp/bq14b/AB_sf30_q22_hybrid.json
clean_tmpfs
unset SPARK_GRAFT_CONF

# sf30 pair
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.BenchSubset $SF30 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq14b/BENCH_sf30_r14b_spark_full.json
clean_tmpfs
unset SPARK_GRAFT_CONF
tools/run.sh graft.tools.BenchSubset $SF30 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq14b/BENCH_sf30_r14b_spark_flat.json
clean_tmpfs
python3 tools/duck_bench.py $SF30 /tmp/bq14/osql/oracle_sql.json $HEAD \
  > /tmp/bq14b/BENCH_sf30_r14b_duckdb.json 2>/dev/null
date > /tmp/bq14b/DONE_SF30

# sf0.1 builder bench (the driver's per-round artifact, quiet-window copy)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench 2>/dev/null \
  | tail -1 > /tmp/bq14b/BENCH_sf01_r14_builder1.json
clean_tmpfs

# sf100 pair
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L100,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.BenchSubset $SF100 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq14b/BENCH_sf100_r14b_spark_full.json
clean_tmpfs
unset SPARK_GRAFT_CONF
tools/run.sh graft.tools.BenchSubset $SF100 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq14b/BENCH_sf100_r14b_spark_flat.json
clean_tmpfs
python3 tools/duck_bench.py $SF100 /tmp/bq14/osql/oracle_sql.json $HEAD \
  > /tmp/bq14b/BENCH_sf100_r14b_duckdb.json 2>/dev/null
cut -d' ' -f1-3 /proc/loadavg > /tmp/bq14b/LOAD_AT_END
date > /tmp/bq14b/ALL_DONE
