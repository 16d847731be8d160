#!/bin/bash
# Round-13 soak-pair queue: (1) build the sf100 EXTENDED-SORT layout
# (bucket by orderkey, lineitem files sorted by orderkey+suppkey — the
# canonical layout after the round-13 A/Bs), then (2) quiet-gated
# committed pairs at sf30 and sf100 with the FULL POSTURE
# (bucketedDir + sortedScan + streamingSortedAgg, all default-on) as the
# LEAD arm, flat as the secondary arm, DuckDB back-to-back. Logs and
# artifacts land in /tmp/bq13/.
set -x
cd /root/repo
mkdir -p /tmp/bq13
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h14_promo_effect h18_large_volume h21_waiting_supplier"
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
L30=/tmp/graft_sf30_bucketed2
L100=/tmp/graft_sf100_bucketed2

# unconditional between sequential steps: the r13 incident repeated r12's
# (a killed JVM leaked 105 GB into /dev/shm, the tmpfs pressure OOM-killed
# the sf100 layout build and inflated the whole first sf100 pair) — the
# old "skip if a bench java is running" guard skipped exactly when it
# mattered. This queue is sequential; nothing graft-owned runs between
# steps.
clean_tmpfs() { rm -rf /dev/shm/graft-shuffle/* 2>/dev/null; }

# reclaim space for the second sf100 layout (r12 probe layout: conclusions
# recorded in SCALE.md, rebuildable in one command)
rm -rf /tmp/graft_sf30_pkbucketed
date > /tmp/bq13/START

# 1. sf100 extended-sort layout (~15 min)
if [ ! -f $L100/lineitem_b/_graft_bucketspec ]; then
  tools/run.sh graft.tools.Bucketize $SF100 $L100 32 \
    orders:o_orderkey lineitem:l_orderkey:l_orderkey,l_suppkey \
    2>/dev/null | tail -2 > /tmp/bq13/bucketize_sf100.log
fi
clean_tmpfs
date > /tmp/bq13/DONE_LAYOUT

# oracle SQL dump for duck_bench
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/bq13/osql q51_values \
  > /dev/null 2>&1

# 2. quiet gate: wait up to 90 min for loadavg < 6
for i in $(seq 1 90); do
  L=$(cut -d. -f1 /proc/loadavg)
  [ "$L" -lt 6 ] && break
  sleep 60
done
cut -d' ' -f1-3 /proc/loadavg > /tmp/bq13/LOAD_AT_START

# 3. sf30 pair: full posture → flat → duckdb
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.BenchSubset $SF30 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq13/BENCH_sf30_r13_spark_full.json
clean_tmpfs
unset SPARK_GRAFT_CONF
tools/run.sh graft.tools.BenchSubset $SF30 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq13/BENCH_sf30_r13_spark_flat.json
clean_tmpfs
python3 tools/duck_bench.py $SF30 /tmp/bq13/osql/oracle_sql.json $HEAD \
  > /tmp/bq13/BENCH_sf30_r13_duckdb.json 2>/dev/null
date > /tmp/bq13/DONE_SF30

# 4. sf100 pair (same order)
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L100,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.BenchSubset $SF100 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq13/BENCH_sf100_r13_spark_full.json
clean_tmpfs
unset SPARK_GRAFT_CONF
tools/run.sh graft.tools.BenchSubset $SF100 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq13/BENCH_sf100_r13_spark_flat.json
clean_tmpfs
python3 tools/duck_bench.py $SF100 /tmp/bq13/osql/oracle_sql.json $HEAD \
  > /tmp/bq13/BENCH_sf100_r13_duckdb.json 2>/dev/null
date > /tmp/bq13/ALL_DONE
