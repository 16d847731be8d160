#!/bin/bash
# Round-14 measurement queue (quiet-window, sequential, tmpfs-cleaned):
#   A. conf-flip interleaved A/Bs for the round's three structural changes
#      1. LayoutJoinReorder on the ORIGINAL customer-first Q10 spelling
#         (full posture — the planner-native h10 fix, verdict ask #1)
#      2. RunHashAggregate (strict-prefix hybrid) on h21/h18 over the
#         PLAIN orderkey-sorted layout (verdict ask #4)
#      3. dual-layout serving: q22 under bucketedDir=orderkey,custkey vs
#         orderkey-only, plus h18/h21 guards (verdict ask #3)
#   B. committed pair r14a at sf30 and sf100: full posture lead arm
#      (bucketed2 extended-sort + sortedScan + all rules default), flat
#      arm, DuckDB back-to-back (verdict ask #2 — h10 now via the rule).
# Artifacts land in /tmp/bq14/.
set -x
cd /root/repo
mkdir -p /tmp/bq14
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h10_returned_items_orig h14_promo_effect h18_large_volume h21_waiting_supplier"
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
L30=/tmp/graft_sf30_bucketed2       # extended-sort orderkey layout
L30P=/tmp/graft_sf30_bucketed       # plain orderkey layout
L30CK=/tmp/graft_sf30_ckbucketed    # custkey layout (orders, customer)
L100=/tmp/graft_sf100_bucketed2

clean_tmpfs() { rm -rf /dev/shm/graft-shuffle/* 2>/dev/null; }
clean_tmpfs
date > /tmp/bq14/START

# oracle SQL dump for duck_bench (includes h10_returned_items_orig)
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/bq14/osql q51_values \
  > /dev/null 2>&1

# quiet gate: wait up to 60 min for loadavg < 6
for i in $(seq 1 60); do
  L=$(cut -d. -f1 /proc/loadavg)
  [ "$L" -lt 6 ] && break
  sleep 60
done
cut -d' ' -f1-3 /proc/loadavg > /tmp/bq14/LOAD_AT_START

# ── A1: join reorder on the customer-first Q10, full posture ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF30 h10_returned_items_orig \
  spark.graft.joinReorder 4 2>/dev/null | tail -1 \
  > /tmp/bq14/AB_sf30_h10orig_joinReorder.json
clean_tmpfs
# flat posture too (the rule is inert without layouts — expect a wash)
unset SPARK_GRAFT_CONF
tools/run.sh graft.tools.ABInterleave $SF30 h10_returned_items_orig \
  spark.graft.joinReorder 3 2>/dev/null | tail -1 \
  > /tmp/bq14/AB_sf30_h10orig_joinReorder_flat.json
clean_tmpfs

# ── A2: hybrid streaming aggregate over the PLAIN layout ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30P,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF30 h21_waiting_supplier \
  spark.graft.streamingSortedAgg.hybrid 4 2>/dev/null | tail -1 \
  > /tmp/bq14/AB_sf30_h21_hybrid_plainlayout.json
clean_tmpfs
tools/run.sh graft.tools.ABInterleave $SF30 h18_large_volume \
  spark.graft.streamingSortedAgg.hybrid 4 2>/dev/null | tail -1 \
  > /tmp/bq14/AB_sf30_h18_hybrid_plainlayout.json
clean_tmpfs
unset SPARK_GRAFT_CONF

# ── A3: dual-layout serving (q22 win, h18/h21 guards) ──
export SPARK_GRAFT_CONF="spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF30 q22_tpch_q3 \
  spark.graft.bucketedDir 4 "$L30,$L30CK" "$L30" 2>/dev/null | tail -1 \
  > /tmp/bq14/AB_sf30_q22_duallayout.json
clean_tmpfs
tools/run.sh graft.tools.ABInterleave $SF30 h18_large_volume \
  spark.graft.bucketedDir 3 "$L30,$L30CK" "$L30" 2>/dev/null | tail -1 \
  > /tmp/bq14/AB_sf30_h18_duallayout.json
clean_tmpfs
tools/run.sh graft.tools.ABInterleave $SF30 h21_waiting_supplier \
  spark.graft.bucketedDir 3 "$L30,$L30CK" "$L30" 2>/dev/null | tail -1 \
  > /tmp/bq14/AB_sf30_h21_duallayout.json
clean_tmpfs
unset SPARK_GRAFT_CONF
date > /tmp/bq14/DONE_AB

# ── B: committed pair r14a — sf30 ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.BenchSubset $SF30 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq14/BENCH_sf30_r14a_spark_full.json
clean_tmpfs
unset SPARK_GRAFT_CONF
tools/run.sh graft.tools.BenchSubset $SF30 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq14/BENCH_sf30_r14a_spark_flat.json
clean_tmpfs
python3 tools/duck_bench.py $SF30 /tmp/bq14/osql/oracle_sql.json $HEAD \
  > /tmp/bq14/BENCH_sf30_r14a_duckdb.json 2>/dev/null
date > /tmp/bq14/DONE_SF30

# ── B: committed pair r14a — sf100 ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L100,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.BenchSubset $SF100 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq14/BENCH_sf100_r14a_spark_full.json
clean_tmpfs
unset SPARK_GRAFT_CONF
tools/run.sh graft.tools.BenchSubset $SF100 $HEAD 2>/dev/null | tail -1 \
  > /tmp/bq14/BENCH_sf100_r14a_spark_flat.json
clean_tmpfs
python3 tools/duck_bench.py $SF100 /tmp/bq14/osql/oracle_sql.json $HEAD \
  > /tmp/bq14/BENCH_sf100_r14a_duckdb.json 2>/dev/null
date > /tmp/bq14/ALL_DONE
