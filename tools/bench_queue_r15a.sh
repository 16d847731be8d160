#!/bin/bash
# Round-15 measurement queue A (quiet-window, sequential, tmpfs-cleaned):
#   1. quiet sf0.1 builder Bench artifact on the r14 FINAL floor build
#      (= HEAD at queue launch) — verdict ask #2 (r14 shipped no quiet
#      sf0.1 artifact at all; this also repairs the SCALE.md "recovered
#      to 11.0 s" line with a committed number).
#   2. sf100 committed pair via the NEW query-granularity interleaved
#      protocol (tools/pair_bench.py + graft.tools.BenchServer) — verdict
#      ask #4: alternate spark-q/duck-q so a co-tenant burst hits both
#      arms of the same query; medians over 3 recorded rounds.
#   3. same at sf30.
# Artifacts land in /tmp/bq15/.
set -x
cd /root/repo
mkdir -p /tmp/bq15
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h10_returned_items_orig h14_promo_effect h18_large_volume h21_waiting_supplier"
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
L30=/tmp/graft_sf30_bucketed2
L100=/tmp/graft_sf100_bucketed2
OSQL=/tmp/bq14/osql/oracle_sql.json
clean_tmpfs() { rm -rf /dev/shm/graft-shuffle/* 2>/dev/null; }
clean_tmpfs
cut -d' ' -f1-3 /proc/loadavg > /tmp/bq15/LOAD_AT_START
date > /tmp/bq15/START

# ── 1: quiet sf0.1 builder artifact on the r14 final build ──
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench 2>/dev/null \
  | tail -1 > /tmp/bq15/BENCH_sf01_r15_quiet_r14build.json
clean_tmpfs
date > /tmp/bq15/DONE_SF01

# ── 2: sf100 interleaved pair, full posture ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L100,spark.graft.bucketedSortedScan=true"
python3 tools/pair_bench.py $SF100 $OSQL 3 $HEAD \
  > /tmp/bq15/PAIR_sf100_r15a_full.json
clean_tmpfs
date > /tmp/bq15/DONE_SF100

# ── 3: sf30 interleaved pair, full posture ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30,spark.graft.bucketedSortedScan=true"
python3 tools/pair_bench.py $SF30 $OSQL 3 $HEAD \
  > /tmp/bq15/PAIR_sf30_r15a_full.json
clean_tmpfs
unset SPARK_GRAFT_CONF

cut -d' ' -f1-3 /proc/loadavg > /tmp/bq15/LOAD_AT_END
date > /tmp/bq15/ALL_DONE
