#!/bin/bash
# Round-15 final measurement queue (quiet-gated, final build):
#   1. h05 filtered-dim-tier A/B re-run (the r15b run sat under the test
#      suite's load — decide the default from a quiet reading)
#   2. sf30 + sf100 query-interleaved pairs in the TRIPLE-layout posture
#      (orderkey extended-sort + custkey + partkey lineitem): q22 serves
#      c⋈o from custkey via PickTableLayout, h02 serves lineitem from
#      partkey via the aggregate pick — the mixed-workload serving layer.
#   3. final quiet sf0.1 builder Bench, twice (page-cache-warm second run).
# Artifacts land in /tmp/bq15c/.
set -x
cd /root/repo
mkdir -p /tmp/bq15c
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h10_returned_items_orig h14_promo_effect h18_large_volume h21_waiting_supplier"
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
TRIPLE30="/tmp/graft_sf30_bucketed2;/tmp/graft_sf30_ckbucketed;/tmp/graft_sf30_pk"
TRIPLE100="/tmp/graft_sf100_bucketed2;/tmp/graft_sf100_ck;/tmp/graft_sf100_pk"
OSQL=/tmp/bq14/osql/oracle_sql.json
clean_tmpfs() { rm -rf /dev/shm/graft-shuffle/* 2>/dev/null; }
clean_tmpfs

# quiet gate: wait up to 30 min for 1-min load < 3
for i in $(seq 1 30); do
  L=$(cut -d. -f1 /proc/loadavg)
  [ "$L" -lt 3 ] && break
  sleep 60
done
cut -d' ' -f1-3 /proc/loadavg > /tmp/bq15c/LOAD_AT_START
date > /tmp/bq15c/START

# ── 1: h05 dim-tier quiet A/B ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf30_bucketed2,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF30 h05_local_supplier \
  spark.graft.joinReorder.filteredDimTier 5 2>/dev/null | tail -1 \
  > /tmp/bq15c/AB_sf30_h05_dimtier_quiet.json
clean_tmpfs

# ── 2: sf30 pair, triple posture ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$TRIPLE30,spark.graft.bucketedSortedScan=true"
python3 tools/pair_bench.py $SF30 $OSQL 3 $HEAD \
  > /tmp/bq15c/PAIR_sf30_r15c_triple.json
clean_tmpfs
date > /tmp/bq15c/DONE_SF30

# ── 3: sf100 pair, triple posture ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$TRIPLE100,spark.graft.bucketedSortedScan=true"
python3 tools/pair_bench.py $SF100 $OSQL 3 $HEAD \
  > /tmp/bq15c/PAIR_sf100_r15c_triple.json
clean_tmpfs
date > /tmp/bq15c/DONE_SF100
unset SPARK_GRAFT_CONF

# ── 4: final quiet sf0.1 builder Bench, twice ──
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench 2>/dev/null \
  | tail -1 > /tmp/bq15c/BENCH_sf01_r15_final_run1.json
clean_tmpfs
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench 2>/dev/null \
  | tail -1 > /tmp/bq15c/BENCH_sf01_r15_final_run2.json
clean_tmpfs

cut -d' ' -f1-3 /proc/loadavg > /tmp/bq15c/LOAD_AT_END
date > /tmp/bq15c/ALL_DONE
