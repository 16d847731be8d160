#!/bin/bash
# Round-15 queue D: post-reboot rebuild + HEAD verification + quiet pairs.
#
# The box rebooted between queue C and this session: every /tmp dataset and
# layout is gone and the machine is quiet (1-min load ~2 at queue-write
# time). This queue (1) re-gates HEAD 527/527 in all five postures
# (gate_queue_r15.sh), (2) lands the final quiet sf0.1 Bench artifact on
# the HEAD build (verdict ask #2's "final build" half — queue A's artifact
# was on the r14 build), and (3) lands the round's headline pairs in the
# TRIPLE-layout posture the A/Bs measured best (q22 served from the custkey
# sibling, h02's derived-partsupp pre-agg from the partkey sibling):
# sf30 family first, then DELETED before the sf100 family is built — both
# families together (~89 GB) exceed the 80 GB free on /.
# Artifacts land in /tmp/bq15d/.
set -x
cd /root/repo
mkdir -p /tmp/bq15d
HEAD="q01_tpch_q1 q02_tpch_q6 q22_tpch_q3 h02_min_cost_supplier h05_local_supplier h09_product_profit h10_returned_items h10_returned_items_orig h14_promo_effect h18_large_volume h21_waiting_supplier"
BUILD_CONF="spark.shuffle.spill.compress=true,spark.shuffle.compress=true"
clean_tmpfs() { rm -rf /dev/shm/graft-shuffle/* 2>/dev/null; }
quiet_wait() { # wait up to 45 min for 1-min load < 4
  for i in $(seq 1 45); do
    L=$(cut -d. -f1 /proc/loadavg); [ "$L" -lt 4 ] && break; sleep 60
  done
}
clean_tmpfs
cut -d' ' -f1-3 /proc/loadavg > /tmp/bq15d/LOAD_AT_START
date > /tmp/bq15d/START

# ── A. sf0.01 layouts + five-posture 527-gate on HEAD ──
rm -rf /tmp/graft_sf001_bucketed2 /tmp/graft_sf001_ck
tools/run.sh graft.tools.Bucketize /root/testdata/sf0.01 \
  /tmp/graft_sf001_bucketed2 8 orders:o_orderkey \
  lineitem:l_orderkey:l_orderkey,l_suppkey > /tmp/bq15d/build_001b2.log 2>&1
tools/run.sh graft.tools.Bucketize /root/testdata/sf0.01 \
  /tmp/graft_sf001_ck 8 customer:c_custkey orders:o_custkey \
  lineitem:l_orderkey > /tmp/bq15d/build_001ck.log 2>&1
bash tools/gate_queue_r15.sh > /tmp/bq15d/gate.log 2>&1
date > /tmp/bq15d/DONE_GATE

# ── B. quiet sf0.1 Bench on the HEAD build ──
quiet_wait
clean_tmpfs
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 tools/run.sh graft.Bench 2>/dev/null \
  | tail -1 > /tmp/bq15d/BENCH_sf01_r15_quiet_head.json
clean_tmpfs
date > /tmp/bq15d/DONE_SF01

# oracle SQL dump for the duck arms
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/bq15d/osql q51_values \
  > /dev/null 2>&1

# ── C. sf30 family: build → triple-posture pair → delete ──
if [ ! -d /tmp/graft_sf30/lineitem.parquet ]; then
  tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf30 300 96 \
    > /tmp/bq15d/scaleup30.log 2>&1
fi
SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize /tmp/graft_sf30 \
  /tmp/graft_sf30_bucketed2 32 orders:o_orderkey \
  lineitem:l_orderkey:l_orderkey,l_suppkey > /tmp/bq15d/build_l30.log 2>&1
clean_tmpfs
SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize /tmp/graft_sf30 \
  /tmp/graft_sf30_ck 32 orders:o_custkey customer:c_custkey \
  > /tmp/bq15d/build_ck30.log 2>&1
clean_tmpfs
SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize /tmp/graft_sf30 \
  /tmp/graft_sf30_pk 32 lineitem:l_partkey:l_partkey,l_suppkey \
  > /tmp/bq15d/build_pk30.log 2>&1
clean_tmpfs
date > /tmp/bq15d/DONE_SF30_BUILD
quiet_wait
# quiet re-run of the h05 filtered-dim-tier A/B (queue C ran it at load
# 22-25; LayoutJoinReorder's doc comment must cite a quiet artifact)
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf30_bucketed2,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave /tmp/graft_sf30 h05_local_supplier \
  spark.graft.joinReorder.filteredDimTier 4 2>/dev/null | tail -1 \
  > /tmp/bq15d/AB_sf30_h05_dimtier_quiet.json
clean_tmpfs
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf30_bucketed2;/tmp/graft_sf30_ck;/tmp/graft_sf30_pk,spark.graft.bucketedSortedScan=true"
python3 tools/pair_bench.py /tmp/graft_sf30 /tmp/bq15d/osql/oracle_sql.json 3 \
  $HEAD > /tmp/bq15d/PAIR_sf30_r15d_triple.json
unset SPARK_GRAFT_CONF
clean_tmpfs
rm -rf /tmp/graft_sf30 /tmp/graft_sf30_bucketed2 /tmp/graft_sf30_ck /tmp/graft_sf30_pk
date > /tmp/bq15d/DONE_SF30

# ── D. sf100 family: build → triple-posture pair (kept for follow-ups) ──
if [ ! -d /tmp/graft_sf100/lineitem.parquet ]; then
  tools/run.sh graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf100 1000 96 \
    > /tmp/bq15d/scaleup100.log 2>&1
fi
SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize /tmp/graft_sf100 \
  /tmp/graft_sf100_bucketed2 32 orders:o_orderkey \
  lineitem:l_orderkey:l_orderkey,l_suppkey > /tmp/bq15d/build_l100.log 2>&1
clean_tmpfs
SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize /tmp/graft_sf100 \
  /tmp/graft_sf100_ck 32 orders:o_custkey customer:c_custkey \
  > /tmp/bq15d/build_ck100.log 2>&1
clean_tmpfs
SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize /tmp/graft_sf100 \
  /tmp/graft_sf100_pk 32 lineitem:l_partkey:l_partkey,l_suppkey \
  > /tmp/bq15d/build_pk100.log 2>&1
clean_tmpfs
date > /tmp/bq15d/DONE_SF100_BUILD
quiet_wait
# quiet re-runs of the two headline sf100 attribution A/Bs (queue B ran
# them at load 29-38)
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf100_bucketed2;/tmp/graft_sf100_ck,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave /tmp/graft_sf100 q22_tpch_q3 \
  spark.graft.layoutPick 4 2>/dev/null | tail -1 \
  > /tmp/bq15d/AB_sf100_q22_dualck_quiet.json
clean_tmpfs
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf100_bucketed2;/tmp/graft_sf100_pk,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave /tmp/graft_sf100 h02_min_cost_supplier \
  spark.graft.layoutPick 4 2>/dev/null | tail -1 \
  > /tmp/bq15d/AB_sf100_h02_pklayout_quiet.json
clean_tmpfs
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf100_bucketed2;/tmp/graft_sf100_ck;/tmp/graft_sf100_pk,spark.graft.bucketedSortedScan=true"
python3 tools/pair_bench.py /tmp/graft_sf100 /tmp/bq15d/osql/oracle_sql.json 3 \
  $HEAD > /tmp/bq15d/PAIR_sf100_r15d_triple.json
unset SPARK_GRAFT_CONF
clean_tmpfs

# ── E. plans/r15 before/after captures on the sf100 data ──
# "before" = the r14-best posture (single orderkey extended-sort layout);
# "after"  = the round-15 posture/conf that changes the plan.
mkdir -p plans/r15
L100C="spark.graft.bucketedDir=/tmp/graft_sf100_bucketed2,spark.graft.bucketedSortedScan=true"
SPARK_GRAFT_CONF="$L100C" tools/run.sh graft.tools.Explain q22_tpch_q3 \
  /tmp/graft_sf100 > plans/r15/q22_tpch_q3_before.txt 2>&1
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf100_bucketed2;/tmp/graft_sf100_ck,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.tools.Explain q22_tpch_q3 /tmp/graft_sf100 \
  > plans/r15/q22_tpch_q3_after.txt 2>&1
SPARK_GRAFT_CONF="$L100C" tools/run.sh graft.tools.Explain h02_min_cost_supplier \
  /tmp/graft_sf100 > plans/r15/h02_min_cost_supplier_before.txt 2>&1
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf100_bucketed2;/tmp/graft_sf100_pk,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.tools.Explain h02_min_cost_supplier /tmp/graft_sf100 \
  > plans/r15/h02_min_cost_supplier_after.txt 2>&1
SPARK_GRAFT_CONF="$L100C" tools/run.sh graft.tools.Explain h05_local_supplier \
  /tmp/graft_sf100 > plans/r15/h05_local_supplier_before.txt 2>&1
SPARK_GRAFT_CONF="$L100C,spark.graft.joinReorder.filteredDimTier=true" \
  tools/run.sh graft.tools.Explain h05_local_supplier /tmp/graft_sf100 \
  > plans/r15/h05_local_supplier_after.txt 2>&1
clean_tmpfs
date > /tmp/bq15d/DONE_PLANS

cut -d' ' -f1-3 /proc/loadavg > /tmp/bq15d/LOAD_AT_END
date > /tmp/bq15d/ALL_DONE
