#!/bin/bash
# Round-15 measurement queue B — the verdict's three performance asks:
#   builds: sf100 custkey layout (orders+customer), sf30+sf100 PARTKEY
#           lineitem layouts (the h02 derived-partsupp lever, ask #3) —
#           compressed-shuffle conf per the r13 layout-build trap.
#   A/Bs (interleaved, conf-flip in one JVM):
#     1. q22 sf100 DUAL layout: PickTableLayout serving c⋈o from custkey
#        vs orderkey+hybrid only (ask #1 — only measured at sf30 before).
#     2. q22 sf100 partial-aggregation-below-the-join probe: the eager
#        generic tier (PushPartialAggregationThroughExchange analogue)
#        over the orderkey layout (ask #1's second probe).
#     3. h02 pk-layout pick at sf30 and sf100: PickTableLayout's NEW
#        aggregate-based pick swaps lineitem to the partkey layout for
#        the (l_partkey, l_suppkey) pre-aggregation (ask #3).
#     4. h05 sf30 filtered-dim tier: LayoutJoinReorder's NEW size tier
#        lets the region-filtered chain reorder (ask #6).
# Artifacts land in /tmp/bq15b/.
set -x
cd /root/repo
mkdir -p /tmp/bq15b
SF30=/tmp/graft_sf30
SF100=/tmp/graft_sf100
L30=/tmp/graft_sf30_bucketed2
L100=/tmp/graft_sf100_bucketed2
CK100=/tmp/graft_sf100_ck
PK30=/tmp/graft_sf30_pk
PK100=/tmp/graft_sf100_pk
BUILD_CONF="spark.shuffle.spill.compress=true,spark.shuffle.compress=true"
clean_tmpfs() { rm -rf /dev/shm/graft-shuffle/* 2>/dev/null; }
clean_tmpfs
cut -d' ' -f1-3 /proc/loadavg > /tmp/bq15b/LOAD_AT_START
date > /tmp/bq15b/START

# ── builds (skip any layout that already exists with a marker) ──
if [ ! -f $CK100/orders_b/_graft_bucketspec ]; then
  SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize \
    $SF100 $CK100 32 orders:o_custkey customer:c_custkey \
    > /tmp/bq15b/build_ck100.log 2>&1
  clean_tmpfs
fi
if [ ! -f $PK30/lineitem_b/_graft_bucketspec ]; then
  SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize \
    $SF30 $PK30 32 lineitem:l_partkey:l_partkey,l_suppkey \
    > /tmp/bq15b/build_pk30.log 2>&1
  clean_tmpfs
fi
if [ ! -f $PK100/lineitem_b/_graft_bucketspec ]; then
  SPARK_GRAFT_CONF=$BUILD_CONF tools/run.sh graft.tools.Bucketize \
    $SF100 $PK100 32 lineitem:l_partkey:l_partkey,l_suppkey \
    > /tmp/bq15b/build_pk100.log 2>&1
  clean_tmpfs
fi
date > /tmp/bq15b/DONE_BUILDS

# ── A/B 1: q22 sf100 dual-layout pick ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L100;$CK100,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF100 q22_tpch_q3 \
  spark.graft.layoutPick 4 2>/dev/null | tail -1 \
  > /tmp/bq15b/AB_sf100_q22_dualck.json
clean_tmpfs

# ── A/B 2: q22 sf100 eager-generic partial-agg probe ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L100,spark.graft.bucketedSortedScan=true,spark.graft.eagerAgg.genericMinBytes=0,spark.graft.eagerAgg.genericMinSavedFrac=0"
tools/run.sh graft.tools.ABInterleave $SF100 q22_tpch_q3 \
  spark.graft.eagerAgg.generic 4 2>/dev/null | tail -1 \
  > /tmp/bq15b/AB_sf100_q22_eagergeneric.json
clean_tmpfs

# ── A/B 3: h02 pk-layout pick, sf30 then sf100 ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30;$PK30,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF30 h02_min_cost_supplier \
  spark.graft.layoutPick 4 2>/dev/null | tail -1 \
  > /tmp/bq15b/AB_sf30_h02_pklayout.json
clean_tmpfs
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L100;$PK100,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF100 h02_min_cost_supplier \
  spark.graft.layoutPick 4 2>/dev/null | tail -1 \
  > /tmp/bq15b/AB_sf100_h02_pklayout.json
clean_tmpfs

# ── A/B 4: h05 sf30 filtered-dim reorder tier ──
export SPARK_GRAFT_CONF="spark.graft.bucketedDir=$L30,spark.graft.bucketedSortedScan=true"
tools/run.sh graft.tools.ABInterleave $SF30 h05_local_supplier \
  spark.graft.joinReorder.filteredDimTier 4 2>/dev/null | tail -1 \
  > /tmp/bq15b/AB_sf30_h05_dimtier.json
clean_tmpfs
unset SPARK_GRAFT_CONF

cut -d' ' -f1-3 /proc/loadavg > /tmp/bq15b/LOAD_AT_END
date > /tmp/bq15b/ALL_DONE
