#!/bin/bash
# Round-15 final gate queue: flat sweep + rules-OFF differential (now
# including the filtered-dim reorder tier and the hybrid Complete-mode
# layout guard via their parent rules) + extended-sort, custkey, and the
# TRIPLE-layout posture (orderkey extended-sort + custkey + NEW partkey
# lineitem — PickTableLayout's join AND aggregate picks both live).
# Logs to /tmp/gate15/.
set -x
cd /root/repo
mkdir -p /tmp/gate15
date > /tmp/gate15/START

# 1. flat sweep
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate15/v_flat > /tmp/gate15/verify_flat.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate15/v_flat > /tmp/gate15/check_flat.txt 2>&1
date > /tmp/gate15/FLAT_DONE

# 2. rules-OFF differential (every graft rewrite off, incl. round 15's
# tier/guard parents)
SPARK_GRAFT_CONF="spark.graft.eagerAgg=false,spark.graft.dynamicFilter.enabled=false,spark.graft.scaledLongSum=false,spark.graft.cascadeGroupingSets=false,spark.graft.fuseScalarAggs=false,spark.graft.fuseUnionScans=false,spark.graft.dynamicFrameJoin=false,spark.graft.singleStageAgg=false,spark.graft.sortSharedAgg=false,spark.graft.streamingSortedAgg=false,spark.graft.streamingSortedAgg.hybrid=false,spark.graft.joinReorder=false,spark.graft.layoutPick=false" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate15/v_off > /tmp/gate15/verify_off.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate15/v_off > /tmp/gate15/check_off.txt 2>&1
date > /tmp/gate15/OFF_DONE

# 3. extended-sort layout posture
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_bucketed2,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate15/v_ext > /tmp/gate15/verify_ext.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate15/v_ext > /tmp/gate15/check_ext.txt 2>&1
date > /tmp/gate15/EXT_DONE

# 4. custkey layout posture
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_ck,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate15/v_ck > /tmp/gate15/verify_ck.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate15/v_ck > /tmp/gate15/check_ck.txt 2>&1
date > /tmp/gate15/CK_DONE

# 5. TRIPLE-layout posture: orderkey extended-sort + custkey + partkey
# lineitem; PickTableLayout may swap orders/customer to custkey siblings
# per join AND lineitem to the partkey sibling per aggregation
rm -rf /tmp/graft_sf001_pk
tools/run.sh graft.tools.Bucketize /root/testdata/sf0.01 /tmp/graft_sf001_pk 8 lineitem:l_partkey:l_partkey,l_suppkey > /dev/null 2>&1
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_bucketed2;/tmp/graft_sf001_ck;/tmp/graft_sf001_pk,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate15/v_triple > /tmp/gate15/verify_triple.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate15/v_triple > /tmp/gate15/check_triple.txt 2>&1
date > /tmp/gate15/ALL_DONE
