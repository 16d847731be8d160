#!/bin/bash
# Round-14 final gate queue: flat sweep + rules-OFF differential (now
# including the hybrid run-hash aggregate, the layout join reorder and the
# layout pick) + extended-sort, custkey AND the new DUAL-layout postures on
# the final build. Logs to /tmp/gate14/.
set -x
cd /root/repo
mkdir -p /tmp/gate14
date > /tmp/gate14/START

# 1. flat sweep
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate14/v_flat > /tmp/gate14/verify_flat.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate14/v_flat > /tmp/gate14/check_flat.txt 2>&1
date > /tmp/gate14/FLAT_DONE

# 2. rules-OFF differential (every graft rewrite off, incl. round 14's)
SPARK_GRAFT_CONF="spark.graft.eagerAgg=false,spark.graft.dynamicFilter.enabled=false,spark.graft.scaledLongSum=false,spark.graft.cascadeGroupingSets=false,spark.graft.fuseScalarAggs=false,spark.graft.fuseUnionScans=false,spark.graft.dynamicFrameJoin=false,spark.graft.singleStageAgg=false,spark.graft.sortSharedAgg=false,spark.graft.streamingSortedAgg=false,spark.graft.streamingSortedAgg.hybrid=false,spark.graft.joinReorder=false,spark.graft.layoutPick=false" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate14/v_off > /tmp/gate14/verify_off.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate14/v_off > /tmp/gate14/check_off.txt 2>&1
date > /tmp/gate14/OFF_DONE

# 3. extended-sort layout posture (the canonical deployment arm; the
# reorder rule + hybrid aggregate are LIVE here)
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_bucketed2,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate14/v_ext > /tmp/gate14/verify_ext.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate14/v_ext > /tmp/gate14/check_ext.txt 2>&1
date > /tmp/gate14/EXT_DONE

# 4. custkey layout posture
rm -rf /tmp/graft_sf001_ck
tools/run.sh graft.tools.Bucketize /root/testdata/sf0.01 /tmp/graft_sf001_ck 8 customer:c_custkey orders:o_custkey lineitem:l_orderkey > /dev/null 2>&1
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_ck,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate14/v_ck > /tmp/gate14/verify_ck.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate14/v_ck > /tmp/gate14/check_ck.txt 2>&1
date > /tmp/gate14/CK_DONE

# 5. DUAL-layout posture (new this round): PickTableLayout live on every
# entry — orders/customer can swap to the custkey siblings per query
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_bucketed2;/tmp/graft_sf001_ck,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate14/v_dual > /tmp/gate14/verify_dual.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate14/v_dual > /tmp/gate14/check_dual.txt 2>&1
date > /tmp/gate14/ALL_DONE
