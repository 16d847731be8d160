#!/bin/bash
# Round-13 final gate queue: flat sweep + rules-OFF differential (now
# including streamingSortedAgg) + both layout postures (extended-sort AND
# custkey) on the final build. Logs to /tmp/gate13/.
set -x
cd /root/repo
mkdir -p /tmp/gate13
date > /tmp/gate13/START

# 1. flat sweep
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate13/v_flat > /tmp/gate13/verify_flat.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate13/v_flat > /tmp/gate13/check_flat.txt 2>&1
date > /tmp/gate13/FLAT_DONE

# 2. rules-OFF differential (every graft rewrite off, incl. round 13's)
SPARK_GRAFT_CONF="spark.graft.eagerAgg=false,spark.graft.dynamicFilter.enabled=false,spark.graft.scaledLongSum=false,spark.graft.cascadeGroupingSets=false,spark.graft.fuseScalarAggs=false,spark.graft.fuseUnionScans=false,spark.graft.dynamicFrameJoin=false,spark.graft.singleStageAgg=false,spark.graft.sortSharedAgg=false,spark.graft.streamingSortedAgg=false" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate13/v_off > /tmp/gate13/verify_off.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate13/v_off > /tmp/gate13/check_off.txt 2>&1
date > /tmp/gate13/OFF_DONE

# 3. extended-sort layout posture (the canonical deployment arm)
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_bucketed2,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate13/v_ext > /tmp/gate13/verify_ext.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate13/v_ext > /tmp/gate13/check_ext.txt 2>&1
date > /tmp/gate13/EXT_DONE

# 4. custkey layout posture (the q3-workload alternative)
rm -rf /tmp/graft_sf001_ck
tools/run.sh graft.tools.Bucketize /root/testdata/sf0.01 /tmp/graft_sf001_ck 8 customer:c_custkey orders:o_custkey lineitem:l_orderkey > /dev/null 2>&1
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_ck,spark.graft.bucketedSortedScan=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate13/v_ck > /tmp/gate13/verify_ck.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate13/v_ck > /tmp/gate13/check_ck.txt 2>&1
date > /tmp/gate13/ALL_DONE
