#!/bin/bash
# Rules-OFF differential: every graft optimizer rule disabled — proves the
# dialect layer alone is oracle-exact on the shipped build.
set -x
cd /root/repo
SPARK_GRAFT_CONF="spark.graft.eagerAgg=false,spark.graft.dynamicFilter.enabled=false,spark.graft.scaledLongSum=false,spark.graft.cascadeGroupingSets=false,spark.graft.fuseScalarAggs=false,spark.graft.fuseUnionScans=false,spark.graft.dynamicFrameJoin=false,spark.graft.singleStageAgg=false" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gatef/v_off \
  > /tmp/gatef/verify_off.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gatef/v_off \
  > /tmp/gatef/check_off.txt 2>&1
date > /tmp/gatef/OFF_DONE
