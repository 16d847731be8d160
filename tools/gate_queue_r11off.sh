#!/bin/bash
# Rules-OFF differential (round 11): every graft optimizer + stage-prep
# rule disabled — proves the dialect layer alone is oracle-exact on the
# shipped build (new this round: sortSharedAgg both shapes).
set -x
cd /root/repo
mkdir -p /tmp/gatef11
SPARK_GRAFT_CONF="spark.graft.eagerAgg=false,spark.graft.dynamicFilter.enabled=false,spark.graft.scaledLongSum=false,spark.graft.cascadeGroupingSets=false,spark.graft.fuseScalarAggs=false,spark.graft.fuseUnionScans=false,spark.graft.dynamicFrameJoin=false,spark.graft.singleStageAgg=false,spark.graft.sortSharedAgg=false" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gatef11/v_off \
  > /tmp/gatef11/verify_off.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gatef11/v_off \
  > /tmp/gatef11/check_off.txt 2>&1
date > /tmp/gatef11/OFF_DONE
