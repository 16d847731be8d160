#!/bin/bash
# Round-12 final gate: waits for the bench queue, then runs
# (1) full ScalaTest suite, (2) full flat sf0.01 driver sweep,
# (3) rules-OFF differential sweep, (4) bucketed-redirect sweep recheck.
set -x
cd /root/repo
mkdir -p /tmp/gate12

# wait for the bench queue (max ~3 h)
for i in $(seq 1 180); do
  [ -f /tmp/bq12/ALL_DONE ] && break
  sleep 60
done
date > /tmp/gate12/START

# 1. full test suite (new JVM; sbt batch mode)
sbt -batch test > /tmp/gate12/sbt_test.log 2>&1
grep -E "Tests: succeeded|TESTS FAILED|error" /tmp/gate12/sbt_test.log | tail -5 > /tmp/gate12/sbt_test_summary.txt
date > /tmp/gate12/TESTS_DONE

# 2. full flat driver sweep
tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate12/v_flat > /tmp/gate12/verify_flat.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate12/v_flat > /tmp/gate12/check_flat.txt 2>&1
date > /tmp/gate12/FLAT_DONE

# 3. rules-OFF differential (all graft optimizer + stage-prep rules off)
SPARK_GRAFT_CONF="spark.graft.eagerAgg=false,spark.graft.dynamicFilter.enabled=false,spark.graft.scaledLongSum=false,spark.graft.cascadeGroupingSets=false,spark.graft.fuseScalarAggs=false,spark.graft.fuseUnionScans=false,spark.graft.dynamicFrameJoin=false,spark.graft.singleStageAgg=false,spark.graft.sortSharedAgg=false" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate12/v_off > /tmp/gate12/verify_off.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate12/v_off > /tmp/gate12/check_off.txt 2>&1
date > /tmp/gate12/OFF_DONE

# 4. bucketed-redirect sweep recheck (post-p15-fix build)
SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf001_bucketed" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate12/v_bucketed > /tmp/gate12/verify_bucketed.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate12/v_bucketed > /tmp/gate12/check_bucketed.txt 2>&1
date > /tmp/gate12/ALL_DONE
