#!/bin/bash
# Round-10 correctness gates, sequential: (1) full sf0.01 driver sweep at
# defaults, (2) full sweep with the generic eager push opted in at floor 0
# (variant-3 exactness proof), (3) full ScalaTest suite.
set -x
cd /root/repo
mkdir -p /tmp/gate10

tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate10/v_default \
  > /tmp/gate10/verify_default.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate10/v_default \
  > /tmp/gate10/check_default.txt 2>&1

SPARK_GRAFT_CONF="spark.graft.eagerAgg.generic=true,spark.graft.eagerAgg.genericMinBytes=0,spark.graft.fuseUnionScans=true" \
  tools/run.sh graft.Verify /root/testdata/sf0.01 /tmp/gate10/v_generic \
  > /tmp/gate10/verify_generic.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.01 /tmp/gate10/v_generic \
  > /tmp/gate10/check_generic.txt 2>&1

sbt test > /tmp/gate10/sbt_test.log 2>&1
tail -20 /tmp/gate10/sbt_test.log > /tmp/gate10/sbt_test_tail.txt

date > /tmp/gate10/GATES_DONE
