#!/bin/bash
# Round-12 tail queue: waits for bq12b, then (1) verifies the round's new
# oracle entries at sf0.1 (the per-round skill protocol), (2) builds a
# partkey-bucketed lineitem layout and A/Bs h02 against it — probing
# whether the declared h02 floor ("no layout helps the 21.6k dispersed
# keys") falls to GROUPED EXECUTION (the aggregate exchange, not the
# scan pruning, is the claim under test). Logs to /tmp/bq12c/.
set -x
cd /root/repo
mkdir -p /tmp/bq12c

for i in $(seq 1 300); do
  [ -f /tmp/bq12b/ALL_DONE ] && break
  sleep 60
done
date > /tmp/bq12c/START

# 1. new entries at sf0.1
tools/run.sh graft.Verify /root/testdata/sf0.1 /tmp/bq12c/v01 \
  p15_ipaddress w04_warc_read d16_semdedup 2>/dev/null | tail -4
python3 tools/driver_check.py /root/testdata/sf0.1 /tmp/bq12c/v01 \
  p15_ipaddress w04_warc_read d16_semdedup > /tmp/bq12c/check_sf01.txt 2>&1
date > /tmp/bq12c/DONE1

# 2. partkey layout for the h02 shape (lineitem only; orders stays flat)
tools/run.sh graft.tools.Bucketize /tmp/graft_sf30 \
  /tmp/graft_sf30_pkbucketed 32 lineitem:l_partkey 2>/dev/null | tail -1
for arm in flat pk flat pk flat pk; do
  if [ "$arm" = pk ]; then export SPARK_GRAFT_CONF="spark.graft.bucketedDir=/tmp/graft_sf30_pkbucketed"; else unset SPARK_GRAFT_CONF; fi
  echo "=== $arm load:$(cut -d' ' -f1-3 /proc/loadavg) $(date +%H:%M:%S)" >> /tmp/bq12c/AB_h02_pklayout.log
  tools/run.sh graft.tools.BenchSubset /tmp/graft_sf30 \
    h02_min_cost_supplier h09_product_profit 2>/dev/null | tail -1 \
    >> /tmp/bq12c/AB_h02_pklayout.log
done
date > /tmp/bq12c/ALL_DONE
