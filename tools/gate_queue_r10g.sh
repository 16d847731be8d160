#!/bin/bash
# sf0.1-scale full oracle sweep (the README "both scales" claim), after
# the bench chain drains.
set -x
cd /root/repo
while [ ! -f /tmp/bq10/DONE5 ]; do sleep 60; done
tools/run.sh graft.Verify /root/testdata/sf0.1 /tmp/gate10/v_sf01 \
  > /tmp/gate10/verify_sf01.log 2>&1
python3 tools/driver_check.py /root/testdata/sf0.1 /tmp/gate10/v_sf01 \
  > /tmp/gate10/check_sf01.txt 2>&1
date > /tmp/gate10/SF01_DONE
