#!/bin/bash
# Block until the 1-min load average is below $QUIET_MAX (default 4), then
# run the given command. Re-checks every 60 s; gives up after
# $QUIET_TIMEOUT_MIN minutes (default 240) and runs anyway with a warning.
# Usage: tools/quiet_run.sh <cmd...>
MAX=${QUIET_MAX:-4}
LIMIT=${QUIET_TIMEOUT_MIN:-240}
waited=0
while :; do
  load=$(cut -d' ' -f1 /proc/loadavg)
  ok=$(awk -v l="$load" -v m="$MAX" 'BEGIN{print (l<m)?1:0}')
  [ "$ok" = 1 ] && break
  if [ "$waited" -ge "$LIMIT" ]; then
    echo "quiet_run: TIMEOUT after ${waited}m (load=$load) — running loaded" >&2
    break
  fi
  sleep 60
  waited=$((waited+1))
done
echo "quiet_run: starting at load=$(cut -d' ' -f1 /proc/loadavg) after ${waited}m wait" >&2
exec "$@"
