#!/bin/bash
# Probe-gated scaling campaign watcher: loop a cheap DRAM-window probe
# (tools/probe_window.py) and fire ONE full envelope+scaling rep in the
# first quiet window. Takes a lockfile while the rep runs so other
# local Spark work can yield. Usage: tools/watch_scaling.sh [hours]
cd "$(dirname "$0")" || exit 1
LOCK=/tmp/kg_scaling_running.lock
DEADLINE=$(( $(date +%s) + ${1:-3} * 3600 ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  python probe_window.py ${PROBE_THRESHOLD:-0.68}
  rc=$?
  if [ $rc -eq 0 ]; then
    touch "$LOCK"
    python bench_cpu_envelope.py && \
      python bench_scaling.py 4000000 1 8,32 1,4 --merge --measure 8,32
    rm -f "$LOCK"
    echo "watch_scaling: campaign done"
    exit 0
  fi
  # rc=2 means our own Spark owns the box; either way wait and retry
  sleep 150
done
echo "watch_scaling: no quiet window before deadline"
exit 1
