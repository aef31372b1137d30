#!/bin/bash
# Relay watcher: poll the TPU relay port; the moment it answers, run the
# deferred measurement queue (benchmarks/run_tpu_queue.sh). Designed to be
# detached (setsid) and left running for the whole session.
#   bash benchmarks/tpu_watch.sh <outdir> [max_hours]
set -u
OUT=${1:?outdir}
MAX_H=${2:-11}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
DEADLINE=$(( $(date +%s) + MAX_H * 3600 ))
echo "watch started $(date -u +%FT%TZ) pid=$$" > "$OUT/watch.log"

probe() {
  # Reuse the package's relay probe so the accepted port set (RELAY_PORTS)
  # stays in one place — the relay has come back on 8092/8102 before.
  python -c "
from demuxalot_tpu.utils.platform import _probe_relay
import sys; sys.exit(0 if _probe_relay() else 1)"
}

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if probe; then
    echo "relay UP $(date -u +%FT%TZ); launching queue" >> "$OUT/watch.log"
    bash benchmarks/run_tpu_queue.sh "$OUT/queue" >> "$OUT/watch.log" 2>&1
    echo "queue finished $(date -u +%FT%TZ)" >> "$OUT/watch.log"
    touch "$OUT/QUEUE_DONE"
    exit 0
  fi
  sleep 30
done
echo "deadline reached, relay never returned $(date -u +%FT%TZ)" >> "$OUT/watch.log"
touch "$OUT/RELAY_NEVER_RETURNED"
