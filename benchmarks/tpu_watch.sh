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
  # Load ONLY utils/platform.py by file path (no package __init__, no jax):
  # a detached daemon must not mistake an import failure for "relay down".
  # Falls back to a pure-stdlib probe of the known ports if even that fails.
  python - <<'EOF'
import socket, sys

ports = (8082, 8092, 8102, 8112)  # fallback = RELAY_PORTS at time of writing
try:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_platform", "demuxalot_tpu/utils/platform.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    ports = mod.RELAY_PORTS
except Exception:
    pass
for port in ports:
    s = socket.socket(); s.settimeout(2)
    try:
        s.connect(("127.0.0.1", port)); sys.exit(0)
    except OSError:
        pass
    finally:
        s.close()
sys.exit(1)
EOF
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
