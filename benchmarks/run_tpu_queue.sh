#!/bin/bash
# Deferred TPU measurements, in priority order. Run when the relay returns:
#   bash benchmarks/run_tpu_queue.sh [outdir]
# Each step is independently timeboxed; results land in $OUT/<step>.txt.
# Priority rationale (round 3): the driver-verified bench is the round's
# headline; the fold A/B and gather canary decide the M-step <=10ms path;
# the PMBC stage split is round-2 follow-up.
set -u
OUT=${1:-/tmp/tpu_queue_$(date +%H%M%S)}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
  python -c "
from demuxalot_tpu.utils.platform import _probe_relay
import sys; sys.exit(0 if _probe_relay() else 1)"
}

if ! probe; then
  echo "relay down; nothing to do" | tee "$OUT/status.txt"
  exit 1
fi

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ==="
  timeout "$tmo" "$@" >"$OUT/$name.txt" 2>&1
  echo "exit $? (see $OUT/$name.txt)"
  probe || { echo "relay died during $name"; exit 1; }
}

# 1. the headline: driver-style bench (fold ON = current default)
run bench_fold_on 1200 env DEMUX_TPU_WAIT_S=60 python bench.py
# 2. M-step fold A/B at the bench shape
run bench_fold_off 1200 env DEMUX_TPU_WAIT_S=60 DEMUX_MSTEP_FOLD=0 python bench.py
# 3. gather-forms capability probe (round-3 verdict: only same-shape
#    128-lane take_along_axis lowers — rerun only after a toolchain bump)
run gather_forms 900 python benchmarks/exp_gather_forms.py
# 4. in-kernel softmax A/B (EM-chain glue reduction)
run fused_softmax 900 python benchmarks/exp_fused_softmax.py
# 4b. stacked scatter dot A/B (now DEFAULT-ON; =0 re-measures summed passes)
run bench_stack_scatter_off 1200 env DEMUX_TPU_WAIT_S=60 DEMUX_STACK_SCATTER=0 python bench.py
# 4b+. staged in-kernel DMA A/B (measured negative round 3; re-check if the
# per-chunk compute ever shrinks below the DMA issue cost)
run bench_staged_dma 1200 env DEMUX_TPU_WAIT_S=60 DEMUX_STAGE_COLS=8192 python bench.py
# 4b'. log product-fold A/B (width 1 = pre-fold log-then-add; default is 8)
run bench_log_unfolded 1200 env DEMUX_TPU_WAIT_S=60 DEMUX_LOG_FOLD_WIDTH=1 python bench.py
# 4c. if the canary lowered: full in-kernel-gather E/M-step A/Bs at bench shape.
# A failing canary means Mosaic can't lower jnp.take — running the full A/Bs
# anyway would burn the relay window on failing remote compiles (and can wedge
# the shared Mosaic compiler, CLAUDE.md), so gate on the canary's verdict.
if grep -q "take axis0 same-shape: ok" "$OUT/gather_forms.txt" 2>/dev/null; then
  # gated on row-gather actually lowering (round-3 probe: it does NOT)
  run ig_estep 1200 python benchmarks/exp_inkernel_gather_estep.py
  run ig_mstep 1200 python benchmarks/exp_inkernel_gather_mstep.py
else
  echo "row-gather does not lower (expected); skipping ig_estep/ig_mstep" | tee "$OUT/ig_skipped.txt"
fi
# 5. round-2 pending: production per-stage vs fused at PMBC scale
run em_decompose 1800 python benchmarks/exp_em_decompose.py
# 5. round-2 pending: gather-operand interaction phase 3
run gather_operand 1200 env PHASE=3 python benchmarks/exp_gather_operand.py

echo "queue complete: $OUT"
