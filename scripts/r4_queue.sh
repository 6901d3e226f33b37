#!/bin/bash
# Round-4 canonical log refresh: the shipped defaults changed (square
# dense tiles + packing, constant bound-max for dense/band bf16, d<=64
# band routing), so attention.jsonl / backward.jsonl / ndim.jsonl must
# be re-measured to match (README numbers == logs discipline). Streams
# rows incrementally; loud-fail; leaves the chip free at the end.
set -x
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/logs/r4_queue.log
FAILS=()

run() {
  local t=$1; shift
  if ! timeout "$t" "$@" >>"$LOG" 2>&1; then
    FAILS+=("$*")
    echo "QUEUE-STEP-FAILED: $*" | tee -a "$LOG" >&2
  fi
}

: >"$LOG"

# 1. backward sweep (shorter — must complete)
run 9000 python -m tpu_flash.bench.sweep backward

# 2. attention sweep (longest; partial log still useful on timeout)
run 16000 python -m tpu_flash.bench.sweep attention

# 3. ndim sweep (windowed/block 2D/3D parity rows)
run 5400 python -m tpu_flash.bench.sweep ndim

# 4. headline bench record
run 1200 python bench.py

if ((${#FAILS[@]})); then
  printf 'R4 QUEUE FINISHED WITH %d FAILED STEP(S):\n' "${#FAILS[@]}" | tee -a "$LOG" >&2
  printf '  %s\n' "${FAILS[@]}" | tee -a "$LOG" >&2
  exit 1
fi
echo "R4 QUEUE FINISHED CLEAN" | tee -a "$LOG"
