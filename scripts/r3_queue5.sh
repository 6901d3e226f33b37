#!/bin/bash
# Round-3 TPU queue #5 (final): big-tile serving rerun (VMEM fix), then
# the refreshed sweeps with true error columns. Backward first (shorter,
# must complete); attention streams rows incrementally so even a timeout
# leaves a gated log. Leave the chip FREE well before round end (the
# driver runs bench.py itself).
set -x
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/logs/r3_queue5.log
FAILS=()

run() {
  local t=$1; shift
  if ! timeout "$t" "$@" >>"$LOG" 2>&1; then
    FAILS+=("$*")
    echo "QUEUE-STEP-FAILED: $*" | tee -a "$LOG" >&2
  fi
}

: >"$LOG"

# 0. prefix-cache wall-clock: steady-state (compile-warm) second run
run 2400 python scripts/r2_exp6.py A

# 1. big-tile serving sweep rerun (fp8 upcast amortization, VMEM fix)
run 2400 python scripts/r3_exp3.py

# 2. refreshed backward sweep (true grad-err columns at every row)
run 9000 python -m tpu_flash.bench.sweep backward

# 3. refreshed attention sweep (streams rows; timeout leaves partial log)
run 14400 python -m tpu_flash.bench.sweep attention

if ((${#FAILS[@]})); then
  printf 'QUEUE5 FINISHED WITH %d FAILED STEP(S):\n' "${#FAILS[@]}" | tee -a "$LOG" >&2
  printf '  %s\n' "${FAILS[@]}" | tee -a "$LOG" >&2
  exit 1
fi
echo "QUEUE5 FINISHED CLEAN" | tee -a "$LOG"
