#!/bin/bash
# Round-3 TPU queue #6 (post-sweeps): final headline with the big-tile
# serving defaults landed, and a d=64 serving confirmation.
set -x
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/logs/r3_queue6.log
FAILS=()

run() {
  local t=$1; shift
  if ! timeout "$t" "$@" >>"$LOG" 2>&1; then
    FAILS+=("$*")
    echo "QUEUE-STEP-FAILED: $*" | tee -a "$LOG" >&2
  fi
}

: >"$LOG"

run 1800 python bench.py
run 1800 python bench.py --dtype int8
run 1800 python bench.py --dtype bf16
run 900 python scripts/r3_exp1.py C

if ((${#FAILS[@]})); then
  printf 'QUEUE6 FINISHED WITH %d FAILED STEP(S):\n' "${#FAILS[@]}" | tee -a "$LOG" >&2
  printf '  %s\n' "${FAILS[@]}" | tee -a "$LOG" >&2
  exit 1
fi
echo "QUEUE6 FINISHED CLEAN" | tee -a "$LOG"
