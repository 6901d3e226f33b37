#!/bin/bash
# Round-3 TPU queue #3: floor decomposition, band-pipeline A/B, backward
# bh-packing A/B, prefix-cache rerun (herd fix), and the refreshed
# attention/backward sweeps with true error columns at every shape.
set -x
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/logs/r3_queue3.log
FAILS=()

run() {
  local t=$1; shift
  if ! timeout "$t" "$@" >>"$LOG" 2>&1; then
    FAILS+=("$*")
    echo "QUEUE-STEP-FAILED: $*" | tee -a "$LOG" >&2
  fi
}

: >"$LOG"

# 1. serving-kernel floor decomposition (VERDICT r2 item 2)
run 1800 python scripts/r3_exp2.py A

# 2. in-step pipelined band forward A/B (VERDICT r2 item 3)
run 2400 python scripts/r3_exp2.py B
run 1800 python scripts/r3_exp2.py C

# 3. backward bh-packing A/B (VERDICT r2 item 3 "backward bands >= 60")
run 2400 python scripts/r3_exp2.py D

# 4. prefix-cache wall-clock with the herd fix + sliver threshold
run 2400 python scripts/r2_exp6.py A

# 5. refreshed sweeps: every row now carries a true max_abs_err from the
#    blockwise oracle (VERDICT r2 item 6 — 48 rows were NaN)
run 5400 python -m tpu_flash.bench.sweep attention
run 5400 python -m tpu_flash.bench.sweep backward

if ((${#FAILS[@]})); then
  printf 'QUEUE3 FINISHED WITH %d FAILED STEP(S):\n' "${#FAILS[@]}" | tee -a "$LOG" >&2
  printf '  %s\n' "${FAILS[@]}" | tee -a "$LOG" >&2
  exit 1
fi
echo "QUEUE3 FINISHED CLEAN" | tee -a "$LOG"
