#!/bin/bash
# Round-3 TPU queue #2: measurements unlocked by the first commit batch.
# Serialized TPU access; loud failures (see r3_queue.sh).
set -x
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/logs/r3_queue2.log
FAILS=()

run() {
  local t=$1; shift
  if ! timeout "$t" "$@" >>"$LOG" 2>&1; then
    FAILS+=("$*")
    echo "QUEUE-STEP-FAILED: $*" | tee -a "$LOG" >&2
  fi
}

: >"$LOG"

# 1. transposed d<=64 quantized kernel A/B (VERDICT r2 item 4)
run 1800 python scripts/r3_exp1.py A
run 1200 python scripts/r3_exp1.py B
run 600 python scripts/r3_exp1.py C

# 2. prefix-cache wall-clock, unblocked by the shared-page-table SMEM fix
run 2400 python scripts/r2_exp6.py A
# sampling-cost rows again (greedy row looked compile-polluted: 17.8 tok/s
# vs temp 67.3 on identical work)
run 1800 python scripts/r2_exp6.py C

# 3. decode_steps A/B at the FULL-SIZE config (dim 2048, 16 layers, int8
# weights) — restores the canonical decode row and lands VERDICT item 5
run 2400 python -m tpu_flash.bench.sweep decode --weight-dtype int8
run 2400 python -m tpu_flash.bench.sweep decode --weight-dtype int8 --decode-steps 8
run 2400 python -m tpu_flash.bench.sweep decode --weight-dtype int8 --decode-steps 32

if ((${#FAILS[@]})); then
  printf 'QUEUE2 FINISHED WITH %d FAILED STEP(S):\n' "${#FAILS[@]}" | tee -a "$LOG" >&2
  printf '  %s\n' "${FAILS[@]}" | tee -a "$LOG" >&2
  exit 1
fi
echo "QUEUE2 FINISHED CLEAN" | tee -a "$LOG"
