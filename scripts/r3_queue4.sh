#!/bin/bash
# Round-3 TPU queue #4: band pipeline A/B (tile-pool DMA rewrite — the
# first version's dynamic-ds DMA crashed the Mosaic compile), big-tile
# serving sweep (fp8 upcast amortization), quiet-host exp6 A rerun, and
# the final headline. NOTE: keep the host QUIET during this queue — no
# concurrent pytest (engine wall-clock rows were contaminated twice).
set -x
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/logs/r3_queue4.log
FAILS=()

run() {
  local t=$1; shift
  if ! timeout "$t" "$@" >>"$LOG" 2>&1; then
    FAILS+=("$*")
    echo "QUEUE-STEP-FAILED: $*" | tee -a "$LOG" >&2
  fi
}

: >"$LOG"

# 1. band pipeline A/B, rewritten kernel
run 2400 python scripts/r3_exp2.py B
run 1800 python scripts/r3_exp2.py C

# 2. backward packing defaults re-check (auto retile + 4MB cap landed)
run 2400 python scripts/r3_exp2.py D

# 3. big-tile serving sweep + device sampling costs
run 2400 python scripts/r3_exp3.py

# 4. prefix-cache wall-clock, QUIET HOST this time
run 2400 python scripts/r2_exp6.py A

# 5. final headline sanity
run 1200 python bench.py --dtype bf16
run 1200 python bench.py

if ((${#FAILS[@]})); then
  printf 'QUEUE4 FINISHED WITH %d FAILED STEP(S):\n' "${#FAILS[@]}" | tee -a "$LOG" >&2
  printf '  %s\n' "${FAILS[@]}" | tee -a "$LOG" >&2
  exit 1
fi
echo "QUEUE4 FINISHED CLEAN" | tee -a "$LOG"
