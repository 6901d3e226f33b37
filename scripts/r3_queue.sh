#!/bin/bash
# Round-3 TPU measurement queue: lands the round-2 close-out measurements
# that crashed on sys.path (see VERDICT.md item 1 / logs/r2_queue_now.log).
#
# Rules learned the hard way:
#  - ALL TPU work is serialized through this one script — two JAX clients
#    corrupt each other's timings and can ResourceExhaust the chip.
#  - Every step runs with PYTHONPATH=/root/repo (the round-2 queue invoked
#    `python scripts/foo.py`, which puts scripts/ on sys.path, and 10/12
#    steps died on ModuleNotFoundError without anyone noticing).
#  - A failing step is LOUD: it is recorded in the FAIL list, echoed at the
#    end, and the script exits nonzero if anything failed. Steps still run
#    to completion (the tunnel can abort sporadically; later steps should
#    not be starved by an earlier flake).
set -x
cd /root/repo || exit 1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
LOG=/root/repo/logs/r3_queue.log
FAILS=()

run() { # run <timeout-secs> <cmd...>
  local t=$1; shift
  if ! timeout "$t" "$@" >>"$LOG" 2>&1; then
    FAILS+=("$*")
    echo "QUEUE-STEP-FAILED: $*" | tee -a "$LOG" >&2
  fi
}

: >"$LOG"

# 0. verify drive: kernels + MoE model + oracle gate on the real chip
run 590 python scripts/r2_verify_drive.py

# 1. sliding bh_block sweep (VERDICT r2 #3: band speedup target >=4x dense)
run 1800 python scripts/r2_exp5.py E

# 2. kv_split MXU/VPU-overlap A/B on the serving kernel (headline lever)
run 1500 python scripts/r2_exp5.py A
run 1200 python scripts/r2_exp5.py B
run 1800 python scripts/r2_exp5.py D
run 1200 python scripts/r2_exp5.py C

# 3. serving features wall-clock (prefix cache / speculation / sampling)
run 2400 python scripts/r2_exp6.py A
run 2400 python scripts/r2_exp6.py B
run 1800 python scripts/r2_exp6.py C

# 4. headline sanity
run 1200 python bench.py --dtype bf16
run 1200 python bench.py

if ((${#FAILS[@]})); then
  printf 'QUEUE FINISHED WITH %d FAILED STEP(S):\n' "${#FAILS[@]}" | tee -a "$LOG" >&2
  printf '  %s\n' "${FAILS[@]}" | tee -a "$LOG" >&2
  exit 1
fi
echo "QUEUE FINISHED CLEAN" | tee -a "$LOG"
