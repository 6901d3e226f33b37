#!/bin/bash
# Round-2 final hardware refresh: run once the TPU tunnel is back.
# Chains the queued A/Bs (r2_exp5), the full log refresh for every suite,
# figure regeneration, and the headline bench. Each stage is under timeout
# and failures don't kill the chain (partial refresh beats none).
set -x
cd /root/repo
R=logs/r2_refresh_status.txt
: > "$R"

stage() {
  name=$1; shift
  if timeout "$@"; then echo "$name OK" >> "$R"; else echo "$name FAIL rc=$?" >> "$R"; fi
}

stage exp5 1800 python scripts/r2_exp5.py all
stage attn 3600 python -m tpu_flash.bench.sweep attention
stage bwd  3600 python -m tpu_flash.bench.sweep backward
stage sm   1800 python -m tpu_flash.bench.sweep softmax
stage nd   1800 python -m tpu_flash.bench.sweep ndim
stage dec  1800 python -m tpu_flash.bench.sweep decode --pipelined
stage dec8 1800 python -m tpu_flash.bench.sweep decode --cache-dtype int8 --weight-dtype int8 --pipelined
stage figs 600  python -m tpu_flash.bench.figures
stage bench 1200 python bench.py
cat "$R"
