#!/bin/bash
# Round-5 canonical refresh, reordered fast-first so a wall-clock cutoff
# still lands the highest-value rows. Serial chip use only.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

timeout 1800 python -m tpu_flash.bench.sweep decode --cache-dtype int8 --decode-steps 8 2>&1 | tail -4
timeout 1800 python -m tpu_flash.bench.sweep decode --cache-dtype fp8 --decode-steps 8 2>&1 | tail -4
timeout 1800 python -m tpu_flash.bench.sweep decode --cache-dtype int8 --weight-dtype int8 --decode-steps 8 2>&1 | tail -4
timeout 900 python bench.py 2>&1 | tail -5
timeout 600 python scripts/r5_band_probe.py 2>&1 | tail -6
timeout 5400 python -m tpu_flash.bench.sweep attention 2>&1 | tail -3
timeout 5400 python -m tpu_flash.bench.sweep backward 2>&1 | tail -3
timeout 2400 python -m tpu_flash.bench.sweep ndim 2>&1 | tail -3
echo CANONICAL_QUEUE_DONE
