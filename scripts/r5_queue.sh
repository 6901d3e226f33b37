#!/bin/bash
# Round-5 canonical log refresh. Run AFTER the r5 experiment scripts have
# frozen the defaults. Serial — never run concurrently with other chip work.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# attention + ndim + backward + softmax canonical logs (gates embedded;
# the corrected matched-oracle gate means dense_fp8/int8 error columns
# change and the old failure row must disappear)
timeout 5400 python -m tpu_flash.bench.sweep attention 2>&1 | tail -3
timeout 2400 python -m tpu_flash.bench.sweep ndim 2>&1 | tail -3
timeout 5400 python -m tpu_flash.bench.sweep backward 2>&1 | tail -3

# decode rows: async engine e2e + device tokens/s, parity-gated;
# int8 + fp8 + weight-quant variants at K=8
timeout 2400 python -m tpu_flash.bench.sweep decode --cache-dtype int8 --decode-steps 8 2>&1 | tail -4
timeout 2400 python -m tpu_flash.bench.sweep decode --cache-dtype fp8 --decode-steps 8 2>&1 | tail -4
timeout 2400 python -m tpu_flash.bench.sweep decode --cache-dtype int8 --weight-dtype int8 --decode-steps 8 2>&1 | tail -4

# headline
timeout 900 python bench.py 2>&1 | tail -5
