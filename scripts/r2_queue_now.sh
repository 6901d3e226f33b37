#!/bin/bash
# Trimmed, priority-ordered round-2 close-out queue (serialized TPU work).
set -x
cd /root/repo
timeout 590 python scripts/r2_verify_drive.py
timeout 1500 python scripts/r2_exp5.py E
timeout 900 python scripts/r2_exp5.py A
timeout 900 python scripts/r2_exp5.py B
timeout 1200 python bench.py --dtype bf16
timeout 1200 python bench.py
timeout 1500 python scripts/r2_exp5.py D
timeout 900 python scripts/r2_exp5.py C
timeout 1800 python scripts/r2_exp6.py A
timeout 1800 python scripts/r2_exp6.py B
timeout 1200 python scripts/r2_exp6.py C
timeout 1800 python -m tpu_flash.bench.sweep decode --quick
