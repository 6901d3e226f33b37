#!/bin/bash
# Rerun of the steps that failed on sys.path in r2_queue_now.sh.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH
timeout 590 python scripts/r2_verify_drive.py
timeout 1500 python scripts/r2_exp5.py E
timeout 900 python scripts/r2_exp5.py A
timeout 900 python scripts/r2_exp5.py B
timeout 1500 python scripts/r2_exp5.py D
timeout 900 python scripts/r2_exp5.py C
timeout 1800 python scripts/r2_exp6.py A
timeout 1800 python scripts/r2_exp6.py B
timeout 1200 python scripts/r2_exp6.py C
