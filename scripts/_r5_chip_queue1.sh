#!/bin/bash
# One patient client chain: each step blocks on the tunnel as needed.
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
python -u scripts/r5_exp2.py c >> logs/r5_exp2_b.log 2>&1
python -u scripts/r5_exp2.py d >> logs/r5_exp2_b.log 2>&1
python -u scripts/r5_band_probe.py >> logs/r5_band_probe_run.log 2>&1
echo QUEUE1-DONE >> logs/r5_exp2_b.log
