#!/bin/bash
# Wait for the axon TPU to come back (fast-fail init errors → retry),
# then run the queued chip work serially. No kills — each python either
# errors fast or completes.
export PYTHONPATH=/root/repo:$PYTHONPATH
cd /root/repo
for i in $(seq 1 120); do
    if python -c "
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
import jax.numpy as jnp
print('chip ok', float((jnp.ones((128,128), jnp.bfloat16)@jnp.ones((128,128), jnp.bfloat16)).sum()))" >> logs/r5_wait.log 2>&1; then
        echo "TUNNEL-BACK after $i tries" >> logs/r5_wait.log
        break
    fi
    sleep 120
done
python -u scripts/r5_exp2.py c >> logs/r5_exp2_b.log 2>&1
python -u scripts/r5_exp2.py d >> logs/r5_exp2_b.log 2>&1
python -u scripts/r5_band_probe.py >> logs/r5_band_probe_run.log 2>&1
echo QUEUE2-DONE >> logs/r5_exp2_b.log
