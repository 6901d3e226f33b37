#!/bin/bash
# Ordered TPU work queue for round 2 close-out. ALL TPU work must be
# serialized (two JAX clients corrupt each other's timings and can
# ResourceExhaust the chip) — run this script alone, nothing else on
# the tunnel. Each step is timeout-bounded; a step failing does not
# block the rest (the tunnel can abort sporadically — rerun the step).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:$PYTHONPATH

# 0. verify drive: MoE model + dense oracle gate on the real chip
timeout 590 python - <<'EOF'
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp, numpy as np
import tpu_flash as tf
from tpu_flash.models import transformer as tfm
rng = np.random.default_rng(1)
def rand(*s, dtype=jnp.bfloat16): return jnp.asarray(rng.standard_normal(s), dtype)
b,h,n,d = 2,4,1000,64
q,k,v = rand(b,h,n,d), rand(b,h,n,d), rand(b,h,n,d)
o = tf.dense_fa(q,k,v); o_ref,_ = tf.dense_dpa(q,k,v)
print("dense_fa max-abs:", float(jnp.max(jnp.abs(o.astype(jnp.float32)-o_ref.astype(jnp.float32)))))
cfg = tfm.ModelConfig(vocab_size=256, dim=256, num_layers=2, num_q_heads=4,
                      num_kv_heads=4, head_dim=64, mlp_hidden=512,
                      block_q=256, block_kv=256, dtype="bfloat16",
                      moe_experts=4, moe_top_k=2)
params = tfm.init_params(jax.random.PRNGKey(0), cfg)
toks = jnp.asarray(rng.integers(0, 256, (2, 257)), jnp.int32)
loss, grads = jax.jit(jax.value_and_grad(tfm.loss_fn), static_argnums=2)(params, toks, cfg)
print("MoE loss on TPU:", float(loss),
      "router gnorm:", float(jnp.linalg.norm(grads["layers"][0]["wr"])))
EOF

# 1. sliding bh_block sweep (VERDICT #3: target >=4x over dense)
timeout 1800 python scripts/r2_exp5.py E

# 2. serving-kernel + bwd refreshers
timeout 1800 python scripts/r2_exp5.py A
timeout 1800 python scripts/r2_exp5.py B
timeout 1800 python scripts/r2_exp5.py D
timeout 1200 python scripts/r2_exp5.py C

# 3. serving features wall-clock (prefix cache / speculation / sampling)
timeout 2400 python scripts/r2_exp6.py A
timeout 2400 python scripts/r2_exp6.py B
timeout 1800 python scripts/r2_exp6.py C

# 4. headline sanity
timeout 1200 python bench.py --dtype bf16
timeout 1200 python bench.py

# 5. decode quick sweep (regression vs memory baselines)
timeout 1800 python -m tpu_flash.bench.sweep decode --quick
