"""Round-3 (cont.) experiment: single-Q-block serving kernel at n=8k.

DESIGN §20: the fp8 serving kernel's gap to the bf16 dot floor is the
e4m3→bf16 KV upcast re-run once per Q block. r3_exp3 stopped at
block_q=4096 (2 repeats at n=8192 → fp8 169.7). block_q=8192 makes the
upcast run EXACTLY ONCE; its f32 score tile at bkv=1024 (32 MB) is the
same VMEM footprint as the shipped bq4096/bkv2048. Sweeps
bq ∈ {4096, 8192} × bkv ∈ {512, 1024, 2048} for fp8-tensor / int8-token
serving (+ bf16 dense at the same grids), correctness-gated per config.

Writes logs/r4_exp1.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import dense_fa
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r4_exp1.jsonl", "a")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


def main():
    b, h, n, d = 4, 8, 8192, 128
    fl = attention_flops(b, h, n, n, d)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))

    cases = []
    for dt, kv_scale in [("float8_e4m3fn", "tensor"), ("int8", "token")]:
        kq, vq = jax.block_until_ready(jax.jit(functools.partial(
            quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
        cases.append((dt, kq, vq))

    grids = [(8192, 1024), (8192, 2048), (8192, 512), (4096, 1024)]
    for dt, kq, vq in cases:
        ref = jax.block_until_ready(jax.jit(functools.partial(
            serving_flash_attention, q_dtype=dt))(q, kq, vq))
        for bq, bkv in grids:
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt,
                block_q=bq, block_kv=bkv))
            try:
                got = jax.block_until_ready(fn(q, kq, vq))
            except Exception as e:  # noqa: BLE001
                row(tag=f"{dt}.bq{bq}.bkv{bkv}", error=str(e)[:160])
                continue
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            if not err <= 2.5e-2:
                row(tag=f"{dt}.bq{bq}.bkv{bkv}", error=f"gate {err}")
                continue
            t = time_fn(fn, q, kq, vq, iters=10)
            row(tag=f"{dt}.bq{bq}.bkv{bkv}", ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2), err=round(err, 5))

    for bq, bkv in grids:
        fn = jax.jit(functools.partial(dense_fa, block_q=bq, block_kv=bkv))
        try:
            t = time_fn(fn, q, k, v, iters=10)
        except Exception as e:  # noqa: BLE001
            row(tag=f"bf16.bq{bq}.bkv{bkv}", error=str(e)[:160])
            continue
        row(tag=f"bf16.bq{bq}.bkv{bkv}", ms=round(t * 1e3, 3),
            tflops=round(fl / t / 1e12, 2))


if __name__ == "__main__":
    main()
