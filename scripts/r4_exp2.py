"""Round-3 (cont.) experiment: hide the exposed softmax with bh packing
at the upcast-amortizing big tiles.

DESIGN §20: int8's residual gap to the bf16 dot floor is ~1.0 ms of
exposed VPU softmax that kv_split does not overlap — but packing
independent batch·head rows into one grid step does (§21 showed this for
band schedules). r3_exp3 swept block sizes at bh_block=1 only. This
sweeps bh_block ∈ {2, 4} over the winning big-tile configs (the VMEM
override now grants 96 MB to score tiles >32 MB), fp8-tensor/int8-token,
correctness-gated per config against the shipped default.

Writes logs/r4_exp2.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r4_exp2.jsonl", "a")


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
    for dt, kv_scale in [("int8", "token"), ("float8_e4m3fn", "tensor")]:
        kq, vq = jax.block_until_ready(jax.jit(functools.partial(
            quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
        cases.append((dt, kq, vq))

    # (block_q, block_kv, bh_block): score tile = bq*bkv*bhb*4 bytes
    grids = [
        (4096, 2048, 2),   # 64 MB scores — needs the 96 MB override
        (2048, 2048, 2),   # 32 MB
        (2048, 2048, 4),   # 64 MB
        (1024, 2048, 4),   # 32 MB
        (4096, 4096, 1),   # 64 MB — the r3_exp3 config that hit the cap
    ]
    for dt, kq, vq in cases:
        ref = jax.block_until_ready(jax.jit(functools.partial(
            serving_flash_attention, q_dtype=dt))(q, kq, vq))
        for bq, bkv, bhb in grids:
            tag = f"{dt}.bq{bq}.bkv{bkv}.bhb{bhb}"
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt,
                block_q=bq, block_kv=bkv, bh_block=bhb))
            try:
                got = jax.block_until_ready(fn(q, kq, vq))
            except Exception as e:  # noqa: BLE001
                row(tag=tag, error=str(e)[:160])
                continue
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            if not err <= 2.5e-2:
                row(tag=tag, error=f"gate {err}")
                continue
            t = time_fn(fn, q, kq, vq, iters=10)
            row(tag=tag, ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2), err=round(err, 5))


if __name__ == "__main__":
    main()
