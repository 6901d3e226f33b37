"""Round-3 experiment 1: transposed d<=64 quantized/serving kernels on v5e.

A. serving kernel @8k d=64: transposed (K-major, ones-row l) vs standard
   layout, int8 / fp8-token / fp8-tensor — VERDICT r2 item 4 target:
   >=95 TFLOP/s (standard layout measured 69-78).
B. flash_q e2e d=64 (quantize inside the timed region) — the delegation
   path.
C. bf16 context rows: dense_fa d=64 (the _fwd_kernel_t number, ~102).

Writes JSONL rows to logs/r3_exp1.jsonl.
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
from tpu_flash.quant.flash_q import quantized_dense_fa
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r3_exp1.jsonl", "a")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


def mk(b, h, n, d, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    return tuple(
        jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
        for _ in range(3)
    )


def bench(tag, fn, args, flops, iters=10):
    try:
        t = time_fn(fn, *args, iters=iters)
    except Exception as e:  # noqa: BLE001
        row(tag=tag, error=str(e)[:160])
        return None
    row(tag=tag, ms=round(t * 1e3, 3), tflops=round(flops / t / 1e12, 2))
    return t


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    b, h, n, d = 4, 8, 8192, 64
    fl = attention_flops(b, h, n, n, d)
    q, k, v = mk(b, h, n, d)

    if which in ("all", "A"):
        log("=== A: serving transposed vs standard @8k d=64 ===")
        for dt, kv_scale in [("int8", "token"), ("float8_e4m3fn", "token"),
                             ("float8_e4m3fn", "tensor")]:
            kq, vq = jax.block_until_ready(jax.jit(functools.partial(
                quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
            for tr in (True, False):
                for bq, bkv in [(1024, 2048), (512, 1024), (1024, 1024)]:
                    fn = jax.jit(functools.partial(
                        serving_flash_attention, q_dtype=dt, transposed=tr,
                        block_q=bq, block_kv=bkv))
                    bench(f"A.{dt}.{kv_scale}.{'T' if tr else 'S'}"
                          f".bq{bq}.bkv{bkv}", fn, (q, kq, vq), fl)

    if which in ("all", "B"):
        log("=== B: flash_q e2e d=64 (delegation) ===")
        for dt, kv_scale in [("int8", "token"), ("float8_e4m3fn", "tensor")]:
            for tr in (True, False):
                fn = jax.jit(functools.partial(
                    quantized_dense_fa, q_dtype=dt, kv_dtype=dt,
                    kv_scale=kv_scale, transposed=tr))
                bench(f"B.e2e.{dt}.{kv_scale}.{'T' if tr else 'S'}",
                      fn, (q, k, v), fl)

    if which in ("all", "C"):
        log("=== C: bf16 context rows d=64 ===")
        bench("C.dense_fa.bf16.d64", jax.jit(dense_fa), (q, k, v), fl)


if __name__ == "__main__":
    main()
