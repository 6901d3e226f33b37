"""Round-2 experiment 5: kv_split MXU/VPU-overlap A/B on the v5e.

A. serving kernel fp8/int8 @8k d=128, kv_split 1/2/4 (the headline).
B. bf16 dense + sliding-band A/B of the pipelined bh loop in _fwd_kernel
   (the restructure is already in the tree; this just re-measures against
   the logged pre-change numbers: dense 158.5 @bq1024/bkv2048,
   sliding w=1025 2.48 ms).
C. e2e quantized path regression check.

Writes JSONL rows to logs/r2_exp5.jsonl and prints a table to stderr.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import dense_fa, sliding_fa
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r2_exp5.jsonl", "a")


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
    b, h, n, d = 4, 8, 8192, 128
    fl = attention_flops(b, h, n, n, d)

    if which in ("all", "A"):
        log("=== A: serving kernel kv_split sweep @8k d=128 ===")
        q, k, v = mk(b, h, n, d)
        for dt, kv_scale in [("float8_e4m3fn", "tensor"), ("int8", "token")]:
            kq, vq = jax.block_until_ready(jax.jit(functools.partial(
                quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
            for split in (1, 2, 4):
                fn = jax.jit(functools.partial(
                    serving_flash_attention, q_dtype=dt, kv_split=split))
                bench(f"A.serve.{dt}.split{split}", fn, (q, kq, vq), fl)

    if which in ("all", "B"):
        log("=== B: pipelined-bh _fwd_kernel regression/gain check ===")
        q, k, v = mk(b, h, n, d)
        fn = jax.jit(functools.partial(dense_fa, block_q=1024, block_kv=2048))
        bench("B.dense.bf16.bq1024.bkv2048", fn, (q, k, v), fl)
        for bq, bkv in [(512, 512), (256, 256), (512, 1024)]:
            fn = jax.jit(functools.partial(
                sliding_fa, window_size=1025, block_q=bq, block_kv=bkv))
            bench(f"B.sliding.w1025.bq{bq}.bkv{bkv}", fn, (q, k, v), fl)

    if which in ("all", "E"):
        # Sliding is grid-step-latency-bound: sweep the batch-head packing
        # (rows fused per step) past the auto cap of 2 — bhb=8 projects
        # ~1.6 ms (4.3x dense) if the fixed per-step cost dominates.
        log("=== E: sliding bh_block sweep (step-overhead amortization) ===")
        from tpu_flash.ops.flash import force_bh_block
        q, k, v = mk(b, h, n, d)
        for bq, bkv in [(512, 512), (256, 512), (512, 1024)]:
            for bhb in (2, 4, 8):
                with force_bh_block(bhb):
                    fn = jax.jit(functools.partial(
                        sliding_fa, window_size=1025,
                        block_q=bq, block_kv=bkv))
                    bench(f"E.sliding.w1025.bq{bq}.bkv{bkv}.bhb{bhb}",
                          fn, (q, k, v), fl)

    if which in ("all", "D"):
        log("=== D: backward split staging A/B @8k d=128 ===")
        q, k, v = mk(b, h, n, d)
        fl_bwd = fl * 2.5  # fwd + bwd (recompute) flop model

        def make_loss(bq, bkv, split):
            def loss(q, k, v):
                return jnp.sum(
                    dense_fa(q, k, v, block_q=bq, block_kv=bkv,
                             bwd_split=split).astype(jnp.float32))
            return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        for split in (1, 2, 4):
            g = make_loss(1024, 2048, split)
            bench(f"D.bwd.split{split}.bq1024.bkv2048", g, (q, k, v), fl_bwd)
            g = make_loss(512, 1024, split)
            bench(f"D.bwd.split{split}.bq512.bkv1024", g, (q, k, v), fl_bwd)

    if which in ("all", "C"):
        log("=== C: e2e quantized regression check ===")
        from tpu_flash.quant.flash_q import quantized_dense_fa
        q, k, v = mk(b, h, n, d)
        for dt, kv_scale in [("float8_e4m3fn", "tensor"), ("int8", "token")]:
            fn = jax.jit(functools.partial(
                quantized_dense_fa, q_dtype=dt, kv_dtype=dt,
                kv_scale=kv_scale))
            bench(f"C.e2e.{dt}", fn, (q, k, v), fl)


if __name__ == "__main__":
    main()
