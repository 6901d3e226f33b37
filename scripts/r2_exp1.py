"""Round-2 experiment 1: block sweeps after mask-skip + lse elision.

Measures on the real chip:
  A. bf16 dense @8k d=128 — block sweep (incl. bq=2048) to close the
     148→165 gap vs 32k (VERDICT r1 item 1c).
  B. d=64 dense @8k — block sweep + MXU pass-model microbench (is a
     K=64 matmul the same wall time as K=128?).
  C. sliding w=1025 @8k — band block sweep with the interior mask-skip.
  D. fp8 @8k — current state after lse elision (preamble fusion comes next).

Writes JSONL rows to logs/r2_exp1.jsonl and prints a table to stderr.
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
from tpu_flash.quant.flash_q import quantized_dense_fa

LOG = open("/root/repo/logs/r2_exp1.jsonl", "a")


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
    except Exception as e:  # noqa: BLE001 — VMEM-infeasible configs just lose
        row(tag=tag, error=str(e)[:120])
        return None
    row(tag=tag, ms=round(t * 1e3, 3), tflops=round(flops / t / 1e12, 2))
    return t


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    b, h, n = 4, 8, 8192

    if which in ("all", "A"):
        log("=== A: bf16 dense @8k d=128 block sweep ===")
        q, k, v = mk(b, h, n, 128)
        fl = attention_flops(b, h, n, n, 128)
        for bq, bkv in [(1024, 2048), (2048, 2048), (1024, 4096),
                        (2048, 4096), (512, 4096), (2048, 1024)]:
            fn = jax.jit(functools.partial(dense_fa, block_q=bq, block_kv=bkv))
            bench(f"A.dense.bf16.8k.d128.bq{bq}.bkv{bkv}", fn, (q, k, v), fl)

    if which in ("all", "B"):
        log("=== B: d=64 @8k block sweep + pass model ===")
        q, k, v = mk(b, h, n, 64)
        fl = attention_flops(b, h, n, n, 64)
        for bq, bkv in [(1024, 2048), (2048, 2048), (2048, 4096),
                        (1024, 4096), (2048, 8192), (4096, 4096)]:
            fn = jax.jit(functools.partial(dense_fa, block_q=bq, block_kv=bkv))
            bench(f"B.dense.bf16.8k.d64.bq{bq}.bkv{bkv}", fn, (q, k, v), fl)
        # pass-model microbench: time (8192,K)x(K,8192) for K=64 vs 128
        rng = np.random.default_rng(1)
        for kdim in (64, 128, 256):
            a = jnp.asarray(rng.standard_normal((8192, kdim)), jnp.bfloat16)
            bm = jnp.asarray(rng.standard_normal((kdim, 8192)), jnp.bfloat16)
            f = jax.jit(lambda a, bm: a @ bm)
            t = time_fn(f, a, bm, iters=30)
            row(tag=f"B.mm.K{kdim}", us=round(t * 1e6, 1),
                tflops=round(2 * 8192 * 8192 * kdim / t / 1e12, 2))

    if which in ("all", "C"):
        log("=== C: sliding w=1025 @8k band block sweep (mask-skip) ===")
        q, k, v = mk(b, h, n, 128)
        cov = 1025 / n
        fl = attention_flops(b, h, n, n, 128, coverage=cov)
        for bq, bkv in [(1024, 2048), (512, 512), (512, 1024), (256, 256),
                        (1024, 512), (256, 512), (512, 256), (1024, 1024)]:
            fn = jax.jit(functools.partial(
                sliding_fa, window_size=1025, block_q=bq, block_kv=bkv))
            t = bench(f"C.sliding.w1025.8k.bq{bq}.bkv{bkv}", fn, (q, k, v), fl)

    if which in ("all", "D"):
        log("=== D: fp8 @8k current state ===")
        q, k, v = mk(b, h, n, 128)
        fl = attention_flops(b, h, n, n, 128)
        fn = jax.jit(functools.partial(
            quantized_dense_fa, q_dtype="float8_e4m3fn",
            kv_dtype="float8_e4m3fn", kv_scale="tensor"))
        bench("D.fp8.8k.d128.tensor", fn, (q, k, v), fl)
        fn2 = jax.jit(functools.partial(
            quantized_dense_fa, q_dtype="int8", kv_dtype="int8"))
        bench("D.int8.8k.d128.token", fn2, (q, k, v), fl)

    if which in ("all", "E"):
        log("=== E: fp8 preamble breakdown ===")
        import math
        from tpu_flash.quant.qarray import quantize, QMAX
        from tpu_flash.ops.flash import LOG2E
        q, k, v = mk(b, h, n, 128)
        fl = attention_flops(b, h, n, n, 128)
        dt = jnp.float8_e4m3fn
        scale = 1.0 / math.sqrt(128)

        @jax.jit
        def preamble(q, k, v):
            bb, hh, nn, dd = q.shape
            qf = (q.astype(jnp.float32) * scale).reshape(bb * hh, nn, dd)
            kf = k.reshape(bb * hh, nn, dd).astype(jnp.float32)
            vf = v.reshape(bb * hh, nn, dd).astype(jnp.float32)
            kq = quantize(kf, dt, axis=(-2, -1))
            vq = quantize(vf, dt, axis=-2)
            qv = quantize(qf, dt, axis=-1)
            deq = qv.values.astype(jnp.float32) * qv.scales * (
                LOG2E * kq.scales)
            return deq.astype(jnp.bfloat16), kq.values, kq.scales, \
                vq.values, vq.scales

        t = time_fn(preamble, q, k, v, iters=10)
        row(tag="E.preamble.current", ms=round(t * 1e3, 3))

        @jax.jit
        def preamble_lean(q, k, v):
            # no f32 materialization: reduces read bf16; one fused
            # scale+cast pass per tensor
            bb, hh, nn, dd = q.shape
            qf = q.reshape(bb * hh, nn, dd)
            kf = k.reshape(bb * hh, nn, dd)
            vf = v.reshape(bb * hh, nn, dd)
            k_amax = jnp.max(jnp.abs(kf).astype(jnp.float32), axis=(-2, -1),
                             keepdims=True)
            sk = jnp.maximum(k_amax, 1e-12) / QMAX[jnp.dtype(dt)]
            k8 = (kf.astype(jnp.float32) / sk).astype(dt)
            v_amax = jnp.max(jnp.abs(vf).astype(jnp.float32), axis=-2,
                             keepdims=True)
            sv = jnp.maximum(v_amax, 1e-12) / QMAX[jnp.dtype(dt)]
            v8 = (vf.astype(jnp.float32) / sv).astype(dt)
            qs = qf.astype(jnp.float32) * scale
            q_amax = jnp.max(jnp.abs(qs), axis=-1, keepdims=True)
            sq = jnp.maximum(q_amax, 1e-12) / QMAX[jnp.dtype(dt)]
            q8 = (qs / sq).astype(dt)
            deq = q8.astype(jnp.float32) * sq * (LOG2E * sk)
            return deq.astype(jnp.bfloat16), k8, sk, v8, sv

        t = time_fn(preamble_lean, q, k, v, iters=10)
        row(tag="E.preamble.lean", ms=round(t * 1e3, 3))

    if which in ("all", "F"):
        log("=== F: serving-mode (pre-quantized cache, in-kernel Q) ===")
        from tpu_flash.quant.serving_attn import (
            quantize_kv_cache, serving_flash_attention)
        q, k, v = mk(b, h, n, 128)
        fl = attention_flops(b, h, n, n, 128)
        for dt, ksc, qd in [
            ("float8_e4m3fn", "tensor", "float8_e4m3fn"),
            ("float8_e4m3fn", "token", "float8_e4m3fn"),
            ("int8", "token", "int8"),
            ("int8", "token", None),
        ]:
            kq, vq = jax.block_until_ready(
                jax.jit(functools.partial(
                    quantize_kv_cache, kv_dtype=dt, kv_scale=ksc))(k, v))
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=qd))
            bench(f"F.serve.{dt}.{ksc}.q{qd}", fn, (q, kq, vq), fl)

    if which in ("all", "G"):
        log("=== G: int8 MXU rate microbench (large square) ===")
        rng = np.random.default_rng(2)
        m_ = 8192
        for dt in ("bfloat16", "int8"):
            a = jnp.asarray(
                rng.integers(-100, 100, (m_, m_)), jnp.dtype(dt)
            ) if dt == "int8" else jnp.asarray(
                rng.standard_normal((m_, m_)), jnp.bfloat16)
            bm = a.T
            pref = jnp.int32 if dt == "int8" else jnp.float32
            f = jax.jit(lambda a, bm: jax.lax.dot_general(
                a, bm, (((1,), (0,)), ((), ())), preferred_element_type=pref))
            t = time_fn(f, a, bm, iters=20)
            row(tag=f"G.mm8192.{dt}", us=round(t * 1e6, 1),
                tops=round(2 * m_**3 / t / 1e12, 2))


if __name__ == "__main__":
    main()


def exp_h():
    """vmem_limit raise: larger blocks for bf16 d=128/d=64 dense."""
    import functools as ft
    b, h, n = 4, 8, 8192
    log("=== H: vmem_limit raise, larger blocks ===")
    for d in (128, 64):
        q, k, v = mk(b, h, n, d)
        fl = attention_flops(b, h, n, n, d)
        cands = [(2048, 2048, 32), (2048, 4096, 64), (1024, 4096, 64),
                 (4096, 4096, 100), (1024, 8192, 100), (2048, 8192, 100)]
        for bq, bkv, mb in cands:
            fn = jax.jit(ft.partial(
                dense_fa, block_q=bq, block_kv=bkv, vmem_limit_mb=mb))
            bench(f"H.dense.bf16.8k.d{d}.bq{bq}.bkv{bkv}.v{mb}",
                  fn, (q, k, v), fl)


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "H":
    exp_h()
