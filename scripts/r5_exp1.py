"""Round-5 experiment 1: where do the last 12% live at 8k? (VERDICT r4
items 1 + 7 — the per-term accounting the storage-remedy decision needs.)

Context: at 8k EVERY kernel sits ~12% off the 197 TFLOP/s bf16-MXU peak
(bf16 174.0, fp8 173.9, int8 186.6 — int8's surplus is its 2× QKᵀ), while
at 32k everything sits ≤5% off. fp8@8k ≈ bf16@8k already, so the DESIGN
§21 storage-level remedy (bf16-resident pages) has ~0.1% of headroom — the
remaining 8k residual is a term the three modes SHARE. This experiment
names it:

  A. shipped-default serving rows 8k/32k (A/B vs the r4_exp11 rows: the
     r5 per-row-score-scale/FMA contract fix must not cost throughput —
     and deletes int8's separate scale-multiply pass);
  B. isolate decomposition ("", noexp, nosum, dots) at 8k AND 32k for
     fp8-tensor + int8 at shipped tiles — which term SHRINKS at 32k;
  C. the same for bf16 dense (ops/flash force_isolate);
  D. fixed-work ladder (b·n² const): (16,8k) (4,16k) (1,32k) — per-step
     vs per-q-block vs per-grid cost separation at constant FLOPs;
  E. 8k config probe under the constant bound (fp8/int8 × tiles/packing).

Writes logs/r5_exp1.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import tpu_flash as tf
from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops import flash as flash_mod
from tpu_flash.ops.oracle import blockwise_dpa
from tpu_flash.quant import qarray
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r5_exp1.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def make_qkv(b, h, n, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
                 for _ in range(3))


def serving_case(q, k, v, dt, ks, qdt, *, gate=True, **kw):
    b, h, n, d = q.shape
    sm = 1.0 / float(np.sqrt(d))
    kq, vq = jax.block_until_ready(jax.jit(functools.partial(
        quantize_kv_cache, kv_dtype=dt, kv_scale=ks))(k, v))
    fn = jax.jit(functools.partial(serving_flash_attention, q_dtype=qdt,
                                   **kw))
    err = None
    if gate:
        kf, vf = qarray.dequantize(kq), qarray.dequantize(vq)
        qf = (q.astype(jnp.float32) * sm) if qdt is None else \
            qarray.dequantize(qarray.quantize(
                q.astype(jnp.float32) * sm, jnp.dtype(qdt), axis=-1))
        want, _ = jax.block_until_ready(jax.jit(functools.partial(
            blockwise_dpa, scale=1.0, chunk=1024))(qf, kf, vf))
        got = jax.block_until_ready(fn(q, kq, vq))
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - want.astype(jnp.float32))))
        if not err <= 1e-2:
            raise AssertionError(f"gate {err}")
        del want, got, kf, vf
    t = time_fn(fn, q, kq, vq, iters=10)
    return t, err


def part_a_b(n, b):
    h, d = 8, 128
    q, k, v = make_qkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d)
    for dt, ks, qdt in [("float8_e4m3fn", "tensor", "float8_e4m3fn"),
                        ("int8", "token", "int8"),
                        ("int8", "token", None)]:
        tag = f"A.{dt}.{ks}" + (".wonly" if qdt is None else "") + f".n{n}"
        try:
            t, err = serving_case(q, k, v, dt, ks, qdt)
        except Exception as e:  # noqa: BLE001
            row(tag=tag, error=str(e)[:160])
            continue
        row(tag=tag, ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2),
            err=round(err, 5), roofline=round(fl / t / 1e12 / 197.0, 4))
        if qdt is None:
            continue
        # B: isolates (WRONG outputs — time only)
        for iso in ("noexp", "nosum", "dots"):
            try:
                t, _ = serving_case(q, k, v, dt, ks, qdt, gate=False,
                                    isolate=iso)
            except Exception as e:  # noqa: BLE001
                row(tag=f"B.{dt}.n{n}.{iso}", error=str(e)[:160])
                continue
            row(tag=f"B.{dt}.n{n}.{iso}", ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2))


def part_c(n, b):
    h, d = 8, 128
    q, k, v = make_qkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d)
    # gated default
    fn = jax.jit(functools.partial(tf.dense_fa))
    want, _ = jax.block_until_ready(jax.jit(functools.partial(
        blockwise_dpa, chunk=1024))(q, k, v))
    got = jax.block_until_ready(fn(q, k, v))
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    t = time_fn(fn, q, k, v, iters=10)
    row(tag=f"C.bf16.n{n}", ms=round(t * 1e3, 3),
        tflops=round(fl / t / 1e12, 2), err=round(err, 5),
        roofline=round(fl / t / 1e12 / 197.0, 4))
    del want, got
    for iso in ("noexp", "nosum", "dots"):
        with flash_mod.force_isolate(iso):
            # fresh (unjitted) call per mode: the isolate global is read at
            # trace time and is NOT in the jit cache key
            fn_i = jax.jit(functools.partial(tf.dense_fa))
            t = time_fn(fn_i, q, k, v, iters=10)
        row(tag=f"C.bf16.n{n}.{iso}", ms=round(t * 1e3, 3),
            tflops=round(fl / t / 1e12, 2))


def part_e():
    h, d, n, b = 8, 128, 8192, 4
    q, k, v = make_qkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d)
    # includes longer-inner-loop configs (smaller bkv → more kv steps per
    # grid instance): the 8k residual decomposed to the DOT chain, not the
    # VPU (int8 dots-only 194.8 @8k vs 213.4 @32k, B rows) — suspicion is
    # per-instance pipeline ramp over the short 4-step kv loop.
    grid = [(4096, 2048, 1), (4096, 1024, 1), (2048, 2048, 1),
            (2048, 2048, 2), (2048, 1024, 2), (2048, 1024, 4),
            (1024, 2048, 4), (1024, 1024, 4), (1024, 1024, 8),
            (8192, 1024, 1)]
    for dt, ks, qdt in [("float8_e4m3fn", "tensor", "float8_e4m3fn"),
                        ("int8", "token", "int8")]:
        for bq, bkv, bhb in grid:
            tag = f"E.{dt}.bq{bq}.bkv{bkv}.bhb{bhb}"
            try:
                t, err = serving_case(q, k, v, dt, ks, qdt, block_q=bq,
                                      block_kv=bkv, bh_block=bhb)
            except Exception as e:  # noqa: BLE001
                row(tag=tag, error=str(e)[:200])
                continue
            row(tag=tag, ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2), err=round(err, 5))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "ab"):
        part_a_b(8192, 4)
        part_a_b(32768, 1)
    if which in ("all", "c"):
        part_c(8192, 4)
        part_c(32768, 1)
    if which in ("all", "d"):
        # fixed-work ladder: b·n² constant = 16·8192²
        for b, n in [(16, 8192), (4, 16384), (1, 32768)]:
            h, d = 8, 128
            q, k, v = make_qkv(b, h, n, d)
            fl = attention_flops(b, h, n, n, d)
            for dt, ks, qdt in [("float8_e4m3fn", "tensor",
                                 "float8_e4m3fn"), ("int8", "token", "int8")]:
                tag = f"D.{dt}.b{b}.n{n}"
                try:
                    t, err = serving_case(q, k, v, dt, ks, qdt)
                except Exception as e:  # noqa: BLE001
                    row(tag=tag, error=str(e)[:160])
                    continue
                row(tag=tag, ms=round(t * 1e3, 3),
                    tflops=round(fl / t / 1e12, 2), err=round(err, 5))
            fnb = jax.jit(tf.dense_fa)
            t = time_fn(fnb, q, k, v, iters=10)
            row(tag=f"D.bf16.b{b}.n{n}", ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2))
    if which in ("all", "e"):
        part_e()
