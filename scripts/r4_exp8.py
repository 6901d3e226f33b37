"""Round-4 experiment 8: band bound-max A/B + d=64 band routing + d=64
fp8 serving modes.

A. The bf16 forward gained a constant norm-bound max (flash.py
   force_bound_max): A/B it at the shipped band default (sliding/
   circulant w=1025, 8k, d=128, bq512/bkv1024/bhb8) and at dense — the
   r4_exp4 decomposition says max+rescale is ~0.32 ms of the 2.36 ms
   band time. The auto-default (band→on) must match this log.

B. d ≤ 64 band schedules: transposed kernel (full PV lanes, no packing)
   vs standard kernel (half PV lanes, bhb8 + bound-max) — bands are
   step-latency-bound, so packing should win (VERDICT item 6: d=64
   sliding sits at 17-27 covered; target ≥35).

C. d=64 serving straggler (VERDICT item 6): fp8-token 85.4 vs the ≥95
   bar in r3; re-measure token vs tensor on the transposed serving
   kernel to either close it or freeze the documented default to tensor.

Writes logs/r4_exp8.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import (
    flash_attention,
    force_bh_block,
    force_bound_max,
    force_standard_small_d,
)
from tpu_flash.ops.oracle import blockwise_dpa
from tpu_flash.quant import qarray
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r4_exp8.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def band_case(tag, sched_name, radius, b, h, n, d, bq, bkv, bhb,
              bound, standard_small_d=False, iters=20):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    w = 2 * radius + 1
    fl = 4 * b * h * n * min(w, n) * d
    fn = jax.jit(functools.partial(
        flash_attention, schedule=sched_name, radius=radius,
        block_q=bq, block_kv=bkv))
    try:
        with force_bh_block(bhb), force_bound_max(bound), \
                force_standard_small_d(standard_small_d):
            got = jax.block_until_ready(fn(q, k, v))
            want, _ = jax.block_until_ready(jax.jit(functools.partial(
                blockwise_dpa, window_size=w,
                wrap=(sched_name == "circulant"), chunk=1024))(q, k, v))
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32))))
            if not err <= 5e-3:
                row(tag=tag, error=f"gate {err}")
                return
            t = time_fn(fn, q, k, v, iters=iters)
    except Exception as e:  # noqa: BLE001
        row(tag=tag, error=str(e)[:160])
        return
    row(tag=tag, ms=round(t * 1e3, 3),
        tflops_covered=round(fl / t / 1e12, 2), err=round(err, 6))


def dense_case(tag, b, h, n, d, bound, iters=10):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    fl = attention_flops(b, h, n, n, d)
    fn = jax.jit(functools.partial(flash_attention))
    with force_bound_max(bound):
        got = jax.block_until_ready(fn(q, k, v))
        want, _ = jax.block_until_ready(jax.jit(functools.partial(
            blockwise_dpa, chunk=1024))(q, k, v))
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - want.astype(jnp.float32))))
        if not err <= 5e-3:
            row(tag=tag, error=f"gate {err}")
            return
        t = time_fn(fn, q, k, v, iters=iters)
    row(tag=tag, ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2),
        err=round(err, 6))


def serving_d64(tag, kv_scale, b, h, n, d, iters=10):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    fl = attention_flops(b, h, n, n, d)
    sm = 1.0 / float(np.sqrt(d))
    kq, vq = jax.block_until_ready(jax.jit(functools.partial(
        quantize_kv_cache, kv_dtype="float8_e4m3fn",
        kv_scale=kv_scale))(k, v))
    kf, vf = qarray.dequantize(kq), qarray.dequantize(vq)
    qf = qarray.dequantize(qarray.quantize(
        q.astype(jnp.float32) * sm, jnp.dtype(jnp.float8_e4m3fn), axis=-1))
    want, _ = jax.block_until_ready(jax.jit(functools.partial(
        blockwise_dpa, scale=1.0, chunk=1024))(qf, kf, vf))
    fn = jax.jit(functools.partial(
        serving_flash_attention, q_dtype="float8_e4m3fn"))
    got = jax.block_until_ready(fn(q, kq, vq))
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    if not err <= 1e-2:
        row(tag=tag, error=f"gate {err}")
        return
    t = time_fn(fn, q, kq, vq, iters=iters)
    row(tag=tag, ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2),
        err=round(err, 5))


def main():
    b, h, n = 4, 8, 8192
    # ---- A: bound-max A/B at the shipped band default + dense
    for sched_name in ("local", "circulant"):
        for bound in (False, True):
            band_case(
                f"{sched_name}.w1025.d128.512x1024.bhb8."
                f"{'bound' if bound else 'exact'}",
                sched_name, 512, b, h, n, 128, 512, 1024, 8, bound)
    for bound in (False, True):
        dense_case(f"dense.d128.default.{'bound' if bound else 'exact'}",
                   b, h, n, 128, bound)
    # deeper packing at the band default now that bound-max frees VPU time
    band_case("local.w1025.d128.512x1024.bhb16.bound", "local", 512,
              b, h, n, 128, 512, 1024, 16, True)

    # ---- B: d=64 band routing (transposed vs standard+packing)
    for standard in (False, True):
        for bq, bkv, bhb in ((512, 1024, 8), (1024, 1024, 4)):
            band_case(
                f"local.w1025.d64.{bq}x{bkv}.bhb{bhb}."
                f"{'std' if standard else 'tr'}",
                "local", 512, b, h, n, 64, bq, bkv, bhb, True,
                standard_small_d=standard)

    # ---- C: d=64 fp8 serving token vs tensor (K-scale fold into the
    # operand landed between r3 and this run)
    for kv_scale in ("token", "tensor"):
        serving_d64(f"serving.fp8.{kv_scale}.d64.n8192", kv_scale,
                    b, h, n, 64)
    # fold impact at d=128 (exp7 measured token UNfolded at 166.5 @
    # bq4096/bkv2048 vs tensor 169.2)
    for kv_scale in ("token", "tensor"):
        serving_d64(f"serving.fp8.{kv_scale}.d128.n8192", kv_scale,
                    b, h, n, 128)


if __name__ == "__main__":
    main()
