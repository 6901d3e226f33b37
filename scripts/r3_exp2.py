"""Round-3 experiment 2: headline floor decomposition + band pipeline A/B.

A. serving-kernel decomposition @8k d=128 (VERDICT r2 item 2): time the
   full kernel against variants with one VPU pass deleted (isolate=
   "noexp" / "nosum" / "dots") for fp8-tensor and int8. The deltas are
   the serial VPU costs the MXU cannot hide; "dots" is the pure dot-chain
   ceiling of this tile schedule. Outputs under isolate are WRONG — these
   rows are timings only.
B. in-step pipelined band forward A/B (VERDICT r2 item 3): sliding
   w=1025 @8k d=128 bf16, BlockSpec path (round-2 best: 2.24 ms at
   bq512/bkv1024/bhb8) vs `band_pipeline(True, sub)` sweeps. Gates each
   pipelined config against the BlockSpec output before timing.
C. circulant w=1025 @8k same A/B.

Writes logs/r3_exp2.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops import flash
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r3_exp2.jsonl", "a")


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


def bench(tag, fn, args, flops, iters=10, **extra):
    try:
        t = time_fn(fn, *args, iters=iters)
    except Exception as e:  # noqa: BLE001
        row(tag=tag, error=str(e)[:200])
        return None
    row(tag=tag, ms=round(t * 1e3, 3), tflops=round(flops / t / 1e12, 2),
        **extra)
    return t


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    b, h, n, d = 4, 8, 8192, 128
    fl = attention_flops(b, h, n, n, d)
    q, k, v = mk(b, h, n, d)

    if which in ("all", "A"):
        log("=== A: serving decomposition @8k d=128 ===")
        for dt, kv_scale in [("float8_e4m3fn", "tensor"), ("int8", "token")]:
            kq, vq = jax.block_until_ready(jax.jit(functools.partial(
                quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
            for iso in ("", "noexp", "nosum", "dots"):
                fn = jax.jit(functools.partial(
                    serving_flash_attention, q_dtype=dt, isolate=iso))
                bench(f"A.{dt}.{iso or 'full'}", fn, (q, kq, vq), fl)

    if which in ("all", "B", "C"):
        w = 1025
        cov = w / n
        flc = attention_flops(b, h, n, n, d, coverage=cov)
        for name, make in (
            ("sliding", lambda **kw: functools.partial(
                flash.sliding_fa, window_size=w, **kw)),
            ("circulant", lambda **kw: functools.partial(
                flash.circulant_fa, window_size=w, **kw)),
        ):
            if name == "sliding" and which not in ("all", "B"):
                continue
            if name == "circulant" and which not in ("all", "C"):
                continue
            log(f"=== {name} band A/B @8k d=128 (covered TFLOP/s) ===")
            # round-2 best BlockSpec config as the baseline
            with flash.force_bh_block(8):
                base_fn = jax.jit(make(block_q=512, block_kv=1024))
                want = jax.block_until_ready(base_fn(q, k, v))
                bench(f"{name}.blockspec.bq512.bkv1024.bhb8",
                      base_fn, (q, k, v), flc)
            for sub in (256, 512, 1024):
                for bq in (256, 512):
                    for bhb in (4, 8):
                        def run(q, k, v, _bq=bq, _sub=sub, _bhb=bhb,
                                _mk=make):
                            with flash.band_pipeline(True, sub=_sub), \
                                 flash.force_bh_block(_bhb):
                                return _mk(block_q=_bq, block_kv=_sub)(
                                    q, k, v)
                        fn = jax.jit(run)
                        try:
                            got = jax.block_until_ready(fn(q, k, v))
                        except Exception as e:  # noqa: BLE001
                            row(tag=f"{name}.pipe.bq{bq}.sub{sub}.bhb{bhb}",
                                error=str(e)[:200])
                            continue
                        err = float(jnp.max(jnp.abs(
                            got.astype(jnp.float32)
                            - want.astype(jnp.float32))))
                        if not err <= 2.5e-2:
                            row(tag=f"{name}.pipe.bq{bq}.sub{sub}.bhb{bhb}",
                                error=f"gate failed: {err}")
                            continue
                        bench(f"{name}.pipe.bq{bq}.sub{sub}.bhb{bhb}",
                              fn, (q, k, v), flc, err=round(err, 5))


def section_d(q, k, v, b, h, n, d):
    """Backward band A/B: bh packing on the dq/dkv kernels (target:
    ≥60 TFLOP/s covered; round 2 measured 33)."""
    w = 1025
    cov = w / n
    fl_bwd = attention_flops(b, h, n, n, d, backward=True, coverage=cov)

    def make(bq, bkv, bhb):
        def run(q, k, v):
            with flash.force_bh_block(bhb):
                def loss(q, k, v):
                    return jnp.sum(flash.sliding_fa(
                        q, k, v, w, block_q=bq, block_kv=bkv
                    ).astype(jnp.float32))
                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return jax.jit(run)

    log("=== D: sliding backward bh-packing A/B (covered TFLOP/s) ===")
    for bq, bkv in [(512, 512), (512, 1024), (256, 512)]:
        for bhb in (1, 4, 8):
            bench(f"D.bwd.sliding.bq{bq}.bkv{bkv}.bhb{bhb}",
                  make(bq, bkv, bhb), (q, k, v), fl_bwd, iters=5)


if __name__ == "__main__":
    main()
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "D"):
        b, h, n, d = 4, 8, 8192, 128
        q, k, v = mk(b, h, n, d)
        section_d(q, k, v, b, h, n, d)
