"""Round-4 experiment 11: constant-bound serving kernel measurement.

The serving kernels' bound_max upgraded from a per-step kmax (max pass
deleted, alpha-rescale kept) to the CONSTANT per-q-block bound that won
dense bf16 +4% in r4_exp8 (m set once at init; alpha ≡ 1 deletes the
per-step rescale of l AND the (bq, dv) acc rescale). Measures the new
kernel at the shipped defaults, 8k + 32k, fp8-tensor/int8-token/
weight-only + the d=64 transposed path, gated vs the blockwise oracle.
Baselines to beat (per-step bound): fp8 170.5 / int8 175.0 @8k,
185.7 / 188.4 @32k (logs/r4_exp3.jsonl); d=64 fp8-tensor 91.7
(logs/r4_exp8.jsonl).

Writes logs/r4_exp11.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.oracle import blockwise_dpa
from tpu_flash.quant import qarray
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r4_exp11.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def sweep(b, h, n, d):
    fl = attention_flops(b, h, n, n, d)
    sm = 1.0 / float(np.sqrt(d))
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    cases = [("float8_e4m3fn", "tensor", "float8_e4m3fn"),
             ("int8", "token", "int8"),
             ("int8", "token", None)]
    for dt, ks, qdt in cases:
        kq, vq = jax.block_until_ready(jax.jit(functools.partial(
            quantize_kv_cache, kv_dtype=dt, kv_scale=ks))(k, v))
        kf, vf = qarray.dequantize(kq), qarray.dequantize(vq)
        qf = (q.astype(jnp.float32) * sm) if qdt is None else \
            qarray.dequantize(qarray.quantize(
                q.astype(jnp.float32) * sm, jnp.dtype(qdt), axis=-1))
        want, _ = jax.block_until_ready(jax.jit(functools.partial(
            blockwise_dpa, scale=1.0, chunk=1024))(qf, kf, vf))
        tag = f"{dt}.{ks}" + (".wonly" if qdt is None else "") + \
            f".d{d}.n{n}"
        fn = jax.jit(functools.partial(serving_flash_attention, q_dtype=qdt))
        try:
            got = jax.block_until_ready(fn(q, kq, vq))
        except Exception as e:  # noqa: BLE001
            row(tag=tag, error=str(e)[:160])
            continue
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - want.astype(jnp.float32))))
        if not err <= 1e-2:
            row(tag=tag, error=f"gate {err}")
            continue
        t = time_fn(fn, q, kq, vq, iters=10)
        row(tag=tag, ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2),
            err=round(err, 5))
        del kq, vq, want


def main():
    sweep(4, 8, 8192, 128)
    sweep(1, 8, 32768, 128)
    sweep(4, 8, 8192, 64)   # transposed serving path


if __name__ == "__main__":
    main()
