"""Round-4 experiment 5: probe the VMEM envelope's marginal band.

The r4_exp3 grid pruned configs with modeled demand in 118-127 MB —
under the 128 MB hardware VMEM but over the conservative 104 MB ceiling.
This probes them with TPU_FLASH_VMEM_CEILING_MB=126 (set below, before
the tpu_flash import) to find Mosaic's TRUE accept boundary; whatever
500s here stays pruned by the default ceiling, and a compile success
would re-calibrate the ceiling upward. bq8192/bkv2048 is the fp8
"upcast-once" config DESIGN §20 predicted wins if it ever fits.

Writes logs/r4_exp5.jsonl.
"""

import os

os.environ["TPU_FLASH_VMEM_CEILING_MB"] = "126"

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import dense_fa, force_bh_block
from tpu_flash.ops.oracle import blockwise_dpa
from tpu_flash.ops.vmem import MB, estimate_fwd_vmem
from tpu_flash.quant import qarray
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r4_exp5.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def main():
    b, h, n, d = 4, 8, 8192, 128
    fl = attention_flops(b, h, n, n, d)
    sm_scale = 1.0 / float(np.sqrt(d))
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))

    # (dtype, kv_scale, bq, bkv, bhb) — modeled demand 118-127 MB
    probes = [
        ("float8_e4m3fn", "tensor", 8192, 2048, 1),
        ("int8", "token", 8192, 2048, 1),
        ("float8_e4m3fn", "tensor", 2048, 2048, 4),
        ("bf16", None, 8192, 2048, 1),
        ("bf16", None, 4096, 2048, 2),
    ]
    for dt, kv_scale, bq, bkv, bhb in probes:
        tag = f"{dt}.bq{bq}.bkv{bkv}.bhb{bhb}.ceil126"
        if dt == "bf16":
            est = estimate_fwd_vmem(block_q=bq, block_kv=bkv, d=d, dv=d,
                                    bh_block=bhb)
            fn = jax.jit(functools.partial(
                dense_fa, block_q=bq, block_kv=bkv))
            try:
                with force_bh_block(bhb):
                    got = jax.block_until_ready(fn(q, k, v))
                    want, _ = jax.block_until_ready(jax.jit(
                        functools.partial(blockwise_dpa, chunk=1024))(
                            q, k, v))
                    err = float(jnp.max(jnp.abs(
                        got.astype(jnp.float32)
                        - want.astype(jnp.float32))))
                    t = time_fn(fn, q, k, v, iters=10)
            except Exception as e:  # noqa: BLE001
                row(tag=tag, error=str(e)[:160],
                    demand_mb=round(est.demand_bytes / MB))
                continue
        else:
            est = estimate_fwd_vmem(
                block_q=bq, block_kv=bkv, d=d, dv=d, bh_block=bhb,
                q_mode="int8" if dt == "int8" else "fp8", kv_bytes=1,
                bound_max=True, k_scaled=(kv_scale == "token"))
            kq, vq = jax.block_until_ready(jax.jit(functools.partial(
                quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
            kf, vf = qarray.dequantize(kq), qarray.dequantize(vq)
            qf = qarray.dequantize(qarray.quantize(
                q.astype(jnp.float32) * sm_scale, jnp.dtype(dt), axis=-1))
            want, _ = jax.block_until_ready(jax.jit(functools.partial(
                blockwise_dpa, scale=1.0, chunk=1024))(qf, kf, vf))
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt,
                block_q=bq, block_kv=bkv, bh_block=bhb))
            try:
                got = jax.block_until_ready(fn(q, kq, vq))
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - want.astype(jnp.float32))))
                t = time_fn(fn, q, kq, vq, iters=10)
            except Exception as e:  # noqa: BLE001
                row(tag=tag, error=str(e)[:160],
                    demand_mb=round(est.demand_bytes / MB))
                continue
        if not err <= 1e-2:
            row(tag=tag, error=f"gate {err}")
            continue
        row(tag=tag, ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2),
            err=round(err, 5), demand_mb=round(est.demand_bytes / MB),
            grant_mb=(est.grant_bytes or 0) // MB)


if __name__ == "__main__":
    main()
