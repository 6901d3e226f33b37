"""Round-4 experiment 7: kv-resident upcast staging A/B.

DESIGN §20 measured the fp8 serving floor's dominant term as the
e4m3→bf16 K/V upcast re-run once per Q BLOCK (~1.07 ms of the 7.06 ms
total at bq1024, 8k). r4_exp3/r4_exp5 mapped the big-tile remedy to its
VMEM boundary: bq4096 (2 re-upcasts) = 170.5 is the feasible argmax and
bq8192 (1 re-upcast) compiles at a 126 MB grant but runs SLOWER (132).

``kv_resident=True`` (quant/serving_attn.py) attacks the term directly:
q-sweep 0 stages each kv step's upcast result into persistent VMEM
scratch; q sweeps > 0 reuse it — (I−1)/I of the upcast deleted at SMALL
q blocks, which keeps bh packing feasible as well (the two remedies were
VMEM-exclusive). This A/Bs resident vs not over the promising corner of
the r4_exp3 grid for fp8-tensor / fp8-token / weight-only-int8 (+ int8
V-cast-only), 8k and 32k, gated against the blockwise oracle.

Writes logs/r4_exp7.jsonl.
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
from tpu_flash.ops.vmem import MB, VmemInfeasibleError, estimate_fwd_vmem
from tpu_flash.quant import qarray
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r4_exp7.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


# (q_dtype, kv_scale, q_dtype_arg) — q_dtype_arg None = weight-only
CASES = [
    ("float8_e4m3fn", "tensor", "float8_e4m3fn"),
    ("float8_e4m3fn", "token", "float8_e4m3fn"),
    ("int8", "token", None),            # weight-only: bf16 Q, int8 cache
    ("int8", "token", "int8"),          # int8: only the V cast is staged
]

TILES = [
    (1024, 1024, 4),
    (1024, 2048, 4),
    (2048, 2048, 1),
    (2048, 2048, 2),
    (4096, 2048, 1),
]


def sweep(b, h, n, d):
    fl = attention_flops(b, h, n, n, d)
    sm_scale = 1.0 / float(np.sqrt(d))
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    for cache_dt, kv_scale, q_dt in CASES:
        kq, vq = jax.block_until_ready(jax.jit(functools.partial(
            quantize_kv_cache, kv_dtype=cache_dt, kv_scale=kv_scale))(k, v))
        kf, vf = qarray.dequantize(kq), qarray.dequantize(vq)
        if q_dt is None:
            qf = (q.astype(jnp.float32) * sm_scale)
        else:
            qf = qarray.dequantize(qarray.quantize(
                q.astype(jnp.float32) * sm_scale, jnp.dtype(q_dt), axis=-1))
        want, _ = jax.block_until_ready(jax.jit(functools.partial(
            blockwise_dpa, scale=1.0, chunk=1024))(qf, kf, vf))
        want = want.astype(jnp.float32)
        name = f"{cache_dt}.{kv_scale}" + (".wonly" if q_dt is None else "")
        for bq, bkv, bhb in TILES:
            for res in (False, True):
                tag = (f"{name}.bq{bq}.bkv{bkv}.bhb{bhb}"
                       f"{'.res' if res else ''}.n{n}")
                fn = jax.jit(functools.partial(
                    serving_flash_attention, q_dtype=q_dt,
                    block_q=bq, block_kv=bkv, bh_block=bhb,
                    kv_resident=res))
                try:
                    got = jax.block_until_ready(fn(q, kq, vq))
                except VmemInfeasibleError as e:
                    row(tag=tag, pruned="vmem",
                        demand_mb=round(e.demand_bytes / MB))
                    continue
                except Exception as e:  # noqa: BLE001
                    row(tag=tag, error=str(e)[:160])
                    continue
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - want)))
                if not err <= 1e-2:
                    row(tag=tag, error=f"gate {err}")
                    continue
                t = time_fn(fn, q, kq, vq, iters=10)
                row(tag=tag, ms=round(t * 1e3, 3),
                    tflops=round(fl / t / 1e12, 2), err=round(err, 5))
        del kq, vq, want, kf, vf, qf


def main():
    sweep(4, 8, 8192, 128)
    sweep(1, 8, 32768, 128)


if __name__ == "__main__":
    main()
