"""Round-4 experiment 3: the FULL big-tile x bh-packing frontier, pruned.

VERDICT r3 items 1+2: r4_exp1/r4_exp2 produced 3 usable rows because
VMEM-infeasible configs died as raw remote-compile HTTP 500s. The demand
model (ops/vmem.py) now (a) refuses infeasible configs up front — logged
here as structured ``pruned: vmem`` rows — and (b) sizes the grant to the
config, which un-blocks the marginal ~80 MB-demand points the old 64 MB
grant killed (bq8192/bkv1024, bq4096/bkv1024/bhb2).

Sweep: bq in {1024, 2048, 4096, 8192} x bkv in {1024, 2048} x
bhb in {1, 2, 4} for fp8-tensor / int8-token serving + bf16 dense at
b=4 h=8 n=8192 d=128, then the per-dtype winners confirmed at n=32768
(b=1). Every measured row carries a max-abs err against the blockwise
O(N)-memory f32 oracle on matched-bitwidth inputs (VERDICT item 8).

Writes logs/r4_exp3.jsonl. The winners re-freeze the serving defaults
(quant/serving_attn.py) and the DESIGN SS21 table.
"""

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
from tpu_flash.ops.vmem import MB, VmemInfeasibleError, estimate_fwd_vmem
from tpu_flash.quant import qarray
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r4_exp3.jsonl", "a")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


GRID = [(bq, bkv, bhb)
        for bq in (1024, 2048, 4096, 8192)
        for bkv in (1024, 2048)
        for bhb in (1, 2, 4)]


def oracle_for(q, kq, vq, dt, sm_scale):
    """Matched-bitwidth ground truth: f32 blockwise DPA over the
    dequantized ACTUAL cache contents and an fp8/int8-grid-rounded Q
    (bench.py's gate recipe)."""
    kf, vf = qarray.dequantize(kq), qarray.dequantize(vq)
    qf = qarray.dequantize(qarray.quantize(
        q.astype(jnp.float32) * sm_scale, jnp.dtype(dt), axis=-1))
    want, _ = jax.block_until_ready(jax.jit(functools.partial(
        blockwise_dpa, scale=1.0, chunk=1024))(qf, kf, vf))
    return want.astype(jnp.float32)


def sweep(b, h, n, d, grid, confirm=False):
    fl = attention_flops(b, h, n, n, d)
    sm_scale = 1.0 / float(np.sqrt(d))
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    suffix = f".n{n}" if confirm else ""
    best = {}

    for dt, kv_scale in [("float8_e4m3fn", "tensor"), ("int8", "token")]:
        kq, vq = jax.block_until_ready(jax.jit(functools.partial(
            quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
        want = oracle_for(q, kq, vq, dt, sm_scale)
        for bq, bkv, bhb in grid:
            if (b * h) % bhb:
                continue
            tag = f"{dt}.bq{bq}.bkv{bkv}.bhb{bhb}{suffix}"
            est = estimate_fwd_vmem(
                block_q=min(bq, n), block_kv=min(bkv, n), d=d, dv=d,
                bh_block=bhb, q_mode="int8" if dt == "int8" else "fp8",
                kv_bytes=1, bound_max=True, k_scaled=(kv_scale == "token"))
            if not est.feasible:
                row(tag=tag, pruned="vmem",
                    demand_mb=round(est.demand_bytes / MB))
                continue
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt,
                block_q=bq, block_kv=bkv, bh_block=bhb))
            try:
                got = jax.block_until_ready(fn(q, kq, vq))
            except VmemInfeasibleError as e:
                row(tag=tag, pruned="vmem", demand_mb=round(
                    e.demand_bytes / MB))
                continue
            except Exception as e:  # noqa: BLE001
                row(tag=tag, error=str(e)[:160],
                    grant_mb=(est.grant_bytes or 0) // MB,
                    demand_mb=round(est.demand_bytes / MB))
                continue
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
            if not err <= 1e-2:
                row(tag=tag, error=f"gate {err}")
                continue
            t = time_fn(fn, q, kq, vq, iters=10)
            tf = fl / t / 1e12
            row(tag=tag, ms=round(t * 1e3, 3), tflops=round(tf, 2),
                err=round(err, 5),
                grant_mb=(est.grant_bytes or 16 * MB) // MB)
            if tf > best.get(dt, (0,))[0]:
                best[dt] = (tf, (bq, bkv, bhb))
        del kq, vq, want

    want_bf, _ = jax.block_until_ready(jax.jit(functools.partial(
        blockwise_dpa, chunk=1024))(q, k, v))
    want_bf = want_bf.astype(jnp.float32)
    for bq, bkv, bhb in grid:
        if (b * h) % bhb:
            continue
        tag = f"bf16.bq{bq}.bkv{bkv}.bhb{bhb}{suffix}"
        est = estimate_fwd_vmem(block_q=min(bq, n), block_kv=min(bkv, n),
                                d=d, dv=d, bh_block=bhb)
        if not est.feasible:
            row(tag=tag, pruned="vmem",
                demand_mb=round(est.demand_bytes / MB))
            continue
        fn = jax.jit(functools.partial(dense_fa, block_q=bq, block_kv=bkv))
        try:
            with force_bh_block(bhb):
                got = jax.block_until_ready(fn(q, k, v))
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - want_bf)))
                t = time_fn(fn, q, k, v, iters=10)
        except VmemInfeasibleError as e:
            row(tag=tag, pruned="vmem", demand_mb=round(e.demand_bytes / MB))
            continue
        except Exception as e:  # noqa: BLE001
            row(tag=tag, error=str(e)[:160],
                demand_mb=round(est.demand_bytes / MB))
            continue
        tf = fl / t / 1e12
        row(tag=tag, ms=round(t * 1e3, 3), tflops=round(tf, 2),
            err=round(err, 5))
        if tf > best.get("bf16", (0,))[0]:
            best["bf16"] = (tf, (bq, bkv, bhb))
    return best


def main():
    best = sweep(4, 8, 8192, 128, GRID)
    for dt, (tf, cfg) in sorted(best.items()):
        row(tag=f"best.{dt}", tflops=tf, bq=cfg[0], bkv=cfg[1], bhb=cfg[2])
    # confirm the per-dtype winners at the 32k BASELINE shape
    confirm_grid = sorted({cfg for _, cfg in best.values()})
    sweep(1, 8, 32768, 128, confirm_grid, confirm=True)


if __name__ == "__main__":
    main()
