"""Round-3 experiment 4: batch-head packing on the serving kernel.

DESIGN §20's decomposition leaves two exposures over the dot floor at
8k d=128: int8's ~0.9 ms serial softmax chain (kv_split measurably
fails to hide it — logs/r2_exp5.jsonl A) and fp8's per-q-block upcast
(amortized by big Q blocks — logs/r3_exp3.jsonl). The bf16 kernel hides
the same VPU exposure by software-pipelining independent batch·head
rows in one grid step (ops/flash.py:_fwd_kernel, bh_block): row bb+1's
QKᵀ runs on the MXU under row bb's exp2/PV chain on the VPU. This A/Bs
that staging on the SERVING kernel: bh_block ∈ {1, 2, 4} × block_q ∈
{1024, 2048} for int8 / fp8-tensor / bf16-dense-equivalent (raw mode),
gated bitwise against the unpacked kernel per config.

Writes logs/r3_exp4.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r3_exp4.jsonl", "a")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


def main():
    b, h, n, d = 4, 8, 8192, 128
    fl = attention_flops(b, h, n, n, d)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))

    if len(sys.argv) > 1 and sys.argv[1] == "C":
        # bf16 dense: the auto heuristic caps packing at a 2 MB score tile
        # (bhb=1 at the 8k bench tiles). The serving-kernel A/B (mode A/B)
        # shows deeper packing hides softmax exposure — check whether the
        # same holds for the bf16 kernel before raising its cap.
        from tpu_flash.ops.flash import dense_fa, force_bh_block
        base = None
        for bq, bkv, bhb in [(1024, 2048, 1), (1024, 2048, 2),
                             (1024, 2048, 4), (2048, 2048, 2),
                             (1024, 1024, 4), (2048, 1024, 4)]:
            tag = f"bf16_dense.bq{bq}.bkv{bkv}.bhb{bhb}"
            with force_bh_block(bhb):
                fn = jax.jit(functools.partial(
                    dense_fa, block_q=bq, block_kv=bkv))
                try:
                    got = jax.block_until_ready(fn(q, k, v))
                except Exception as e:  # noqa: BLE001
                    row(tag=tag, error=str(e)[:160])
                    continue
                if base is None:
                    base = got
                err = float(jnp.max(jnp.abs(
                    got.astype(jnp.float32) - base.astype(jnp.float32))))
                t = time_fn(fn, q, k, v, iters=10)
            row(tag=tag, ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2), err=round(err, 5))
        return

    cases = []
    for dt, kv_scale in [("int8", "token"), ("float8_e4m3fn", "tensor")]:
        kq, vq = jax.block_until_ready(jax.jit(functools.partial(
            quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
        cases.append((dt, kq, vq))

    grids = [(1024, 2048, 1), (1024, 2048, 2), (1024, 2048, 4),
             (2048, 2048, 2), (1024, 4096, 2)]
    if len(sys.argv) > 1 and sys.argv[1] == "D":
        # head-to-head default decision, alternating in ONE process so
        # tunnel/process noise (~6% across runs) cancels: the big-tile
        # default vs the packed candidate, 3 interleaved repeats each.
        dt, kq, vq = cases[0]  # int8
        fns = {}
        for bq, bkv, bhb in [(4096, 2048, 1), (1024, 2048, 4)]:
            fns[f"bq{bq}.bhb{bhb}"] = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt,
                block_q=bq, block_kv=bkv, bh_block=bhb))
        for fn in fns.values():
            jax.block_until_ready(fn(q, kq, vq))
        for rep in range(3):
            for name, fn in fns.items():
                t = time_fn(fn, q, kq, vq, iters=10)
                row(tag=f"D.int8.{name}.rep{rep}", ms=round(t * 1e3, 3),
                    tflops=round(fl / t / 1e12, 2))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "B":
        # round 2: combine packing with upcast amortization. Total upcast
        # work is n²·d/bq — INDEPENDENT of bkv — so shrinking bkv buys
        # score-tile VMEM for bigger bq·bhb products at zero upcast cost.
        grids = [(512, 2048, 8), (1024, 1024, 4), (2048, 1024, 4),
                 (4096, 1024, 2), (2048, 1024, 2), (1024, 1024, 8)]
    for dt, kq, vq in cases:
        base = None
        for bq, bkv, bhb in grids:
            tag = f"{dt}.bq{bq}.bkv{bkv}.bhb{bhb}"
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt,
                block_q=bq, block_kv=bkv, bh_block=bhb))
            try:
                got = jax.block_until_ready(fn(q, kq, vq))
            except Exception as e:  # noqa: BLE001
                row(tag=tag, error=str(e)[:160])
                continue
            if base is None:
                base = jax.block_until_ready(jax.jit(functools.partial(
                    serving_flash_attention, q_dtype=dt, block_q=1024,
                    block_kv=2048, bh_block=1))(q, kq, vq))
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - base.astype(jnp.float32))))
            if not err <= 2.5e-2:
                row(tag=tag, error=f"gate {err}")
                continue
            t = time_fn(fn, q, kq, vq, iters=10)
            row(tag=tag, ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2), err=round(err, 5))


if __name__ == "__main__":
    main()
