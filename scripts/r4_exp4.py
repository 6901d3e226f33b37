"""Round-4 experiment 4: band-kernel floor decomposition (VERDICT item 3).

DESIGN §20 decomposed the DENSE serving kernel's floor by deleting one
pass at a time (isolate=). This runs the same isolation-kernel treatment
on the BAND forward (ops/flash.py:_fwd_kernel) at the shipped band
default — sliding w=1025 (radius 512) @ n=8192, d=128, bq512/bkv1024/
bhb8 — so the 2.24 ms → ~1.5 ms gap vs the covered-FLOPs ideal stops
being an extrapolation from dense tiles.

Passes measured (cumulative deletions are NOT used — each row deletes one
term against the full kernel, like §20):
  full      : the shipped kernel
  nomask    : edge-tile bias/mask work deleted (interior-path everywhere)
  noexp     : exp2 -> subtract+scale
  nosum     : l reduction deleted
  dots      : bare QK->PV dot chain (the MXU floor at this tile shape)

Also swept: d=64 band rows (VERDICT item 6's second half) and a deeper
bh-packing probe at b=4 (bhb 8 -> 16 needs bh=32 divisible: yes).

Writes logs/r4_exp4.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import time_fn
from tpu_flash.ops.flash import flash_attention, force_bh_block, force_isolate
from tpu_flash.ops.oracle import blockwise_dpa

LOG = open("/root/repo/logs/r4_exp4.jsonl", "a")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


def covered_flops(b, h, n, d, w):
    # per query row: min(w, n) keys; QK^T + PV, 2 flops/MAC each
    per_row = min(w, n)
    return 4 * b * h * n * per_row * d


def run_case(tag, sched, radius, b, h, n, d, bq, bkv, bhb, iters=20,
             decompose=True):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    w = 2 * radius + 1
    fl = covered_flops(b, h, n, d, w)
    # gate the FULL kernel against the blockwise oracle before timing
    fn = jax.jit(functools.partial(
        flash_attention, schedule=sched, radius=radius,
        block_q=bq, block_kv=bkv))
    with force_bh_block(bhb):
        try:
            got = jax.block_until_ready(fn(q, k, v))
        except Exception as e:  # noqa: BLE001 — incl. VmemInfeasibleError
            row(tag=f"{tag}.full", error=str(e)[:160])
            return
        want, _ = jax.block_until_ready(jax.jit(functools.partial(
            blockwise_dpa, window_size=w, wrap=(sched == "circulant"),
            chunk=1024))(q, k, v))
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - want.astype(jnp.float32))))
        assert err <= 5e-3, f"{tag}: gate {err}"
        # d<=64 routes to the transposed kernel, which has no isolate
        # plumbing — only the full row is meaningful there.
        isos = ("", "nomask", "noexp", "nosum", "dots") if decompose \
            else ("",)
        for iso in isos:
            with force_isolate(iso):
                fn_i = jax.jit(functools.partial(
                    flash_attention, schedule=sched, radius=radius,
                    block_q=bq, block_kv=bkv))
                try:
                    t = time_fn(fn_i, q, k, v, iters=iters)
                except Exception as e:  # noqa: BLE001
                    row(tag=f"{tag}.{iso or 'full'}", error=str(e)[:160])
                    continue
            kw = dict(ms=round(t * 1e3, 3),
                      tflops_covered=round(fl / t / 1e12, 2))
            if not iso:
                kw["err"] = round(err, 6)
            row(tag=f"{tag}.{iso or 'full'}", **kw)


def main():
    b, h, n = 4, 8, 8192
    # The decomposition of the shipped default (512/1024/bhb8, first log
    # block) accounts its 2.36 ms fully: pure-dot 1.50 + mask 0.33 +
    # max ~0.32 + l-sum 0.20 + exp2 0.01. The dot floor itself is 2.1x
    # the 0.70 ms covered-FLOPs ideal — TILE GEOMETRY: 1024-wide aligned
    # kv tiles cover a 1536-wide band span (inflation 2.5x); 512-wide
    # tiles cover it exactly (1.5x) at the SAME max_kv_steps=3. Sweep the
    # geometry matrix:
    for bq in (256, 512, 1024):
        for bkv in (512, 1024):
            for bhb in (4, 8):
                run_case(
                    f"sliding.w1025.d128.bq{bq}.bkv{bkv}.bhb{bhb}",
                    "local", 512, b, h, n, 128, bq, bkv, bhb,
                    decompose=False)
    # decompose the geometry winner (512/512/bhb8 by the floor model)
    run_case("sliding.w1025.d128.bq512.bkv512.bhb8.decomp", "local", 512,
             b, h, n, 128, 512, 512, 8)
    # circulant at the shipped default and at the geometry winner
    run_case("circulant.w1025.d128.bq512.bkv1024.bhb8", "circulant", 512,
             b, h, n, 128, 512, 1024, 8, decompose=False)
    run_case("circulant.w1025.d128.bq512.bkv512.bhb8", "circulant", 512,
             b, h, n, 128, 512, 512, 8, decompose=False)
    # d=64 band rows (VERDICT item 6: 17-23 covered today; transposed path)
    run_case("sliding.w1025.d64.bq512.bkv1024", "local", 512,
             b, h, n, 64, 512, 1024, None, decompose=False)
    run_case("sliding.w1025.d64.bq512.bkv512", "local", 512,
             b, h, n, 64, 512, 512, None, decompose=False)
    run_case("sliding.w1025.d64.bq1024.bkv1024", "local", 512,
             b, h, n, 64, 1024, 1024, None, decompose=False)
    run_case("sliding.w1025.d64.bq1024.bkv2048", "local", 512,
             b, h, n, 64, 1024, 2048, None, decompose=False)


if __name__ == "__main__":
    main()
