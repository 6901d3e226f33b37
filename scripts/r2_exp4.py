"""Round-2 experiment 4: pipelined decode kernel vs the BlockSpec pipeline.

Times ONE layer's fused append+attention at the serving shape (batch 16,
8 kv heads, d=128, seq 1024 = 16 pages of 64) with DONATED caches chained
call-to-call — the engine's steady state; non-donated calls copy the page
pools (~4 ms fake). See memory: axon tunnel donation serializes, so the
chain is enqueued undonated... no: we donate and measure the chain end to
end divided by steps (the engine's true per-step cost includes the
serialization the tunnel imposes either way).

Usage: python scripts/r2_exp4.py
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import time_fn
from tpu_flash.cache.paged_cache import CacheConfig, PagedKVCache
from tpu_flash.ops.paged import paged_attention, paged_attention_pipelined

LOG = open("/root/repo/logs/r2_exp4.jsonl", "a")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


def build(dtype, b=16, kvh=8, d=128, page=64, seq=1024):
    cfg = CacheConfig(
        num_kv_heads=kvh, head_dim=d, page_size=page,
        total_pages=b * 20 + 1, max_seqs=b, max_pages_per_seq=20,
        dtype=dtype,
    )
    cache = PagedKVCache.create(cfg)
    rng = np.random.default_rng(0)
    tables = np.zeros((b, 20), np.int32)
    for s in range(b):
        tables[s] = 1 + 20 * s + np.arange(20)
    import dataclasses
    cache = dataclasses.replace(
        cache,
        page_tables=jnp.asarray(tables),
        lengths=jnp.full((b,), seq, jnp.int32),
    )
    for s in range(b):
        k = jnp.asarray(rng.standard_normal((kvh, seq, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((kvh, seq, d)), jnp.bfloat16)
        cache = cache.write_prompt(s, k, v)
    return cfg, cache


def main():
    rng = np.random.default_rng(1)
    b, kvh, qh, d = 16, 8, 16, 128
    for dtype in ("int8", "bfloat16"):
        cfg, cache = build(dtype)
        q = jnp.asarray(rng.standard_normal((b, qh, d)), jnp.bfloat16)
        kn = jnp.asarray(rng.standard_normal((b, kvh, d)), jnp.bfloat16)
        vn = jnp.asarray(rng.standard_normal((b, kvh, d)), jnp.bfloat16)
        slots = jnp.arange(b)

        variants = [
            ("v1.pb16", jax.jit(functools.partial(
                paged_attention, pages_bound=17))),
            ("pipe.cp2", jax.jit(functools.partial(
                paged_attention_pipelined, chunk_pages=2))),
            ("pipe.cp4", jax.jit(functools.partial(
                paged_attention_pipelined, chunk_pages=4))),
            ("pipe.cp8", jax.jit(functools.partial(
                paged_attention_pipelined, chunk_pages=8))),
        ]
        for name, fn in variants:
            # correctness vs each other first
            try:
                o, _ = fn(q, cache, slots, new_kv=(kn, vn))
            except Exception as e:  # noqa: BLE001
                row(tag=f"E4.{dtype}.{name}", error=str(e)[:160])
                continue
            if name == "v1.pb16":
                o_ref = o
            else:
                err = float(jnp.max(jnp.abs(
                    o.astype(jnp.float32) - o_ref.astype(jnp.float32))))
                row(tag=f"E4.check.{dtype}.{name}", err=round(err, 5))
            # timing: attention WITHOUT append (avoids donation semantics
            # in the timing chain; append adds the same rank-1/merge work
            # to both kernels)
            fn_na = jax.jit(functools.partial(
                paged_attention if name == "v1.pb16"
                else paged_attention_pipelined,
                **({"pages_bound": 17} if name == "v1.pb16"
                   else {"chunk_pages": int(name[-1])})))
            t = time_fn(fn_na, q, cache, slots, iters=20)
            row(tag=f"E4.{dtype}.{name}", us=round(t * 1e6, 1))


if __name__ == "__main__":
    main()
