"""Tokens/s vs sequence shards on the virtual CPU mesh (BASELINE #5 stand-in).

Real multi-chip hardware is unavailable, so this measures the *scaling
shape* of the sequence-sharded decode path — per-shard attention + the
lse shard merge + the tail-shard append — over S ∈ {1, 2, 4, 8} virtual
devices. Absolute numbers are CPU wall-clock and NOT TPU-representative;
the quantity of interest is how step time grows with S at fixed total
context (collective/dispatch overhead) and how it shrinks with S at
fixed per-shard context (the long-context regime the sharding exists
for; cf. /root/reference's multi-node ambitions, SURVEY §5).

Run:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
    python scripts/r2_shards_scaling.py

Writes logs/shards_scaling.jsonl; figures via tpu_flash.bench.figures.
"""

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import numpy as np
from jax.sharding import Mesh

from tpu_flash.cache.paged_cache import CacheConfig
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, Request
from tpu_flash.serving.seq_engine import SeqShardedEngine

LOG_PATH = "/root/repo/logs/shards_scaling.jsonl"

# Interpret-mode Pallas on CPU is ~1000x device speed: keep shapes at
# test-suite scale (a 1024-token prefill at dim 256 x 4 layers never
# finished in 30 min). The scaling SHAPE across shards is the claim.
_MCFG = tfm.ModelConfig(
    vocab_size=256,
    dim=128,
    num_layers=2,
    num_q_heads=4,
    num_kv_heads=2,
    head_dim=32,
    block_q=128,
    block_kv=128,
)

BATCH = 4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _engine(params, shards, total_pages, cache_dtype):
    ccfg = CacheConfig(
        num_kv_heads=_MCFG.num_kv_heads,
        head_dim=_MCFG.head_dim,
        page_size=16,
        total_pages=total_pages,
        max_seqs=BATCH * 2,
        max_pages_per_seq=total_pages // BATCH,
        dtype=cache_dtype,
    )
    ecfg = EngineConfig(max_batch=BATCH)
    if shards == 1:
        return Engine(params, _MCFG, ccfg, ecfg)
    mesh = Mesh(np.array(jax.devices()[:shards]), ("seq",))
    return SeqShardedEngine(params, _MCFG, ccfg, ecfg, mesh=mesh)


def run_case(params, shards, prompt_len, cache_dtype, rows):
    """Admit BATCH prompts of prompt_len, then time steady-state decode."""
    pages_for = (prompt_len + 32) // 16 + 2
    eng = _engine(params, shards, max(pages_for * BATCH + 8, 64), cache_dtype)
    rng = np.random.default_rng(0)
    for rid in range(BATCH):
        eng.submit(Request(
            rid=rid,
            prompt=list(rng.integers(1, 250, prompt_len)),
            max_new_tokens=32,  # > warmup(3) + timed(5 repeats x 4 steps)
        ))
    eng.step()          # admission + prefill + first decode (compiles)
    for _ in range(2):  # warm the decode dispatch path
        eng.step()
    # median over repeats: single-shot CPU wall-clock produced a
    # non-monotonic curve (117/67/99/74 tok/s at 1/2/4/8 shards) that
    # undermined the round-2 scaling claim (VERDICT r2 item 8)
    n_steps, repeats = 4, 5
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            eng.step()
        samples.append((time.perf_counter() - t0) / n_steps)
    dt = sorted(samples)[len(samples) // 2]
    row = {
        "shards": shards,
        "prompt_len": prompt_len,
        "dtype": cache_dtype,
        "ms_step": round(dt * 1e3, 2),
        "ms_step_spread": [round(s * 1e3, 2) for s in sorted(samples)],
        "tok_s": round(BATCH / dt, 1),
    }
    rows.append(row)
    with open(LOG_PATH, "a") as f:  # incremental: partial runs keep rows
        f.write(json.dumps(row) + "\n")
    log("  " + json.dumps(row))


def main():
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    rows = []
    if os.path.exists(LOG_PATH):
        os.remove(LOG_PATH)

    log("=== fixed TOTAL context (overhead regime): 128 tokens ===")
    for s in (1, 2, 4, 8):
        run_case(params, s, 128, "bfloat16", rows)

    log("=== fixed PER-SHARD context (long-context regime): 128/shard ===")
    for s in (2, 4, 8):
        run_case(params, s, 128 * s, "bfloat16", rows)

    log("=== int8 cache, fixed total 128 ===")
    for s in (1, 2, 4):
        run_case(params, s, 128, "int8", rows)

    log(f"wrote {len(rows)} rows to {LOG_PATH}")


if __name__ == "__main__":
    main()
