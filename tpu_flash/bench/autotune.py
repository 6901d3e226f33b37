"""Block-size autotuner — measured, cached, per device kind.

The reference hard-coded its cache-size constant and its own sweep shows
4-30× swings from mis-sizing (BASELINE.md cache sweep, SURVEY.md §5). Here
block sizes are explicit knobs with measured defaults; this module picks
them empirically for a given shape and persists the result, so deployments
can tune once per (device, shape) and ship the table.

Usage::

    from tpu_flash.bench.autotune import tune_attention_blocks
    bq, bkv = tune_attention_blocks(n=8192, d=128)          # measures once
    o = tf.dense_fa(q, k, v, block_q=bq, block_kv=bkv)      # cached after
"""

from __future__ import annotations

import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import device_peaks, time_fn
from tpu_flash.ops.vmem import VmemInfeasibleError

_DEFAULT_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".tpu_flash_autotune.json",
)

_CANDIDATES = [(bq, bkv)
               for bq in (256, 512, 1024)
               for bkv in (512, 1024, 2048, 4096)]


def _load(path: str) -> dict:
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return {}
    return {}


def tune_attention_blocks(
    n: int,
    d: int,
    *,
    dtype: str = "bfloat16",
    schedule: str = "dense",
    radius: int = 0,
    section: int = 0,
    batch_heads: int = 8,
    candidates=None,
    cache_path: Optional[str] = _DEFAULT_CACHE,
    iters: int = 5,
) -> tuple[int, int]:
    """Measure candidate (block_q, block_kv) pairs for an attention shape
    and return the fastest; results persist in a JSON table keyed by
    device kind + shape."""
    from tpu_flash.ops.flash import flash_attention

    kind = device_peaks()["kind"]
    key = (f"{kind}|{schedule}|n={n}|d={d}|{dtype}|r={radius}"
           f"|sec={section}|bh={batch_heads}")
    table = _load(cache_path) if cache_path else {}
    if key in table:
        bq, bkv = table[key]["block_q"], table[key]["block_kv"]
        return bq, bkv

    rng = np.random.default_rng(0)
    shape = (1, batch_heads, n, d)
    q = jnp.asarray(rng.standard_normal(shape), jnp.dtype(dtype))
    k = jnp.asarray(rng.standard_normal(shape), jnp.dtype(dtype))
    v = jnp.asarray(rng.standard_normal(shape), jnp.dtype(dtype))

    from tpu_flash.ops.flash import _pick_block, force_bh_block

    # band schedules at small tiles are grid-step-latency-bound: the
    # batch-head packing factor is a real knob there (DESIGN §12), so
    # banded tunes sweep it alongside the block sizes. None = auto.
    banded = schedule in ("local", "local_causal", "circulant", "block")
    bh_opts = [None, 2, 4, 8] if banded else [None]

    best, best_t = None, float("inf")
    results = {}
    # clamp candidates the way the kernel itself would (small n collapses
    # many candidates to the same effective blocks — dedupe)
    cands = {( _pick_block(n, bq), _pick_block(n, bkv))
             for bq, bkv in (candidates or _CANDIDATES)}
    for bq, bkv in sorted(cands):
        for bhb in bh_opts:
            if bhb is not None and batch_heads % bhb:
                continue
            try:
                fn = jax.jit(functools.partial(
                    flash_attention, schedule=schedule, radius=radius,
                    section=section, block_q=bq, block_kv=bkv,
                ))
                with force_bh_block(bhb):
                    t = time_fn(fn, q, k, v, iters=iters)
            except VmemInfeasibleError:
                # predicted before lowering (ops/vmem.py) — zero queue
                # time wasted; record the prune so the table shows WHY
                # the candidate is absent rather than silently skipping.
                results[f"{bq}x{bkv}" + (f"xbh{bhb}" if bhb else "")] = (
                    "pruned: vmem")
                continue
            except Exception:  # noqa: BLE001 — invalid configs just lose
                continue
            results[f"{bq}x{bkv}" + (f"xbh{bhb}" if bhb else "")] = round(
                t * 1e6, 1)
            if t < best_t:
                best, best_t = (bq, bkv, bhb), t
    if best is None:
        raise RuntimeError(f"no candidate block size compiled for {key}")

    if cache_path:
        table[key] = {
            "block_q": best[0], "block_kv": best[1],
            "bh_block": best[2],
            "seconds": best_t, "all_us": results,
        }
        with open(cache_path, "w") as f:
            json.dump(table, f, indent=1, sort_keys=True)
    return best[0], best[1]
