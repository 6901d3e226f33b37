"""Sequence-sharded decode: paged KV split across a mesh axis, merged
with the (o, lse) algebra.

The BASELINE north star asks for ring-attention DECODE with the KV-cache
sharded over hosts. At decode there is nothing to rotate — each device holds
a contiguous slice of the history in its own paged cache, attends its local
pages, and the partial results merge with the same associative rule the
reference derived for column tiles (src/dense.jl:82-89) and ring prefill
uses per hop (parallel/ring.py:merge_partials):

    o = Σ_shard o_s · exp(lse_s − lse_total),   lse_total = log Σ exp(lse_s)

One ``psum`` each for the weighted outputs and the normalizer — both riding
ICI — instead of gathering K/V. Empty shards contribute lse = −inf (the
paged kernel's masked-row epilogue), i.e. weight 0: growth only ever
touches the LAST shard's cache, earlier shards stay read-only.

Use inside shard_map: each rank passes its LOCAL cache shard; the new
token's K/V append targets the shard whose ``owns_append`` flag is set.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from tpu_flash.ops.paged import paged_attention


def merge_shard_partials(o, lse, axis_name: str):
    """Merge per-shard attention partials across ``axis_name``.

    o: (B, H, D) f32-able; lse: (B, H) natural-log units, -inf for empty
    shards. Returns the exact global attention output.
    """
    o32 = o.astype(jnp.float32)
    m = lax.pmax(lse, axis_name)
    # fully-empty rows (all shards -inf): weight 0 everywhere, output 0
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w = jnp.where(jnp.isneginf(lse), 0.0, jnp.exp(lse - m_safe))
    denom = lax.psum(w, axis_name)
    num = lax.psum(o32 * w[..., None], axis_name)
    return (num / jnp.maximum(denom, 1e-30)[..., None]).astype(o.dtype)


def sharded_paged_attention(
    q: jnp.ndarray,
    cache,  # local PagedKVCache shard
    slots: jnp.ndarray,
    axis_name: str,
    *,
    new_kv=None,
    owns_append: Optional[jnp.ndarray] = None,
    radius: Optional[int] = None,
    scale: Optional[float] = None,
    pages_bound: Optional[int] = None,
    interpret: Optional[bool] = None,
):
    """Decode attention over a sequence-sharded paged cache (call inside
    shard_map over ``axis_name``).

    Each rank's ``cache`` holds a contiguous slice of every sequence's
    history (its ``lengths`` count only local tokens). ``new_kv``, when
    given, is appended ONLY on the rank whose ``owns_append`` (scalar bool,
    default ``axis_index == n_shards-1``) is true; other ranks attend their
    frozen slice. Returns ``out`` (and the updated local cache when
    appending).
    """
    if new_kv is None:
        o, lse = paged_attention(
            q, cache, slots, radius=radius, scale=scale,
            pages_bound=pages_bound, return_lse=True, interpret=interpret,
        )
        return merge_shard_partials(o, lse, axis_name)

    if owns_append is None:
        # default: the LAST shard holds each sequence's growing tail
        owns_append = lax.axis_index(axis_name) == lax.axis_size(axis_name) - 1

    # One lax.cond, branch chosen per rank at runtime (SPMD traces one
    # program; the HLO conditional executes exactly ONE branch on each
    # core). A where-merge of two pallas calls would keep the pre-append
    # page pool alive alongside the appended one — a full pool copy per
    # layer per step on every rank.
    import dataclasses

    def _flat(c):
        parts = [c.k_pages, c.v_pages, c.lengths]
        if c.k_scales is not None:
            parts += [c.k_scales, c.v_scales]
        return tuple(parts)

    def _append_branch(q, cache, slots):
        o, lse, c2 = paged_attention(
            q, cache, slots, new_kv=new_kv, radius=radius, scale=scale,
            pages_bound=pages_bound, return_lse=True, interpret=interpret,
        )
        return (o, lse) + _flat(c2)

    def _frozen_branch(q, cache, slots):
        o, lse = paged_attention(
            q, cache, slots, radius=radius, scale=scale,
            pages_bound=pages_bound, return_lse=True, interpret=interpret,
        )
        return (o, lse) + _flat(cache)

    res = lax.cond(owns_append, _append_branch, _frozen_branch,
                   q, cache, slots)
    o, lse, kp, vp, ln = res[:5]
    kw = dict(k_pages=kp, v_pages=vp, lengths=ln)
    if cache.k_scales is not None:
        kw["k_scales"], kw["v_scales"] = res[5], res[6]
    cache = dataclasses.replace(cache, **kw)
    out = merge_shard_partials(o, lse, axis_name)
    return out, cache
