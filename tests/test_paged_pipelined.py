"""Pipelined (manual double-buffered DMA) decode vs the BlockSpec-pipeline
kernel: identical cache mutations, matching attention outputs.

The v2 kernel re-casts the fused append as a rank-1 online-softmax update
(the new token never round-trips the cache) and streams pages through
`make_async_copy` chunks inside a dynamic-trip fori_loop — see
ops/paged.py `_pipe_kernel`.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.cache.paged_cache import CacheConfig, PagedKVCache
from tpu_flash.ops.paged import (
    _encode_row,
    paged_attention,
    paged_attention_pipelined,
)

RNG = np.random.default_rng(11)


def _populated_cache(dtype, lens, *, kvh=2, d=64, page=16):
    cfg = CacheConfig(
        num_kv_heads=kvh, head_dim=d, page_size=page, total_pages=64,
        max_seqs=16, max_pages_per_seq=8, dtype=dtype,
    )
    cache = PagedKVCache.create(cfg)
    b = len(lens)
    tables = np.zeros((cfg.max_seqs, cfg.max_pages_per_seq), np.int32)
    for s in range(b):
        tables[s] = 1 + 8 * s + np.arange(cfg.max_pages_per_seq)
    kp = np.array(cache.k_pages)
    vp = np.array(cache.v_pages)
    ks = np.array(cache.k_scales) if cfg.quantized else None
    vs = np.array(cache.v_scales) if cfg.quantized else None
    int4 = dtype == "int4"
    for s in range(b):
        for t in range(lens[s]):
            pg, off = tables[s, t // page], t % page
            for pool, sc_pool in ((kp, ks), (vp, vs)):
                vals, sc = _encode_row(
                    jnp.asarray(RNG.standard_normal((kvh, d)), jnp.float32),
                    quantized=cfg.quantized, int4=int4, out_dtype=pool.dtype,
                )
                pool[:, pg, off, :] = np.asarray(vals)
                if sc is not None:
                    sc_pool[:, pg, off] = np.asarray(sc)[:, 0]
    kw = dict(
        k_pages=jnp.asarray(kp), v_pages=jnp.asarray(vp),
        page_tables=jnp.asarray(tables),
        lengths=jnp.asarray(
            [lens[i] if i < b else 0 for i in range(cfg.max_seqs)], jnp.int32
        ),
    )
    if cfg.quantized:
        kw.update(k_scales=jnp.asarray(ks), v_scales=jnp.asarray(vs))
    return dataclasses.replace(cache, **kw)


@pytest.mark.parametrize("dtype", ["bfloat16", "int8", "int4", "fp8"])
@pytest.mark.parametrize("chunk_pages", [1, 2, 4])
def test_matches_v1(dtype, chunk_pages):
    lens = [37, 16, 50]
    cache = _populated_cache(dtype, lens)
    b = len(lens)
    q = jnp.asarray(RNG.standard_normal((b, 4, 64)), jnp.float32)
    slots = jnp.arange(b)
    o1 = paged_attention(q, cache, slots)
    o2 = paged_attention_pipelined(q, cache, slots, chunk_pages=chunk_pages)
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32), atol=5e-3
    )


@pytest.mark.parametrize("rank1", [False, True])
@pytest.mark.parametrize("dtype", ["bfloat16", "int8", "int4", "fp8"])
def test_append_matches_v1(dtype, rank1):
    lens = [37, 16, 50, 15]  # incl. page-boundary tail (16 → new page? no:
    # 16 % 16 == 0 → next token starts page 1; 15 → fills page 0)
    cache = _populated_cache(dtype, lens)
    b = len(lens)
    q = jnp.asarray(RNG.standard_normal((b, 4, 64)), jnp.float32)
    kn = jnp.asarray(RNG.standard_normal((b, 2, 64)), jnp.float32)
    vn = jnp.asarray(RNG.standard_normal((b, 2, 64)), jnp.float32)
    slots = jnp.arange(b)
    o1, c1 = paged_attention(q, cache, slots, new_kv=(kn, vn))
    o2, c2 = paged_attention_pipelined(
        q, cache, slots, new_kv=(kn, vn), chunk_pages=2, rank1_append=rank1
    )
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32), atol=5e-3
    )
    # cache mutations must be byte-identical (same _encode_row rounding)
    np.testing.assert_array_equal(
        np.asarray(c1.k_pages), np.asarray(c2.k_pages))
    np.testing.assert_array_equal(
        np.asarray(c1.v_pages), np.asarray(c2.v_pages))
    np.testing.assert_array_equal(
        np.asarray(c1.lengths), np.asarray(c2.lengths))
    if c1.k_scales is not None:
        # scales to 1 ulp: v2 computes the new token's scale host-side,
        # where XLA may fuse max/div differently than the v1 kernel
        np.testing.assert_allclose(
            np.asarray(c1.k_scales), np.asarray(c2.k_scales), rtol=2e-7)
        np.testing.assert_allclose(
            np.asarray(c1.v_scales), np.asarray(c2.v_scales), rtol=2e-7)


def test_banded_matches_v1():
    lens = [50, 33, 17]
    cache = _populated_cache("int8", lens)
    b = len(lens)
    q = jnp.asarray(RNG.standard_normal((b, 4, 64)), jnp.float32)
    slots = jnp.arange(b)
    o1 = paged_attention(q, cache, slots, radius=20)
    o2 = paged_attention_pipelined(q, cache, slots, radius=20, chunk_pages=2)
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32), atol=5e-3
    )


def test_lse_matches_v1():
    lens = [40, 21]
    cache = _populated_cache("int8", lens)
    b = len(lens)
    q = jnp.asarray(RNG.standard_normal((b, 4, 64)), jnp.float32)
    slots = jnp.arange(b)
    o1, lse1 = paged_attention(q, cache, slots, return_lse=True)
    o2, lse2 = paged_attention_pipelined(
        q, cache, slots, return_lse=True, chunk_pages=2
    )
    np.testing.assert_allclose(
        np.asarray(lse1), np.asarray(lse2), atol=5e-3
    )
