"""Sequence-sharded decode: per-shard paged attention merged with the
(o, lse) algebra must equal single-cache attention over the full history."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tpu_flash.cache.paged_cache import CacheConfig, PagedKVCache
from tpu_flash.ops.paged import paged_attention
from tpu_flash.parallel.ring_decode import sharded_paged_attention

_CFG = dict(num_kv_heads=2, head_dim=32, page_size=16, total_pages=32,
            max_seqs=4, max_pages_per_seq=4)


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("seq",))


def _fill(cache, rng, slots_n, tokens):
    """Append `tokens` (list of (k, v) pairs (S, kh, d)) to slots 0..S-1."""
    slots = jnp.arange(slots_n, dtype=jnp.int32)
    for k, v in tokens:
        cache = cache.append(slots, k, v)
    return cache


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_sharded_decode_matches_single_cache(dtype):
    mesh = _mesh(2)
    rng = np.random.default_rng(0)
    cfg = CacheConfig(dtype=dtype, **_CFG)
    S, kh, d = 2, 2, 32
    n0, n1 = 12, 7  # shard token counts (19 total)

    toks = [(jnp.asarray(rng.standard_normal((S, kh, d)), jnp.float32),
             jnp.asarray(rng.standard_normal((S, kh, d)), jnp.float32))
            for _ in range(n0 + n1)]
    pt = jnp.zeros((4, 4), jnp.int32).at[:, :2].set(
        jnp.asarray(np.arange(1, 9).reshape(4, 2), jnp.int32))

    def fresh():
        c = PagedKVCache.create(cfg)
        return dataclasses.replace(c, page_tables=pt,
                                   lengths=jnp.zeros((4,), jnp.int32))

    # reference: one cache with the full history
    full = _fill(fresh(), rng, S, toks)
    q = jnp.asarray(rng.standard_normal((S, 4, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((S, kh, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((S, kh, d)), jnp.float32)
    slots = jnp.arange(S, dtype=jnp.int32)
    o_ref, ref_cache = paged_attention(q, full, slots, new_kv=(kn, vn))

    # sharded: shard 0 holds tokens [0, n0), shard 1 holds [n0, n0+n1)
    c0 = _fill(fresh(), rng, S, toks[:n0])
    c1 = _fill(fresh(), rng, S, toks[n0:])
    stack = jax.tree_util.tree_map(
        lambda a, b: jnp.stack([a, b]), c0, c1)

    def local(q, cache, kn, vn):
        cache = jax.tree_util.tree_map(lambda x: x[0], cache)  # drop shard axis
        out, cache = sharded_paged_attention(
            q[0], cache, slots, "seq", new_kv=(kn[0], vn[0]))
        return out[None], jax.tree_util.tree_map(lambda x: x[None], cache)

    specs_cache = dataclasses.replace(
        stack,
        k_pages=P("seq"), v_pages=P("seq"),
        k_scales=P("seq") if cfg.quantized else None,
        v_scales=P("seq") if cfg.quantized else None,
        page_tables=P("seq"), lengths=P("seq"),
    )
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("seq"), specs_cache, P("seq"), P("seq")),
        out_specs=(P("seq"), specs_cache),
        check_vma=False,
    )
    qs = jnp.stack([q, q])  # replicated per shard (spec splits the stack)
    o_sh, new_stack = fn(qs, stack, jnp.stack([kn, kn]), jnp.stack([vn, vn]))
    # both shards return the identical merged output
    assert jnp.allclose(o_sh[0], o_sh[1], atol=1e-5)
    err = float(jnp.max(jnp.abs(o_sh[0].astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    assert err < 2e-2  # bf16 q cast in the kernel

    # the append landed on shard 1 only, at local position n1
    assert int(new_stack.lengths[0, 0]) == n0
    assert int(new_stack.lengths[1, 0]) == n1 + 1


@pytest.mark.parametrize("dtype", ["float32", "int8", "int4"])
@pytest.mark.parametrize("shards", [2, 4, 8])
def test_sharded_decode_multiway(dtype, shards):
    """S-way sharded decode (incl. INT4 caches, 4–8 shards — BASELINE #5)
    equals single-cache attention over the identical quantized history."""
    mesh = _mesh(shards)
    rng = np.random.default_rng(3)
    cfg = CacheConfig(dtype=dtype, **_CFG)
    B, kh, d = 2, 2, 32
    total = 29
    # uneven split, some shards empty for S=8
    cuts = np.linspace(0, total, shards + 1).astype(int)
    counts = np.diff(cuts)

    toks = [(jnp.asarray(rng.standard_normal((B, kh, d)), jnp.float32),
             jnp.asarray(rng.standard_normal((B, kh, d)), jnp.float32))
            for _ in range(total)]
    pt = jnp.zeros((4, 4), jnp.int32).at[:, :3].set(
        jnp.asarray(np.arange(1, 13).reshape(4, 3), jnp.int32))

    def fresh():
        c = PagedKVCache.create(cfg)
        return dataclasses.replace(c, page_tables=pt,
                                   lengths=jnp.zeros((4,), jnp.int32))

    full = _fill(fresh(), rng, B, toks)
    q = jnp.asarray(rng.standard_normal((B, 4, d)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, kh, d)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, kh, d)), jnp.float32)
    slots = jnp.arange(B, dtype=jnp.int32)
    o_ref, _ = paged_attention(q, full, slots, new_kv=(kn, vn))

    shard_caches = [
        _fill(fresh(), rng, B, toks[cuts[j]:cuts[j + 1]])
        for j in range(shards)
    ]
    stack = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *shard_caches)

    def local(q, cache, kn, vn):
        cache = jax.tree_util.tree_map(lambda x: x[0], cache)
        out, cache = sharded_paged_attention(
            q[0], cache, slots, "seq", new_kv=(kn[0], vn[0]))
        return out[None], jax.tree_util.tree_map(lambda x: x[None], cache)

    specs_cache = dataclasses.replace(
        stack,
        k_pages=P("seq"), v_pages=P("seq"),
        k_scales=P("seq") if cfg.quantized else None,
        v_scales=P("seq") if cfg.quantized else None,
        page_tables=P("seq"), lengths=P("seq"),
    )
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("seq"), specs_cache, P("seq"), P("seq")),
        out_specs=(P("seq"), specs_cache),
        check_vma=False,
    )
    rep = lambda x: jnp.broadcast_to(x[None], (shards, *x.shape))
    o_sh, new_stack = fn(rep(q), stack, rep(kn), rep(vn))
    for j in range(1, shards):
        assert jnp.allclose(o_sh[0], o_sh[j], atol=1e-5)
    err = float(jnp.max(jnp.abs(o_sh[0].astype(jnp.float32)
                                - o_ref.astype(jnp.float32))))
    assert err < 2e-2, err  # same quantized history; bf16 q cast noise only

    for j in range(shards):
        want = int(counts[j]) + (1 if j == shards - 1 else 0)
        assert int(new_stack.lengths[j, 0]) == want
