"""Paged KV-cache + paged decode kernel: round-trips, appends, and the
decode kernel vs the oracle over gathered (dequantized) K/V."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.cache.paged_cache import CacheConfig, PagedKVCache
from tpu_flash.ops import oracle, paged


def _rand(rng, *shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def _make_cache(dtype, kvh=2, d=64, page=16, total=64, max_seqs=4, maxp=16):
    cfg = CacheConfig(
        num_kv_heads=kvh, head_dim=d, page_size=page, total_pages=total,
        max_seqs=max_seqs, max_pages_per_seq=maxp, dtype=dtype,
    )
    cache = PagedKVCache.create(cfg)
    # simple host-side identity-ish allocation: slot s gets pages
    # [s*maxp, (s+1)*maxp) — enough for unit tests.
    tables = np.arange(max_seqs * maxp).reshape(max_seqs, maxp) % total
    return cache.assign_pages(jnp.asarray(tables))


@pytest.mark.parametrize("dtype", ["bfloat16", "float32", "int8", "int4", "fp8"])
def test_write_prompt_roundtrip(rng, dtype):
    cache = _make_cache(dtype)
    k = _rand(rng, 2, 50, 64)  # ragged (not page multiple)
    v = _rand(rng, 2, 50, 64)
    cache = cache.write_prompt(1, k, v)
    kr, vr = cache.gather_kv(1, 50)
    tol = {"bfloat16": 1e-2, "float32": 1e-6, "int8": 2e-2, "int4": 0.35,
           "fp8": 0.25}[dtype]
    np.testing.assert_allclose(kr, k, atol=tol)
    np.testing.assert_allclose(vr, v, atol=tol)
    assert int(cache.lengths[1]) == 50


@pytest.mark.parametrize("dtype", ["bfloat16", "int8", "int4", "fp8"])
def test_append_roundtrip(rng, dtype):
    cache = _make_cache(dtype)
    k0 = _rand(rng, 2, 20, 64)
    v0 = _rand(rng, 2, 20, 64)
    cache = cache.write_prompt(0, k0, v0)
    k1 = _rand(rng, 1, 2, 64)  # (B=1, kvh, d)
    v1 = _rand(rng, 1, 2, 64)
    cache = cache.append(jnp.array([0]), k1, v1)
    assert int(cache.lengths[0]) == 21
    kr, _ = cache.gather_kv(0, 21)
    tol = {"bfloat16": 1e-2, "int8": 2e-2, "int4": 0.35, "fp8": 0.25}[dtype]
    np.testing.assert_allclose(kr[:, 20], k1[0], atol=tol)
    np.testing.assert_allclose(kr[:, :20], k0, atol=tol)


@pytest.mark.parametrize("dtype", ["bfloat16", "float32", "int8", "int4", "fp8"])
def test_paged_attention_vs_oracle(rng, dtype):
    kvh, d, g = 2, 64, 4  # 8 q heads, GQA group 4
    qh = kvh * g
    cache = _make_cache(dtype, kvh=kvh, d=d)
    lens = [37, 50, 5]
    for s, n in enumerate(lens):
        cache = cache.write_prompt(s, _rand(rng, kvh, n, d), _rand(rng, kvh, n, d))

    q = _rand(rng, 3, qh, d)
    o = paged.paged_attention(q, cache, jnp.arange(3), pages_bound=8)

    tol = {"bfloat16": 3e-2, "float32": 2e-2, "int8": 3e-2, "int4": 3e-2,
           "fp8": 3e-2}[dtype]
    for s, n in enumerate(lens):
        kf, vf = cache.gather_kv(s, n)  # dequantized: matched-bitwidth oracle
        # expand kv heads to q heads (GQA)
        kq = jnp.repeat(kf[None], g, axis=0).reshape(1, qh, n, d)
        vq = jnp.repeat(vf[None], g, axis=0).reshape(1, qh, n, d)
        # note: repeat over new axis keeps grouping: head h of q maps to
        # kv head h // g — build explicitly to be safe
        kq = jnp.stack([kf[h // g] for h in range(qh)])[None]
        vq = jnp.stack([vf[h // g] for h in range(qh)])[None]
        ref, _ = oracle.dense_dpa(q[s][None, :, None, :], kq, vq)
        np.testing.assert_allclose(
            np.asarray(o[s]), np.asarray(ref[0, :, 0]), atol=tol,
            err_msg=f"slot {s}",
        )


def test_paged_attention_empty_slot(rng):
    cache = _make_cache("bfloat16")
    q = _rand(rng, 1, 8, 64)
    o = paged.paged_attention(q, cache, jnp.array([2]), pages_bound=4)
    np.testing.assert_array_equal(np.asarray(o), 0)


def test_decode_loop_append_then_attend(rng):
    """Simulated decode: append one token then attend; matches oracle causal
    attention over the full history."""
    kvh, d, qh = 2, 64, 2
    cache = _make_cache("int8", kvh=kvh, d=d)
    n0 = 10
    k_hist = _rand(rng, kvh, n0, d)
    v_hist = _rand(rng, kvh, n0, d)
    cache = cache.write_prompt(0, k_hist, v_hist)
    for step in range(3):
        knew = _rand(rng, 1, kvh, d)
        vnew = _rand(rng, 1, kvh, d)
        cache = cache.append(jnp.array([0]), knew, vnew)
        q = _rand(rng, 1, qh, d)
        o = paged.paged_attention(q, cache, jnp.array([0]), pages_bound=4)
        n = n0 + step + 1
        kf, vf = cache.gather_kv(0, n)
        ref, _ = oracle.dense_dpa(q[:, :, None, :], kf[None], vf[None])
        np.testing.assert_allclose(
            np.asarray(o[0]), np.asarray(ref[0, :, 0]), atol=3e-2
        )


@pytest.mark.parametrize("dtype", ["float32", "int8", "int4", "fp8"])
@pytest.mark.parametrize("pos0", [0, 15, 16, 31])
def test_fused_append_attention_matches_separate(rng, dtype, pos0):
    """paged_attention(new_kv=...) must be bit-identical to append() followed
    by paged_attention() — including at page boundaries and empty slots."""
    import dataclasses

    cfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                      total_pages=32, max_seqs=4, max_pages_per_seq=4,
                      dtype=dtype)
    cache = PagedKVCache.create(cfg)
    pt = jnp.asarray(np.arange(1, 17).reshape(4, 4), jnp.int32)
    cache = dataclasses.replace(cache, page_tables=pt,
                                lengths=jnp.zeros((4,), jnp.int32))
    all_slots = jnp.arange(4, dtype=jnp.int32)
    for _ in range(pos0):
        cache = cache.append(
            all_slots,
            jnp.asarray(rng.standard_normal((4, 2, 32)), jnp.float32),
            jnp.asarray(rng.standard_normal((4, 2, 32)), jnp.float32),
        )
    slots = jnp.asarray([0, 2], jnp.int32)
    q = jnp.asarray(rng.standard_normal((2, 4, 32)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((2, 2, 32)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((2, 2, 32)), jnp.float32)

    ref_cache = cache.append(slots, kn, vn)
    o_ref = paged.paged_attention(q, ref_cache, slots)
    o_fused, fused_cache = paged.paged_attention(q, cache, slots, new_kv=(kn, vn))

    assert jnp.array_equal(o_fused, o_ref)
    assert jnp.array_equal(fused_cache.k_pages, ref_cache.k_pages)
    assert jnp.array_equal(fused_cache.v_pages, ref_cache.v_pages)
    assert jnp.array_equal(fused_cache.lengths, ref_cache.lengths)
    if cfg.quantized:
        assert jnp.array_equal(fused_cache.k_scales, ref_cache.k_scales)
        assert jnp.array_equal(fused_cache.v_scales, ref_cache.v_scales)
