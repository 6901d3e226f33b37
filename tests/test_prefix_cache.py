"""Prefix caching: allocator refcount semantics (native + python), the
content-addressed index, and engine-level exactness — a cache-hit serve
must produce the same tokens as a cold serve."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.cache.allocator import PageAllocator
from tpu_flash.cache.paged_cache import CacheConfig
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, Request
from tpu_flash.serving.prefix_cache import PrefixCache


# ---- allocator refcounts -------------------------------------------------


@pytest.mark.parametrize("force_python", [True, False])
def test_admit_shared_refcounts(force_python):
    a = PageAllocator(16, 4, 8, force_python=force_python)
    assert a.admit(0, 3)
    t0 = [int(p) for p in a.table(0)[:3]]
    free_before = a.num_free()
    # slot 1 shares slot 0's first two pages + one fresh page
    assert a.admit_shared(1, t0[:2], 1)
    assert a.num_free() == free_before - 1  # only the fresh page consumed
    assert a.refcount(t0[0]) == 2 and a.refcount(t0[1]) == 2
    assert [int(p) for p in a.table(1)[:2]] == t0[:2]
    # freeing the original keeps shared pages alive
    a.free_seq(0)
    assert a.refcount(t0[0]) == 1
    assert a.num_free() == free_before - 1 + 1  # only t0[2] returned
    a.free_seq(1)
    assert a.refcount(t0[0]) == 0
    assert a.num_free() == 16


@pytest.mark.parametrize("force_python", [True, False])
def test_retain_release(force_python):
    a = PageAllocator(8, 2, 4, force_python=force_python)
    assert a.admit(0, 2)
    p = int(a.table(0)[0])
    assert a.retain(p)
    a.free_seq(0)
    assert a.refcount(p) == 1  # cache hold survives the sequence
    free_mid = a.num_free()
    assert a.release(p)
    assert a.num_free() == free_mid + 1
    # retaining a free page is an error
    assert not a.retain(p)
    assert not a.release(p)


@pytest.mark.parametrize("force_python", [True, False])
def test_admit_shared_rejects_dead_pages(force_python):
    a = PageAllocator(8, 2, 4, force_python=force_python)
    assert not a.admit_shared(0, [3], 1)  # page 3 is free, not live
    assert a.admit(0, 1)


# ---- the index -----------------------------------------------------------


def _pc(total=32, force_python=True):
    a = PageAllocator(total, 4, 16, force_python=force_python)
    return a, PrefixCache(a)


@pytest.mark.parametrize("force_python", [True, False])
def test_match_insert_chain(force_python):
    a, pc = _pc(force_python=force_python)
    prompt = list(range(40))  # page_size 16 → 2 full pages + tail 8
    assert a.admit(0, 3)
    table = a.table(0)[:3]
    pc.insert(prompt, table, page_size=16)
    assert len(pc) == 2  # full pages only; the partial tail is private
    assert a.refcount(int(table[0])) == 2  # cache holds a ref

    hit = pc.match(prompt, 16)
    assert [int(p) for p in hit] == [int(table[0]), int(table[1])]
    # a different second page breaks the chain after one page
    other = prompt[:16] + [99] * 24
    assert len(pc.match(other, 16)) == 1
    # a different FIRST page misses entirely
    assert pc.match([7] * 40, 16) == []
    # exactly page-aligned prompts leave the last page for prefill
    assert len(pc.match(prompt[:32], 16)) == 1


@pytest.mark.parametrize("force_python", [True, False])
def test_evict_releases_refs(force_python):
    a, pc = _pc(force_python=force_python)
    prompt = list(range(32))
    assert a.admit(0, 2)
    table = a.table(0)[:2]
    pc.insert(prompt, table, 16)
    a.free_seq(0)  # cache is now the only holder
    free_mid = a.num_free()
    assert pc.evict(2) == 2
    assert a.num_free() == free_mid + 2
    assert pc.match(prompt, 16) == []


# ---- engine exactness ----------------------------------------------------

_MCFG = tfm.ModelConfig(
    vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
    head_dim=32, mlp_hidden=128, block_q=128, block_kv=128, dtype="float32")


def _ccfg(total_pages=64):
    return CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=total_pages, max_seqs=4,
                       max_pages_per_seq=8, dtype="float32")


def _serve(prompts, prefix_cache, max_batch=2, **eng_kw):
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    eng = Engine(params, _MCFG, _ccfg(), EngineConfig(
        max_batch=max_batch, prefix_cache=prefix_cache, **eng_kw))
    out = {}
    for rid, p in enumerate(prompts):
        eng.submit(Request(rid=rid, prompt=p, max_new_tokens=6))
    for f in eng.run():
        out[f.rid] = f.new_tokens
    return out, eng


def test_engine_repeated_prompt_hits_and_matches(rng):
    prompt = list(rng.integers(1, 127, 40))
    cold, _ = _serve([prompt], prefix_cache=False)
    warm, eng = _serve([prompt, prompt], prefix_cache=True)
    assert warm[0] == cold[0]
    assert warm[1] == cold[0]  # cache-hit serve identical to cold serve
    st = eng._pcache.stats()
    assert st["hits"] >= 1 and st["hit_tokens"] >= 32


def test_engine_shared_prefix_matches_cold(rng):
    base = list(rng.integers(1, 127, 32))  # two full pages
    a = base + list(rng.integers(1, 127, 9))
    b = base + list(rng.integers(1, 127, 13))
    cold, _ = _serve([b], prefix_cache=False)
    warm, eng = _serve([a, b], prefix_cache=True)
    assert warm[1] == cold[0]
    assert eng._pcache.stats()["hits"] >= 1


def test_engine_prefix_cache_with_chunked_prefill(rng):
    # max_batch=1 serializes the two requests: pages are indexed at
    # prefill completion, so concurrent identical prompts (same step) are
    # an accepted miss — the hit needs the first prefill to have finished.
    prompt = list(rng.integers(1, 127, 50))
    cold, _ = _serve([prompt], prefix_cache=False, max_batch=1,
                     chunk_size=16)
    warm, eng = _serve([prompt, prompt], prefix_cache=True, max_batch=1,
                       chunk_size=16)
    assert warm[0] == cold[0] and warm[1] == cold[0]
    assert eng._pcache.stats()["hits"] >= 1


def test_engine_eviction_under_pool_pressure(rng):
    """A full cache must not deadlock admission: cached-but-idle pages are
    evicted LRU-first when a new prompt needs the pool."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    # tiny pool: 15 usable pages, decode reserve 2
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=16, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")
    eng = Engine(params, _MCFG, ccfg,
                 EngineConfig(max_batch=1, prefix_cache=True))
    prompts = [list(rng.integers(1, 127, 40)) for _ in range(4)]
    for rid, p in enumerate(prompts):
        eng.submit(Request(rid=rid, prompt=p, max_new_tokens=4))
    done = eng.run()
    assert sorted(f.rid for f in done) == [0, 1, 2, 3]
    assert all(len(f.new_tokens) == 4 for f in done)


@pytest.mark.parametrize("force_python", [True, False])
def test_evicted_parent_never_resolves_stale_children(force_python):
    """Chains link by monotonic entry id, not physical page id: after a
    chain's root is evicted and its page recycled under new content, the
    surviving child entries must be unreachable (regression: page-id keys
    resolved a stale child whose K/V were computed under the old prefix)."""
    a, pc = _pc(total=8, force_python=force_python)
    A, B = list(range(16)), list(range(16, 32))
    assert a.admit(0, 2)
    tab = [int(p) for p in a.table(0)[:2]]
    pc.insert(A + B, tab, 16)
    a.free_seq(0)
    pc.evict(1)  # LRU root (-1, A) goes; child (·, B) survives, orphaned
    # recycle the root's page id under different content C
    C = [99] * 16
    assert a.admit(1, 1)
    pc.insert(C + [1], [int(p) for p in a.table(1)[:1]], 16)
    got = pc.match(C + B + [0], 16)
    assert len(got) <= 1, f"stale child resolved: {got}"


def test_top_p_zero_is_safe():
    """top_p=0 must degenerate to keeping the single most likely token,
    not truncate everything into a uniform draw."""
    import jax
    from tpu_flash.serving.engine import _device_sample

    logits = jnp.asarray([[0.0, 5.0, 1.0, -2.0]], jnp.float32)
    samp = jnp.asarray([[0.9, 0.0, 0.0]], jnp.float32)
    for i in range(16):
        out = _device_sample(logits, samp, jax.random.PRNGKey(i))
        assert int(out[0]) == 1


def test_speculate_k_one_rejected(rng):
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    with pytest.raises(ValueError, match="speculate_k"):
        Engine(params, _MCFG, _ccfg(),
               EngineConfig(max_batch=1, speculate_k=1),
               draft=(params, _MCFG))


def test_seq_engine_rejects_prefix_cache(rng):
    from jax.sharding import Mesh
    from tpu_flash.serving.seq_engine import SeqShardedEngine

    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    mesh = Mesh(np.array(jax.devices()[:2]), ("seq",))
    with pytest.raises(NotImplementedError, match="prefix caching"):
        SeqShardedEngine(params, _MCFG, _ccfg(),
                         EngineConfig(max_batch=1, prefix_cache=True),
                         mesh=mesh)


def test_prefix_cache_composes_with_speculation(rng):
    """Both features on: a cache-hit speculative serve still produces
    exactly the cold plain-engine tokens (the draft's whole-prompt prefill
    rewrites shared draft-pool pages with identical content — idempotent)."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    prompt = list(rng.integers(1, 127, 40))

    cold, _ = _serve([prompt], prefix_cache=False)

    eng = Engine(params, _MCFG, _ccfg(), EngineConfig(
        max_batch=2, prefix_cache=True, speculate_k=3),
        draft=(params, _MCFG))
    for rid in range(2):
        eng.submit(Request(rid=rid, prompt=prompt, max_new_tokens=6))
    out = {f.rid: f.new_tokens for f in eng.run()}
    assert out[0] == cold[0] and out[1] == cold[0]
    assert eng.spec_stats()["proposed"] > 0


def test_engine_same_step_herd_gets_full_chain_hits(rng):
    """Same-prefix requests submitted together must NOT all miss: the
    admission gate defers followers one step while the leader's chunked
    prefill publishes its pages, then the herd hits the full chain
    (round-3 finding: 8 concurrent same-prefix requests each matched one
    stale page and the warm serve ran 2x slower than cold)."""
    base = list(rng.integers(1, 127, 48))  # three full pages
    prompts = [base + list(rng.integers(1, 127, 7)) for _ in range(3)]
    cold, _ = _serve(prompts, prefix_cache=False, max_batch=3,
                     chunk_size=16)
    warm, eng = _serve(prompts, prefix_cache=True, max_batch=3,
                       chunk_size=16)
    for rid in cold:
        assert warm[rid] == cold[rid]
    st = eng._pcache.stats()
    # followers (2 of 3) must each match the full 48-token shared chain
    assert st["hit_tokens"] >= 2 * 48, st
