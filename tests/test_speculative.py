"""Speculative decoding: the batched verify step must reproduce K
sequential decode steps, and the engine's speculative mode must emit
exactly the tokens of plain greedy decoding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.cache.paged_cache import CacheConfig, PagedKVCache
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, Request

_MCFG = tfm.ModelConfig(
    vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
    head_dim=32, mlp_hidden=128, block_q=128, block_kv=128, dtype="float32")


def _ccfg(dtype="float32"):
    return CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype=dtype)


def _seeded_caches(params, prompts):
    """Prefill each prompt into slot i of fresh caches; returns caches and
    per-slot stored lengths."""
    ccfg = _ccfg()
    caches = [PagedKVCache.create(ccfg) for _ in range(_MCFG.num_layers)]
    pt = jnp.zeros((ccfg.max_seqs, ccfg.max_pages_per_seq), jnp.int32)
    page = 1
    for slot, p in enumerate(prompts):
        npages = -(-(len(p) + 8) // ccfg.page_size)
        pt = pt.at[slot, :npages].set(
            jnp.arange(page, page + npages, dtype=jnp.int32))
        page += npages
    caches = [c.assign_pages(pt) for c in caches]
    for slot, p in enumerate(prompts):
        _, kv = tfm.prefill(params, jnp.asarray([p], jnp.int32), _MCFG)
        for i, (k, v) in enumerate(kv):
            caches[i] = caches[i].write_prompt(
                slot, jnp.swapaxes(k[0], 0, 1), jnp.swapaxes(v[0], 0, 1))
    return caches


@pytest.mark.parametrize("K", [2, 4])
def test_decode_verify_matches_sequential_steps(rng, K):
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    prompts = [list(rng.integers(1, 127, 11)), list(rng.integers(1, 127, 19))]
    toks = jnp.asarray(rng.integers(1, 127, (2, K)), jnp.int32)
    base = jnp.asarray([len(p) for p in prompts], jnp.int32)
    slots = jnp.asarray([0, 1], jnp.int32)

    caches_v = _seeded_caches(params, prompts)
    logits_v, caches_v = tfm.decode_verify(
        params, toks, base, caches_v, slots, _MCFG)

    caches_s = _seeded_caches(params, prompts)
    seq_logits = []
    for j in range(K):
        lj, caches_s = tfm.decode_step(
            params, toks[:, j], base + j, caches_s, slots, _MCFG)
        seq_logits.append(lj)
    seq_logits = jnp.stack(seq_logits, axis=1)  # (B, K, vocab)

    np.testing.assert_allclose(np.asarray(logits_v), np.asarray(seq_logits),
                               atol=1e-4, rtol=1e-4)
    assert np.array_equal(np.argmax(np.asarray(logits_v), -1),
                          np.argmax(np.asarray(seq_logits), -1))
    # verify advanced every slot's length by K
    for c_v, c_s in zip(caches_v, caches_s):
        assert np.array_equal(np.asarray(c_v.lengths[:2]),
                              np.asarray(c_s.lengths[:2]))


def _serve(prompts, params, draft=None, k=0, **kw):
    eng = Engine(params, _MCFG, _ccfg(), EngineConfig(
        max_batch=2, speculate_k=k, **kw), draft=draft)
    for rid, p in enumerate(prompts):
        eng.submit(Request(rid=rid, prompt=p, max_new_tokens=8))
    out = {f.rid: f.new_tokens for f in eng.run()}
    return out, eng


def test_engine_speculative_self_draft_exact(rng):
    """Draft == target: every proposal accepted, output identical to plain
    decoding, and the engine takes fewer decode rounds."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    prompts = [list(rng.integers(1, 127, 11)), list(rng.integers(1, 127, 19))]
    plain, _ = _serve(prompts, params)
    spec, eng = _serve(prompts, params, draft=(params, _MCFG), k=4)
    assert spec == plain
    st = eng.spec_stats()
    assert st["proposed"] > 0
    assert st["accepted"] == st["proposed"]  # self-draft: 100% acceptance


def test_engine_speculative_weak_draft_exact(rng):
    """A draft with different weights proposes mostly-wrong tokens; the
    output must STILL equal plain greedy decoding (exactness is the
    contract — speculation only changes the speed)."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    draft_params = tfm.init_params(jax.random.PRNGKey(7), _MCFG)
    prompts = [list(rng.integers(1, 127, 11)), list(rng.integers(1, 127, 19))]
    plain, _ = _serve(prompts, params)
    spec, eng = _serve(prompts, params, draft=(draft_params, _MCFG), k=4)
    assert spec == plain
    st = eng.spec_stats()
    assert st["proposed"] > 0


def test_engine_speculative_eos_truncation(rng):
    """An accepted token equal to eos_id must finish the request at eos."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    prompt = list(rng.integers(1, 127, 11))
    plain_eng = Engine(params, _MCFG, _ccfg(), EngineConfig(max_batch=1))
    plain_eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8))
    plain = plain_eng.run()[0]
    eos = plain.new_tokens[3]  # finish mid-stream on the 4th token
    def run(draft, k):
        eng = Engine(params, _MCFG, _ccfg(),
                     EngineConfig(max_batch=1, speculate_k=k), draft=draft)
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8,
                           eos_id=eos))
        return eng.run()[0]
    base = run(None, 0)
    spec = run((params, _MCFG), 4)
    assert spec.new_tokens == base.new_tokens
    assert spec.reason == base.reason == "eos"


def test_engine_speculative_temperature(rng):
    """temperature > 0 speculates through rejection sampling: generation
    completes, is reproducible per seed, and with a self-draft every
    proposal is accepted (p == q → the ratio test never rejects)."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    prompt = list(rng.integers(1, 127, 11))

    def run():
        eng = Engine(params, _MCFG, _ccfg(),
                     EngineConfig(max_batch=1, speculate_k=4, seed=3),
                     draft=(params, _MCFG))
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=6,
                           temperature=0.8))
        out = eng.run()
        return out[0].new_tokens, eng.spec_stats()

    toks, st = run()
    assert len(toks) == 6
    assert st["proposed"] > 0
    assert st["accepted"] == st["proposed"]  # self-draft: p == q
    assert run()[0] == toks  # same seed → same stream


def test_engine_speculative_under_tp(rng):
    """Speculation composes with tensor parallelism: the target verify
    call shard_maps over the mesh while the (small) draft runs unsharded;
    greedy output must equal the plain single-device stream."""
    from jax.sharding import Mesh

    if jax.device_count() < 2:
        pytest.skip("needs 2 devices")
    mesh = Mesh(np.array(jax.devices()[:2]), ("model",))
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    prompts = [list(rng.integers(1, 127, 11)), list(rng.integers(1, 127, 19))]
    plain, _ = _serve(prompts, params)

    eng = Engine(params, _MCFG, _ccfg(), EngineConfig(
        max_batch=2, speculate_k=4), mesh=mesh, draft=(params, _MCFG))
    for rid, p in enumerate(prompts):
        eng.submit(Request(rid=rid, prompt=p, max_new_tokens=8))
    spec = {f.rid: f.new_tokens for f in eng.run()}
    assert spec == plain
    assert eng.spec_stats()["proposed"] > 0


def test_spec_accept_matches_target_distribution(rng):
    """The law of speculative sampling: marginalized over draft proposals
    d ~ q and the accept/resample coin, the emitted token is distributed
    per the TARGET p — for an arbitrary (mismatched) q."""
    v = 8
    logits_p = jnp.asarray(rng.standard_normal(v), jnp.float32)
    logits_q = jnp.asarray(rng.standard_normal(v), jnp.float32)
    p = jax.nn.softmax(logits_p)
    q = jax.nn.softmax(logits_q)

    from tpu_flash.serving.engine import _spec_accept

    def one(key):
        kd, ka = jax.random.split(key)
        d = jax.random.categorical(kd, logits_q)
        toks = jnp.stack([jnp.int32(0), d.astype(jnp.int32)])[None]
        # p_all[:, 0] scores the proposal; p_all[:, 1] is the bonus dist
        p_all = jnp.stack([p, p])[None]
        m, final = _spec_accept(toks, p_all, q[None, None], ka)
        return jnp.where(m[0] >= 1, d.astype(jnp.int32), final[0])

    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(0), n)
    toks = np.asarray(jax.vmap(one)(keys))
    emp = np.bincount(toks, minlength=v) / n
    tv = 0.5 * np.abs(emp - np.asarray(p)).sum()
    assert tv < 0.02, f"TV distance {tv:.4f} (emp={emp}, p={np.asarray(p)})"


def test_spec_accept_greedy_onehot_limit(rng):
    """With one-hot p (the temp<=0 encoding) the routine reduces to exact
    greedy token matching: accept iff the proposal is the argmax, final
    token always the argmax of the cut position."""
    from tpu_flash.serving.engine import _spec_accept

    v = 8
    p = jax.nn.one_hot(jnp.asarray([3]), v, dtype=jnp.float32)  # (1, 8)
    q = jax.nn.softmax(jnp.asarray(rng.standard_normal((1, 1, v)), jnp.float32))
    for d, expect_m in [(3, 1), (5, 0)]:
        toks = jnp.asarray([[0, d]], jnp.int32)
        p_all = jnp.stack([p, p], axis=1)  # (1, 2, 8)
        m, final = _spec_accept(toks, p_all, q, jax.random.PRNGKey(0))
        assert int(m[0]) == expect_m
        assert int(final[0]) == 3  # argmax of p at the cut, either way
