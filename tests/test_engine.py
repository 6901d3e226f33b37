"""Serving engine: decode consistency vs full forward, continuous batching,
preemption, and quantized-cache generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.cache.paged_cache import CacheConfig
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, Request

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


def _cache_cfg(dtype="bfloat16", **kw):
    base = dict(
        num_kv_heads=_MCFG.num_kv_heads,
        head_dim=_MCFG.head_dim,
        page_size=16,
        total_pages=128,
        max_seqs=8,
        max_pages_per_seq=16,
        dtype=dtype,
    )
    base.update(kw)
    return CacheConfig(**base)


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), _MCFG)


def test_greedy_decode_matches_full_forward(params):
    """Engine's paged greedy decode must produce the same tokens as naive
    full re-forward greedy decoding (within bf16 cache noise)."""
    prompt = list(np.random.default_rng(0).integers(1, 255, 12))
    eng = Engine(params, _MCFG, _cache_cfg("float32"), EngineConfig(max_batch=2))
    eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8))
    done = eng.run()
    assert len(done) == 1

    # reference: greedy decode by re-running the full forward each step
    toks = list(prompt)
    for _ in range(8):
        logits = tfm.forward(params, jnp.asarray([toks], jnp.int32), _MCFG)
        toks.append(int(jnp.argmax(logits[0, -1])))
    assert done[0].tokens == toks


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_quantized_cache_decode_runs(params, dtype):
    prompt = list(np.random.default_rng(1).integers(1, 255, 10))
    eng = Engine(params, _MCFG, _cache_cfg(dtype), EngineConfig(max_batch=2))
    eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=6))
    done = eng.run()
    assert len(done) == 1
    assert len(done[0].new_tokens) == 6


def test_continuous_batching_multiple_requests(params):
    rng = np.random.default_rng(2)
    eng = Engine(params, _MCFG, _cache_cfg(), EngineConfig(max_batch=3))
    for rid in range(5):
        n = int(rng.integers(4, 20))
        eng.submit(Request(rid=rid, prompt=list(rng.integers(1, 255, n)),
                           max_new_tokens=int(rng.integers(3, 9))))
    done = eng.run()
    assert sorted(r.rid for r in done) == [0, 1, 2, 3, 4]
    for r in done:
        assert r.reason == "length"


def test_batched_decode_matches_solo_decode(params):
    """Two sequences decoded together must produce the same tokens as each
    decoded alone (batch isolation through the paged cache)."""
    rng = np.random.default_rng(3)
    prompts = [list(rng.integers(1, 255, 9)), list(rng.integers(1, 255, 14))]

    solo = []
    for i, p in enumerate(prompts):
        eng = Engine(params, _MCFG, _cache_cfg("float32"), EngineConfig(max_batch=2))
        eng.submit(Request(rid=i, prompt=p, max_new_tokens=6))
        solo.append(eng.run()[0].tokens)

    eng = Engine(params, _MCFG, _cache_cfg("float32"), EngineConfig(max_batch=2))
    for i, p in enumerate(prompts):
        eng.submit(Request(rid=i, prompt=p, max_new_tokens=6))
    both = {r.rid: r.tokens for r in eng.run()}
    assert both[0] == solo[0]
    assert both[1] == solo[1]


def test_page_exhaustion_preempts_and_completes(params):
    """Tiny pool: sequences must preempt under pressure yet all complete."""
    cc = _cache_cfg(total_pages=12, max_pages_per_seq=8)
    eng = Engine(params, _MCFG, cc, EngineConfig(max_batch=2))
    rng = np.random.default_rng(4)
    for rid in range(3):
        eng.submit(Request(rid=rid, prompt=list(rng.integers(1, 255, 8)),
                           max_new_tokens=5))
    done = eng.run(max_steps=500)
    assert sorted(r.rid for r in done) == [0, 1, 2]


def test_pages_released_after_completion(params):
    eng = Engine(params, _MCFG, _cache_cfg(), EngineConfig(max_batch=2))
    free0 = eng._alloc.num_free()
    eng.submit(Request(rid=0, prompt=[1, 2, 3], max_new_tokens=3))
    eng.run()
    assert eng._alloc.num_free() == free0


def test_sliding_window_decode_matches_full_forward():
    """attention="sliding" must use the same banded pattern in decode as in
    prefill/forward — previously decode silently attended full history.
    Compares LOGITS (token comparison is tie-fragile at this model size)."""
    import dataclasses

    from tpu_flash.cache.paged_cache import PagedKVCache
    from tpu_flash.serving.engine import _prefill_all_logits

    mcfg = tfm.ModelConfig(
        vocab_size=256, dim=128, num_layers=2, num_q_heads=4,
        num_kv_heads=2, head_dim=32, block_q=128, block_kv=128,
        attention="sliding", window=9,
    )
    params = tfm.init_params(jax.random.PRNGKey(3), mcfg)
    cc = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                     total_pages=128, max_seqs=8, max_pages_per_seq=16,
                     dtype="float32")
    rng = np.random.default_rng(7)
    toks = list(rng.integers(1, 255, 12))

    caches = [PagedKVCache.create(cc) for _ in range(mcfg.num_layers)]
    pt = jnp.zeros((cc.max_seqs, cc.max_pages_per_seq), jnp.int32)
    pt = pt.at[0, :4].set(jnp.asarray([1, 2, 3, 4], jnp.int32))
    caches = [c.assign_pages(pt) for c in caches]
    pre_logits, kv = _prefill_all_logits(
        params, jnp.asarray([toks], jnp.int32), mcfg)
    for li, (k, v) in enumerate(kv):
        caches[li] = caches[li].write_prompt(
            0, jnp.swapaxes(k[0], 0, 1), jnp.swapaxes(v[0], 0, 1))
    toks.append(int(jnp.argmax(pre_logits[0, -1])))  # first generated token

    slot = jnp.asarray([0], jnp.int32)
    for _ in range(8):
        pos = len(toks) - 1  # the new token's position (== cache length)
        logits, caches = tfm.decode_step(
            params, jnp.asarray([toks[-1]], jnp.int32),
            jnp.asarray([pos], jnp.int32), caches, slot, mcfg)
        ref = tfm.forward(params, jnp.asarray([toks], jnp.int32), mcfg)[0, -1]
        err = float(jnp.max(jnp.abs(logits[0] - ref)))
        # bf16 q cast in the paged kernel; semantic divergence (attending
        # the full history instead of the window) shows up as O(1) errors
        assert err < 0.15, f"decode logits diverge from sliding forward: {err}"
        toks.append(int(jnp.argmax(ref)))


def test_chunked_prefill_matches_unchunked(params):
    """Long prompts streamed in page-aligned chunks must produce exactly the
    tokens the one-shot prefill engine produces (f32 cache, greedy)."""
    prompt = list(np.random.default_rng(11).integers(1, 255, 75))

    def run(chunk_size):
        eng = Engine(params, _MCFG, _cache_cfg("float32"),
                     EngineConfig(max_batch=2, chunk_size=chunk_size))
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=6))
        # a short request rides alongside to exercise interleaving
        eng.submit(Request(rid=1, prompt=[5, 6, 7], max_new_tokens=6))
        return sorted((f.rid, tuple(f.tokens)) for f in eng.run())

    base = run(None)
    chunked = run(32)  # page_size 16 → 2-page chunks; 75 tokens → 3 chunks
    assert chunked == base


def test_chunked_prefill_at_page_capacity(params):
    """Final-chunk padding near max_pages_per_seq: the padded tail's page
    writes run past the slot's table; they must spill to the trash page,
    NOT clamp backwards onto real pages (which silently corrupted the K/V
    of earlier tokens)."""
    prompt = list(np.random.default_rng(13).integers(1, 255, 121))
    ccfg = _cache_cfg("float32", max_pages_per_seq=8, total_pages=64)
    # capacity 8*16 = 128 tokens; chunks of 48 → final chunk (offset 96,
    # 25 real tokens, padded to 48) covers table entries 6..8 — one past
    # the table.

    def run(chunk_size):
        eng = Engine(params, _MCFG, ccfg,
                     EngineConfig(max_batch=2, chunk_size=chunk_size))
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=4))
        return [f.tokens for f in eng.run()]

    assert run(48) == run(None)


def test_chunked_prefill_sliding_window(params):
    """Chunked prefill of a sliding-window model must equal the unchunked
    path: each chunk token's prefix band starts at ITS position − radius
    (not the chunk base) and the in-chunk pass uses the banded schedule."""
    import dataclasses

    mcfg = dataclasses.replace(_MCFG, attention="sliding", window=33)
    prompt = list(np.random.default_rng(17).integers(1, 255, 100))

    def run(chunk_size):
        eng = Engine(params, mcfg, _cache_cfg("float32"),
                     EngineConfig(max_batch=2, chunk_size=chunk_size))
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=6))
        return [f.tokens for f in eng.run()]

    assert run(32) == run(None)


@pytest.mark.parametrize("dtype", ["float32", "int8"])
def test_pipelined_decode_matches_default(params, dtype):
    """EngineConfig.pipelined_decode swaps in the hand-pipelined decode
    kernel (ops/paged.py _pipe_kernel); the generated tokens must match
    the BlockSpec-pipeline kernel's."""
    prompt = list(np.random.default_rng(3).integers(1, 255, 12))

    def run(pipelined):
        eng = Engine(params, _MCFG, _cache_cfg(dtype),
                     EngineConfig(max_batch=2, pipelined_decode=pipelined))
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8))
        return eng.run()[0].tokens

    assert run(True) == run(False)


def test_chunked_prefill_on_recycled_slot():
    """A recycled slot's stale device-side length must not leak into the
    first chunk's prefix attention (regression: the paged kernel masks
    [0, lengths[slot]) and admission didn't reset it)."""
    cfg = tfm.ModelConfig(
        vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=128, block_kv=128,
        dtype="float32")
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")
    rng = np.random.default_rng(0)
    filler = [list(rng.integers(1, 127, 40)) for _ in range(3)]
    probe = list(rng.integers(1, 127, 33))

    def run(prompts):
        eng = Engine(params, cfg, ccfg,
                     EngineConfig(max_batch=1, chunk_size=16))
        out = {}
        for rid, p in enumerate(prompts):
            eng.submit(Request(rid=rid, prompt=p, max_new_tokens=4))
            for f in eng.run():  # drain fully so slots recycle
                out[f.rid] = f.new_tokens
            eng.finished.clear()
        return out

    assert run(filler + [probe])[3] == run([probe])[0]


def test_topk_topp_sampling():
    """top_k=1 must equal greedy at any temperature; top_p truncation keeps
    samples inside the nucleus; plain temperature still varies."""
    from tpu_flash.serving.engine import _device_sample

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((4, 64)) * 3, jnp.float32)
    greedy = np.argmax(np.asarray(logits), -1)

    def samp(t, k, p):
        return jnp.asarray([[t, k, p]] * 4, jnp.float32)

    keys = [jax.random.PRNGKey(i) for i in range(32)]
    # top_k=1: always the argmax, regardless of temperature
    for key in keys[:8]:
        out = np.asarray(_device_sample(logits, samp(5.0, 1, 1.0), key))
        assert np.array_equal(out, greedy)
    # top_p small: sampled tokens stay inside the per-row nucleus
    probs = np.asarray(jax.nn.softmax(logits / 2.0, axis=-1))
    for key in keys:
        out = np.asarray(_device_sample(logits, samp(2.0, 0, 0.3), key))
        for b in range(4):
            order = np.argsort(-probs[b])
            csum = np.cumsum(probs[b][order])
            nucleus = set(order[: int(np.searchsorted(csum, 0.3)) + 1])
            assert int(out[b]) in nucleus
    # no truncation: temperature sampling actually varies across keys
    outs = {
        tuple(np.asarray(_device_sample(logits, samp(2.0, 0, 1.0), k)))
        for k in keys
    }
    assert len(outs) > 1


def test_engine_topk_generation(rng):
    """End-to-end: a top_k=1 request reproduces the greedy stream even at
    high temperature."""
    cfg = tfm.ModelConfig(
        vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=128, block_kv=128,
        dtype="float32")
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")
    prompt = list(rng.integers(1, 127, 11))

    def run(**kw):
        eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=1))
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=6, **kw))
        return eng.run()[0].new_tokens

    assert run(temperature=3.0, top_k=1) == run()  # greedy-equivalent


def test_engine_metrics_stream(tmp_path, rng):
    cfg = tfm.ModelConfig(
        vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=128, block_kv=128,
        dtype="float32")
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")
    mpath = str(tmp_path / "metrics.jsonl")
    eng = Engine(params, cfg, ccfg,
                 EngineConfig(max_batch=2, metrics_path=mpath))
    eng.submit(Request(rid=0, prompt=list(rng.integers(1, 127, 8)),
                       max_new_tokens=5))
    eng.run()
    import json as _json
    rows = [_json.loads(l) for l in open(mpath)]
    assert len(rows) == eng.metrics()["steps"] > 0
    assert sum(r["new_tokens"] for r in rows) == eng.metrics()["tokens_out"] == 5
    assert all("free_pages" in r and "running" in r for r in rows)


def test_logprobs_returned(rng):
    """FinishedRequest carries one raw log-softmax logprob per generated
    token; greedy logprobs equal the max log-softmax by construction and
    the speculative stream reports the same values as the plain one."""
    cfg = tfm.ModelConfig(
        vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=128, block_kv=128,
        dtype="float32")
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")
    prompt = list(rng.integers(1, 127, 11))

    def run(**kw):
        eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=1,
                                                     **kw.pop("ecfg", {})),
                     **kw)
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=5))
        return eng.run()[0]

    plain = run()
    assert len(plain.logprobs) == len(plain.new_tokens) == 5
    assert all(-20.0 < lp <= 0.0 for lp in plain.logprobs)
    spec = run(draft=(params, cfg), ecfg=dict(speculate_k=4))
    assert spec.new_tokens == plain.new_tokens
    np.testing.assert_allclose(spec.logprobs, plain.logprobs, atol=1e-4)


def test_stop_sequences(rng):
    """Generation finishes with reason='stop' as soon as the generated
    tail matches a stop sequence; the stop only matches fully-generated
    tokens (never straddles the prompt boundary), and speculation's
    accepted tokens respect it mid-round."""
    cfg = tfm.ModelConfig(
        vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=128, block_kv=128,
        dtype="float32")
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")
    prompt = list(rng.integers(1, 127, 11))

    def run(stop=(), draft=None, k=0):
        eng = Engine(params, cfg, ccfg,
                     EngineConfig(max_batch=1, speculate_k=k), draft=draft)
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8,
                           stop_sequences=stop))
        return eng.run()[0]

    plain = run()
    assert plain.reason == "length" and len(plain.new_tokens) == 8
    # stop at a 2-token sequence from the plain stream (repeated tokens
    # may make an EARLIER occurrence the true first match — assert the
    # invariants, not a position)
    ss = (tuple(plain.new_tokens[3:5]),)
    stopped = run(stop=ss)
    assert stopped.reason == "stop"
    assert tuple(stopped.new_tokens[-2:]) == ss[0]
    assert stopped.new_tokens == plain.new_tokens[:len(stopped.new_tokens)]
    # a "stop" equal to the prompt tail must NOT fire at produced=0
    pre = run(stop=(tuple(prompt[-2:]),))
    assert pre.reason == "length"
    # speculation: identical stopping point
    spec = run(stop=ss, draft=(params, cfg), k=4)
    assert spec.reason == "stop" and spec.new_tokens == stopped.new_tokens


def test_stream_yields_tokens_incrementally(rng):
    """engine.stream() yields every generated token (with its logprob) in
    emit order, then the FinishedRequest; the reassembled streams equal
    run()'s output exactly."""
    from tpu_flash.serving.engine import FinishedRequest

    cfg = tfm.ModelConfig(
        vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=128, block_kv=128,
        dtype="float32")
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")
    prompts = [list(rng.integers(1, 127, 8)), list(rng.integers(1, 127, 12))]

    def make():
        eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=2))
        for rid, p in enumerate(prompts):
            eng.submit(Request(rid=rid, prompt=p, max_new_tokens=6))
        return eng

    ref = {f.rid: (f.new_tokens, f.logprobs) for f in make().run()}

    streams, lps, finished = {}, {}, {}
    for item in make().stream():
        if isinstance(item, FinishedRequest):
            finished[item.rid] = item
        else:
            rid, tok, lp = item
            streams.setdefault(rid, []).append(tok)
            lps.setdefault(rid, []).append(lp)
    assert set(finished) == {0, 1}
    for rid, (toks, lp_ref) in ref.items():
        assert streams[rid] == toks
        np.testing.assert_allclose(lps[rid], lp_ref, atol=1e-6)


def _small_setup(rng):
    cfg = tfm.ModelConfig(
        vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=128, block_kv=128,
        dtype="float32")
    params = tfm.init_params(jax.random.PRNGKey(0), cfg)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")
    return cfg, params, ccfg


def test_stop_sequence_across_preemption(rng):
    """A stop whose match straddles a preemption boundary (first token
    absorbed into the requeued prompt) must still fire: matching counts
    tokens generated since the ORIGINAL prompt."""
    cfg, params, ccfg = _small_setup(rng)
    prompt = list(rng.integers(1, 127, 11))

    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=1))
    eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8))
    plain = eng.run()[0].new_tokens

    ss = (tuple(plain[1:3]),)  # straddles when we preempt after 2 tokens
    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=1))
    eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8,
                       stop_sequences=ss))
    while not eng.running or len(eng.running[
            next(iter(eng.running))].tokens) - len(prompt) < 2:
        eng.step()
    eng._preempt(next(iter(eng.running)))  # absorbs plain[:2] into prompt
    out = eng.run()[0]
    assert out.reason == "stop"
    assert tuple(out.tokens[-2:]) == ss[0]


def test_stream_across_preemption(rng):
    """stream() across a preemption yields every generated token exactly
    once: pre-preempt yields + post-resume yields == the full plain
    generation (no silent gap, no duplicates)."""
    cfg, params, ccfg = _small_setup(rng)
    from tpu_flash.serving.engine import FinishedRequest

    prompt = list(rng.integers(1, 127, 11))
    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=1))
    eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8))
    plain = eng.run()[0].new_tokens

    eng = Engine(params, cfg, ccfg, EngineConfig(max_batch=1))
    eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=8))
    orig_step, count = eng.step, {"n": 0}

    def step():
        # preempt BEFORE the step's decode, like real pool pressure does
        count["n"] += 1
        if count["n"] == 4 and eng.running:
            eng._preempt(next(iter(eng.running)))
        orig_step()

    eng.step = step
    toks = [item[1] for item in eng.stream()
            if not isinstance(item, FinishedRequest)]
    assert toks == plain


# ---------------------------------------------------------------------------
# multi-token on-device decode (EngineConfig.decode_steps > 1)
# ---------------------------------------------------------------------------
def test_decode_steps_matches_plain(params):
    """decode_steps=4 must produce bit-identical token/logprob streams to
    plain one-call-per-token decoding: the scan body replays the exact
    step (same key-split order, same sampling)."""
    rng = np.random.default_rng(7)
    prompts = [list(rng.integers(1, 255, 9)), list(rng.integers(1, 255, 13))]

    def run(steps):
        eng = Engine(params, _MCFG, _cache_cfg("float32"),
                     EngineConfig(max_batch=2, decode_steps=steps))
        for i, p in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=p, max_new_tokens=11,
                               temperature=0.7 if i else 0.0))
        return {r.rid: (r.tokens, r.logprobs) for r in eng.run()}

    plain, multi = run(1), run(4)
    for rid in plain:
        assert multi[rid][0] == plain[rid][0]
        np.testing.assert_allclose(multi[rid][1], plain[rid][1], atol=1e-6)


def test_decode_steps_early_finish_rollback(params):
    """A lane hitting eos/max_new_tokens mid-scan discards the overshoot
    tokens, and the freed slot serves a follow-up request correctly."""
    rng = np.random.default_rng(11)
    p1 = list(rng.integers(1, 255, 10))
    p2 = list(rng.integers(1, 255, 8))

    def run(steps):
        eng = Engine(params, _MCFG, _cache_cfg("float32"),
                     EngineConfig(max_batch=2, decode_steps=steps))
        # max_new_tokens=3 and 10: the short lane finishes mid-scan at K=4
        eng.submit(Request(rid=0, prompt=p1, max_new_tokens=3))
        eng.submit(Request(rid=1, prompt=p2, max_new_tokens=10))
        done = {r.rid: r for r in eng.run()}
        # the freed slot must serve a NEW request with clean state
        eng.submit(Request(rid=2, prompt=p1, max_new_tokens=5))
        done.update({r.rid: r for r in eng.run()})
        return done

    plain, multi = run(1), run(4)
    for rid in plain:
        assert multi[rid].tokens == plain[rid].tokens, rid
        assert multi[rid].reason == plain[rid].reason, rid
        assert len(multi[rid].new_tokens) == len(plain[rid].new_tokens)


def test_decode_steps_stop_sequence(params):
    """Stop sequences commit token-by-token on the host, so a stop hit
    mid-scan truncates exactly as in plain decoding."""
    rng = np.random.default_rng(13)
    prompt = list(rng.integers(1, 255, 9))

    def run(steps, stop):
        eng = Engine(params, _MCFG, _cache_cfg("float32"),
                     EngineConfig(max_batch=2, decode_steps=steps))
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=12,
                           stop_sequences=stop))
        return eng.run()[0]

    base = run(1, ())
    # pick a stop = the 3rd generated token of the plain stream
    stop = ((base.new_tokens[2],),)
    plain, multi = run(1, stop), run(8, stop)
    assert multi.tokens == plain.tokens
    assert multi.reason == plain.reason == "stop"


def test_async_decode_matches_sync(params):
    """async_decode keeps one K-round dispatch in flight (chained on the
    previous round's device outputs); committed token/logprob streams must
    be BIT-identical to the synchronous loop — same kernels, same
    key-split order, only the fetch timing differs."""
    rng = np.random.default_rng(17)
    prompts = [list(rng.integers(1, 255, 9)), list(rng.integers(1, 255, 14)),
               list(rng.integers(1, 255, 6))]

    def run(async_decode):
        eng = Engine(params, _MCFG, _cache_cfg("float32"),
                     EngineConfig(max_batch=2, decode_steps=4,
                                  async_decode=async_decode))
        # 3 requests over max_batch=2: admissions mid-stream break the
        # chain; mixed lengths force early finishes mid-round.
        for i, p in enumerate(prompts):
            eng.submit(Request(rid=i, prompt=p, max_new_tokens=7 + 3 * i,
                               temperature=0.5 if i == 1 else 0.0))
        done = {r.rid: r for r in eng.run()}
        return done

    sync, asy = run(False), run(True)
    assert set(sync) == set(asy)
    for rid in sync:
        assert asy[rid].tokens == sync[rid].tokens, rid
        assert asy[rid].reason == sync[rid].reason, rid
        np.testing.assert_allclose(asy[rid].logprobs, sync[rid].logprobs,
                                   atol=1e-6)


def test_async_decode_eos_mid_round(params):
    """An eos landing mid-round with a round already in flight: the stale
    round's tokens for the finished lane are discarded, the survivor's are
    kept, and a follow-up request on the recycled slot decodes cleanly."""
    rng = np.random.default_rng(19)
    p1 = list(rng.integers(1, 255, 10))
    p2 = list(rng.integers(1, 255, 7))

    def run(async_decode):
        eng = Engine(params, _MCFG, _cache_cfg("float32"),
                     EngineConfig(max_batch=2, decode_steps=4,
                                  async_decode=async_decode))
        eng.submit(Request(rid=0, prompt=p1, max_new_tokens=20))
        base = eng.run()[0]
        # eos = the 6th generated token → fires mid-round at K=4
        eos = base.new_tokens[5]
        eng2 = Engine(params, _MCFG, _cache_cfg("float32"),
                      EngineConfig(max_batch=2, decode_steps=4,
                                   async_decode=async_decode))
        eng2.submit(Request(rid=0, prompt=p1, max_new_tokens=20,
                            eos_id=eos))
        eng2.submit(Request(rid=1, prompt=p2, max_new_tokens=15))
        done = {r.rid: r for r in eng2.run()}
        eng2.submit(Request(rid=2, prompt=p1, max_new_tokens=5))
        done.update({r.rid: r for r in eng2.run()})
        return done

    sync, asy = run(False), run(True)
    for rid in sync:
        assert asy[rid].tokens == sync[rid].tokens, rid
        assert asy[rid].reason == sync[rid].reason, rid


def test_prefill_bound_max_tolerance(params):
    """The causal norm-bound prefill fast path (EngineConfig.
    prefill_bound_max) is a TOLERANCE contract: greedy tokens and
    logprobs stay close to the exact-max engine (both are exact online
    softmax; the bound only reorders fp rounding), chunked prefill
    included. Decode is pinned exact either way."""
    rng = np.random.default_rng(23)
    prompt = list(rng.integers(1, 255, 75))

    def run(fast, chunk=None):
        eng = Engine(params, _MCFG, _cache_cfg("float32"),
                     EngineConfig(max_batch=2, chunk_size=chunk,
                                  prefill_bound_max=fast))
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=6))
        return eng.run()[0]

    base = run(False)
    fast = run(True)
    fast_chunked = run(True, chunk=32)
    # f32 cache + tiny model: the bound shifts rounding only; greedy
    # streams agree and logprobs sit within kernel-noise tolerance.
    assert fast.tokens == base.tokens
    assert fast_chunked.tokens == base.tokens
    np.testing.assert_allclose(fast.logprobs, base.logprobs, atol=5e-3)
    np.testing.assert_allclose(fast_chunked.logprobs, base.logprobs,
                               atol=5e-3)
