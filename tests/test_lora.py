"""Multi-LoRA serving: zero-init is a no-op, a served adapter equals the
offline-merged model, mixed adapter/base batches stay exact, and the
prefix cache never shares K/V across adapter namespaces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.cache.paged_cache import CacheConfig
from tpu_flash.models import lora as lora_mod
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, Request

_MCFG = tfm.ModelConfig(
    vocab_size=128, dim=64, num_layers=2, num_q_heads=2, num_kv_heads=2,
    head_dim=32, mlp_hidden=128, block_q=128, block_kv=128, dtype="float32")


def _ccfg():
    return CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8,
                       dtype="float32")


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), _MCFG)


def _bank(rng, n_adapters=3, rank=4, nonzero=True):
    bank = lora_mod.init_lora_bank(
        jax.random.PRNGKey(7), _MCFG, n_adapters, rank)
    if nonzero:
        # real deltas: fill b (zero-init) with random values
        out = []
        for layer in bank:
            l2 = {}
            for t, e in layer.items():
                l2[t] = dict(
                    a=e["a"],
                    b=jnp.asarray(
                        rng.standard_normal(e["b"].shape) * 0.3, jnp.float32),
                )
            out.append(l2)
        return out
    return bank


def _serve(params, reqs, lora=None, max_batch=2, **kw):
    eng = Engine(params, _MCFG, _ccfg(),
                 EngineConfig(max_batch=max_batch, **{k: v for k, v in
                                                      kw.items()
                                                      if k != "draft"}),
                 lora=lora, draft=kw.get("draft"))
    for r in reqs:
        eng.submit(r)
    return {f.rid: f.new_tokens for f in eng.run()}, eng


def test_zero_bank_is_noop(rng, params):
    prompt = list(rng.integers(1, 127, 11))
    base, _ = _serve(params, [Request(rid=0, prompt=prompt,
                                      max_new_tokens=6)])
    bank = _bank(rng, nonzero=False)
    for aid in (-1, 0, 1):
        got, _ = _serve(params, [Request(rid=0, prompt=prompt,
                                         max_new_tokens=6, adapter_id=aid)],
                        lora=bank)
        assert got[0] == base[0]


def test_adapter_matches_merged_model(rng, params):
    """Serving adapter k == serving the model with W + A_k B_k merged
    offline — for each adapter, plain and chunked prefill."""
    bank = _bank(rng)
    prompt = list(rng.integers(1, 127, 23))
    for aid in (0, 2):
        merged = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
        merged = lora_mod.merge_lora(merged, bank, aid)
        want, _ = _serve(merged, [Request(rid=0, prompt=prompt,
                                          max_new_tokens=6)])
        got, _ = _serve(params, [Request(rid=0, prompt=prompt,
                                         max_new_tokens=6, adapter_id=aid)],
                        lora=bank)
        assert got[0] == want[0], f"adapter {aid}"
        got_c, _ = _serve(params, [Request(rid=0, prompt=prompt,
                                           max_new_tokens=6,
                                           adapter_id=aid)],
                          lora=bank, chunk_size=16)
        assert got_c[0] == want[0], f"adapter {aid} chunked"


def test_mixed_batch_matches_solo(rng, params):
    """Base and two different adapters decode TOGETHER; each lane must
    reproduce its solo run exactly (per-lane gather isolation)."""
    bank = _bank(rng)
    prompts = [list(rng.integers(1, 127, 9 + 4 * i)) for i in range(3)]
    aids = [-1, 0, 2]
    solo = {}
    for i, (p, a) in enumerate(zip(prompts, aids)):
        out, _ = _serve(params, [Request(rid=i, prompt=p, max_new_tokens=6,
                                         adapter_id=a)], lora=bank)
        solo[i] = out[i]
    eng = Engine(params, _MCFG, _ccfg(), EngineConfig(max_batch=3), lora=bank)
    for i, (p, a) in enumerate(zip(prompts, aids)):
        eng.submit(Request(rid=i, prompt=p, max_new_tokens=6, adapter_id=a))
    both = {f.rid: f.new_tokens for f in eng.run()}
    assert both == solo


def test_prefix_cache_is_adapter_scoped(rng, params):
    """The SAME prompt under base and under an adapter computes different
    K/V; the prefix cache must never share across the namespaces, and the
    same-adapter repeat must still hit."""
    bank = _bank(rng)
    prompt = list(rng.integers(1, 127, 40))
    reqs = [
        Request(rid=0, prompt=prompt, max_new_tokens=6),                # base
        Request(rid=1, prompt=prompt, max_new_tokens=6),                # base hit
        Request(rid=2, prompt=prompt, max_new_tokens=6, adapter_id=0),  # miss!
        Request(rid=3, prompt=prompt, max_new_tokens=6, adapter_id=0),  # hit
    ]
    got, eng = _serve(params, reqs, lora=bank, prefix_cache=True,
                      max_batch=1)
    # exactness vs uncached solo runs
    base, _ = _serve(params, [Request(rid=0, prompt=prompt,
                                      max_new_tokens=6)], lora=bank)
    adapt, _ = _serve(params, [Request(rid=0, prompt=prompt,
                                       max_new_tokens=6, adapter_id=0)],
                      lora=bank)
    assert got[0] == got[1] == base[0]
    assert got[2] == got[3] == adapt[0]
    assert got[2] != got[0]  # the adapter actually changes the output
    st = eng._pcache.stats()
    assert st["hits"] == 2  # rid 1 (base ns) and rid 3 (adapter ns) only


def test_speculation_with_adapter_exact(rng, params):
    """Greedy speculation on an adapted request equals plain adapted
    decoding (the base-model draft just lowers acceptance)."""
    bank = _bank(rng)
    prompt = list(rng.integers(1, 127, 11))
    plain, _ = _serve(params, [Request(rid=0, prompt=prompt,
                                       max_new_tokens=6, adapter_id=1)],
                      lora=bank)
    spec, eng = _serve(params, [Request(rid=0, prompt=prompt,
                                        max_new_tokens=6, adapter_id=1)],
                       lora=bank, speculate_k=3, draft=(params, _MCFG))
    assert spec[0] == plain[0]
    assert eng.spec_stats()["proposed"] > 0


def test_engine_without_bank_rejects_adapter_requests():
    """ADVICE r2: an adapter-bearing Request on an engine built without a
    LoRA bank must fail loudly at submit(), not silently decode base."""
    import pytest as _pytest

    from tpu_flash.cache.paged_cache import CacheConfig
    from tpu_flash.models import transformer as tfm
    from tpu_flash.serving.engine import Engine, EngineConfig, Request

    mcfg = tfm.ModelConfig(
        vocab_size=64, dim=64, num_layers=1, num_q_heads=2, num_kv_heads=2,
        head_dim=32, mlp_hidden=128, block_q=64, block_kv=64,
    )
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=32, max_seqs=4, max_pages_per_seq=4)
    eng = Engine(tfm.init_params(jax.random.PRNGKey(0), mcfg), mcfg, ccfg,
                 EngineConfig(max_batch=2))
    with _pytest.raises(ValueError, match="LoRA bank"):
        eng.submit(Request(rid=0, prompt=[1, 2, 3], max_new_tokens=2,
                           adapter_id=0))
