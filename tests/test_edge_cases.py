"""Regression tests for review findings: causal n_q > n_kv, fully-masked
rows, trash-slot length growth, long-prompt bucket growth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_flash as tf
from tpu_flash.cache.paged_cache import CacheConfig
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, Request


def _rand(rng, *s):
    return jnp.asarray(rng.standard_normal(s), jnp.float32)


def test_causal_more_queries_than_keys(rng):
    """n_q > n_kv: leading query rows see no keys (right-aligned triangle)
    and must come out as o=0 / lse=-inf, not mean-of-V garbage; the kv
    block index map must not go negative."""
    q = _rand(rng, 1, 2, 256, 64)
    k = _rand(rng, 1, 2, 96, 64)
    v = _rand(rng, 1, 2, 96, 64)
    o, lse = tf.flash_attention(q, k, v, schedule="causal", return_lse=True,
                                block_q=128, block_kv=128)
    o_ref, lse_ref = tf.dense_dpa(q, k, v, causal=True)
    offset = 96 - 256  # query i sees keys j <= i + offset; rows < -offset see none
    dead = -offset
    assert float(jnp.max(jnp.abs(o[:, :, :dead]))) == 0.0
    assert bool(jnp.all(jnp.isneginf(lse[:, :, :dead])))
    err = float(jnp.max(jnp.abs(o[:, :, dead:] - o_ref[:, :, dead:])))
    assert err < 5e-3
    assert float(jnp.max(jnp.abs(
        lse[:, :, dead:] - lse_ref[:, :, dead:]))) < 5e-3


def test_fully_masked_rows_zero_quantized(rng):
    """Quantized kernel: same fully-masked-row contract."""
    from tpu_flash.quant.flash_q import quantized_flash_attention

    q = _rand(rng, 1, 2, 256, 64)
    k = _rand(rng, 1, 2, 96, 64)
    v = _rand(rng, 1, 2, 96, 64)
    o = quantized_flash_attention(q, k, v, q_dtype="int8", kv_dtype="int8",
                                  schedule="causal",
                                  block_q=128, block_kv=128)
    assert float(jnp.max(jnp.abs(o[:, :, :160]))) == 0.0


_MCFG = tfm.ModelConfig(vocab_size=128, dim=64, num_layers=1,
                        num_q_heads=2, num_kv_heads=2, head_dim=32,
                        block_q=128, block_kv=128)


def test_trash_slot_length_stays_zero():
    """Idle decode lanes park on the trash slot; its length must not grow
    (unchecked it eventually walks off its page table and corrupts a live
    sequence's pages)."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    cc = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                     total_pages=64, max_seqs=4, max_pages_per_seq=8)
    eng = Engine(params, _MCFG, cc, EngineConfig(max_batch=2))
    # one request, so one decode lane is always idle (trash)
    eng.submit(Request(rid=0, prompt=[1, 2, 3], max_new_tokens=20))
    eng.run()
    for c in eng.caches:
        assert int(c.lengths[eng._trash_slot]) == 0


def test_prompt_beyond_largest_bucket_decodes():
    """Prompts longer than the largest configured prefill bucket grow the
    bucket instead of wedging the admit loop."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    cc = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                     total_pages=64, max_seqs=4, max_pages_per_seq=16)
    eng = Engine(params, _MCFG, cc,
                 EngineConfig(max_batch=2, prefill_buckets=(32, 64)))
    prompt = list(np.random.default_rng(0).integers(1, 127, 100))  # > 64
    eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=4))
    done = eng.run()
    assert len(done) == 1 and len(done[0].new_tokens) == 4


def test_submit_rejects_over_capacity():
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    cc = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                     total_pages=64, max_seqs=4, max_pages_per_seq=4)  # cap 64
    eng = Engine(params, _MCFG, cc, EngineConfig(max_batch=2))
    with pytest.raises(ValueError, match="capacity"):
        eng.submit(Request(rid=0, prompt=list(range(1, 70)), max_new_tokens=4))


def test_windowed_fa_rejects_return_lse(rng):
    q = _rand(rng, 1, 32, 2, 16)
    with pytest.raises(NotImplementedError, match="lse"):
        tf.windowed_fa(q, q, q, 8, stride=4, return_lse=True)


@pytest.mark.parametrize("trial", range(6))
def test_schedule_fuzz_matches_oracle(rng, trial):
    """Property fuzz: random (n, d, schedule, radius/section, blocks) —
    the fused kernel must match the f32 oracle on every draw, including
    ragged tails and windows larger than the sequence."""
    from tpu_flash.ops import flash, oracle

    n = int(rng.integers(17, 500))
    d = int(rng.choice([32, 64, 128]))
    bq = int(rng.choice([128, 256]))
    bkv = int(rng.choice([128, 256]))
    b, h = 1, int(rng.integers(1, 4))
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)

    kind = rng.choice(["dense", "causal", "sliding", "circulant"])
    if kind == "dense":
        got = flash.dense_fa(q, k, v, block_q=bq, block_kv=bkv)
        want, _ = oracle.dense_dpa(q, k, v)
    elif kind == "causal":
        got = flash.dense_fa(q, k, v, causal=True, block_q=bq, block_kv=bkv)
        want, _ = oracle.dense_dpa(q, k, v, causal=True)
    elif kind == "sliding":
        w = 2 * int(rng.integers(1, n)) + 1  # odd, may exceed n
        got = flash.sliding_fa(q, k, v, w, block_q=bq, block_kv=bkv)
        want, _ = oracle.sliding_dpa(q, k, v, w)
    else:
        w = 2 * int(rng.integers(1, max(2, n // 2))) + 1
        got = flash.circulant_fa(q, k, v, w, block_q=bq, block_kv=bkv)
        want, _ = oracle.circulant_dpa(q, k, v, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-5, rtol=3e-5,
                               err_msg=f"{kind} n={n} d={d} bq={bq} bkv={bkv}")
