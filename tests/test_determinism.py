"""Determinism: same seed ⇒ bitwise-identical outputs across runs.

The TPU-era replacement for race detection (SURVEY.md §5): the reference
shipped an OpenMP backward with an unsynchronized dK/dV accumulation race
(src_cpp/FlashAttention.cpp:300-312) that nothing could catch because its
outputs were never compared run-to-run. Every kernel here must be a pure
function of its inputs — two evaluations must agree bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_flash as tf
from tpu_flash.ops import flash


def _qkv(seed, b=2, h=3, n=257, d=64, dtype=jnp.bfloat16):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
    return mk(), mk(), mk()


def _bits(x):
    return np.asarray(x.astype(jnp.float32)).tobytes()


@pytest.mark.parametrize("fn", [
    lambda q, k, v: tf.dense_fa(q, k, v),
    lambda q, k, v: tf.dense_fa(q, k, v, causal=True),
    lambda q, k, v: tf.sliding_fa(q, k, v, 65),
    lambda q, k, v: tf.circulant_fa(q, k, v, 65),
])
def test_forward_bitwise_deterministic(fn):
    q, k, v = _qkv(0)
    assert _bits(fn(q, k, v)) == _bits(fn(q, k, v))


def test_backward_bitwise_deterministic():
    q, k, v = _qkv(1, n=130)

    def loss(q, k, v):
        return jnp.sum(tf.dense_fa(q, k, v).astype(jnp.float32) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        assert _bits(a) == _bits(b)


def test_engine_decode_deterministic():
    """Two engines with the same seed produce identical token streams,
    including stochastic (temperature > 0) sampling."""
    from tpu_flash.cache.paged_cache import CacheConfig
    from tpu_flash.models import transformer as tfm
    from tpu_flash.serving.engine import Engine, EngineConfig, Request

    mcfg = tfm.ModelConfig(vocab_size=128, dim=64, num_layers=1,
                           num_q_heads=2, num_kv_heads=2, head_dim=32,
                           block_q=128, block_kv=128)
    ccfg = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                       total_pages=64, max_seqs=4, max_pages_per_seq=8)
    params = tfm.init_params(jax.random.PRNGKey(0), mcfg)

    def run():
        eng = Engine(params, mcfg, ccfg, EngineConfig(max_batch=2, seed=7))
        eng.submit(Request(rid=0, prompt=[1, 2, 3, 4], max_new_tokens=8,
                           temperature=0.8))
        return [f.tokens for f in eng.run()]

    assert run() == run()
