"""int8 weight quantization of the flagship model: accuracy, engine decode,
and tensor-parallel equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

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


@pytest.fixture(scope="module")
def params():
    return tfm.init_params(jax.random.PRNGKey(0), _MCFG)


def test_weight_quant_logits_close(params):
    qp = tfm.quantize_weights(params)
    toks = jnp.asarray(np.random.default_rng(0).integers(1, 255, (2, 16)),
                       jnp.int32)
    ref = tfm.forward(params, toks, _MCFG)
    got = tfm.forward(qp, toks, _MCFG)
    # int8 per-channel weights: small relative perturbation of the logits
    denom = jnp.maximum(jnp.max(jnp.abs(ref)), 1.0)
    assert float(jnp.max(jnp.abs(got - ref)) / denom) < 0.08


def test_weight_quant_engine_decodes(params):
    qp = tfm.quantize_weights(params)
    cc = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                     total_pages=128, max_seqs=8, max_pages_per_seq=16,
                     dtype="int8")
    eng = Engine(qp, _MCFG, cc, EngineConfig(max_batch=2))
    prompt = list(np.random.default_rng(1).integers(1, 255, 10))
    eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=6))
    done = eng.run()
    assert len(done) == 1 and len(done[0].new_tokens) == 6


def test_weight_quant_tp_matches_single_device(params):
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    qp = tfm.quantize_weights(params)
    prompt = list(np.random.default_rng(2).integers(1, 255, 9))

    def run(mesh):
        cc = CacheConfig(num_kv_heads=2, head_dim=32, page_size=16,
                         total_pages=128, max_seqs=8, max_pages_per_seq=16,
                         dtype="float32")
        eng = Engine(qp, _MCFG, cc, EngineConfig(max_batch=2), mesh=mesh)
        eng.submit(Request(rid=0, prompt=prompt, max_new_tokens=6))
        return eng.run()[0].tokens

    base = run(None)
    sharded = run(Mesh(np.array(devs[:2]), ("model",)))
    # bf16 psum reordering can flip borderline argmaxes (see test_tp.py);
    # require structural equality and near-total token agreement.
    assert len(sharded) == len(base)
    agree = sum(a == b for a, b in zip(sharded, base)) / len(base)
    assert agree >= 0.9
