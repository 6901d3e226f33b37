"""Tensor-parallel serving: TP-sharded engine must reproduce the
single-device token stream exactly (virtual CPU mesh)."""

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


def _cache_cfg(dtype="float32"):
    return CacheConfig(
        num_kv_heads=_MCFG.num_kv_heads,
        head_dim=_MCFG.head_dim,
        page_size=16,
        total_pages=128,
        max_seqs=8,
        max_pages_per_seq=16,
        dtype=dtype,
    )


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(devs[:n]), ("model",))


@pytest.mark.parametrize("tp", [2])
@pytest.mark.parametrize("cache_dtype", ["float32", "int8"])
def test_tp_engine_matches_single_device(tp, cache_dtype):
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    prompts = [
        list(np.random.default_rng(i).integers(1, 255, 8 + 5 * i))
        for i in range(2)
    ]

    def run(mesh):
        eng = Engine(params, _MCFG, _cache_cfg(cache_dtype),
                     EngineConfig(max_batch=2), mesh=mesh)
        for rid, p in enumerate(prompts):
            eng.submit(Request(rid=rid, prompt=p, max_new_tokens=8))
        return sorted((f.rid, tuple(f.tokens)) for f in eng.run())

    base = run(None)
    sharded = run(_mesh(tp))
    if cache_dtype == "float32":
        assert sharded == base
    else:
        # int8 cache quantizes per (head, token); TP changes nothing about
        # that but bf16 psum ordering may flip borderline argmaxes — demand
        # ≥90% token agreement and identical shapes.
        for (r1, t1), (r2, t2) in zip(base, sharded):
            assert r1 == r2 and len(t1) == len(t2)
            agree = sum(a == b for a, b in zip(t1, t2)) / len(t1)
            assert agree >= 0.9


def test_tp_forward_matches_single_device():
    """TP full forward (prefill math) vs unsharded — logits must agree."""
    mesh = _mesh(2)
    from jax.sharding import PartitionSpec as P
    from tpu_flash.parallel.shardings import param_pspecs

    params = tfm.init_params(jax.random.PRNGKey(1), _MCFG)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(1, 255, (2, 24)), jnp.int32
    )
    ref = tfm.forward(params, toks, _MCFG)

    fn = jax.shard_map(
        lambda p, t: tfm.forward(p, t, _MCFG, tp_axis="model"),
        mesh=mesh,
        in_specs=(param_pspecs(params, "model"), P()),
        out_specs=P(),
        check_vma=False,
    )
    got = fn(params, toks)
    # bf16 params: the TP psum changes bf16 accumulation order slightly
    assert float(jnp.max(jnp.abs(got - ref))) < 5e-2


def test_tp_forward_moe_matches_single_device():
    """TP + MoE: attention shards over `model`, the expert bank replicates
    (param_pspecs MoE branch) — forward must match unsharded."""
    mesh = _mesh(2)
    from jax.sharding import PartitionSpec as P
    from tpu_flash.parallel.shardings import param_pspecs

    cfg = tfm.ModelConfig(
        vocab_size=256, dim=128, num_layers=2, num_q_heads=4,
        num_kv_heads=2, head_dim=32, block_q=128, block_kv=128,
        moe_experts=4, moe_top_k=2, moe_capacity_factor=2.0)
    params = tfm.init_params(jax.random.PRNGKey(1), cfg)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(1, 255, (2, 24)), jnp.int32
    )
    ref = tfm.forward(params, toks, cfg)

    fn = jax.shard_map(
        lambda p, t: tfm.forward(p, t, cfg, tp_axis="model"),
        mesh=mesh,
        in_specs=(param_pspecs(params, "model"), P()),
        out_specs=P(),
        check_vma=False,
    )
    got = fn(params, toks)
    # Dropful top-k routing is discontinuous: a router logit near a tie
    # can flip expert choice under the TP psum's bf16 accumulation-order
    # noise, producing an O(1) diff at that token while every other
    # position matches to kernel noise (the serving-side consequence of
    # the same discontinuity is DESIGN §16's drop-free rule). Bound the
    # FRACTION of flipped positions, not the max.
    err = jnp.max(jnp.abs(got - ref), axis=-1)  # per (batch, token)
    flipped = int(jnp.sum(err > 5e-2))  # of 48 tokens
    assert flipped <= 2, (flipped, float(jnp.max(err)))
    assert float(jnp.max(jnp.abs(got - ref))) < 2.0  # flips stay bounded
