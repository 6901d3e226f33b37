"""Checkpoint/resume: allocator table restore and mid-decode engine resume."""

import numpy as np
import jax
import pytest

from tpu_flash.cache.allocator import PageAllocator
from tpu_flash.cache.paged_cache import CacheConfig
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import Engine, EngineConfig, Request
from tpu_flash.serving.checkpoint import load_checkpoint, save_checkpoint

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


def _cache_cfg(dtype="bfloat16"):
    return CacheConfig(
        num_kv_heads=_MCFG.num_kv_heads,
        head_dim=_MCFG.head_dim,
        page_size=16,
        total_pages=128,
        max_seqs=8,
        max_pages_per_seq=16,
        dtype=dtype,
    )


@pytest.mark.parametrize("force_python", [True, False])
def test_allocator_restore(force_python):
    a = PageAllocator(32, 4, 8, force_python=force_python)
    assert a.admit(0, 3)
    table = a.table(0)[: a.num_pages(0)].copy()
    free_before = a.num_free()
    a.free_seq(0)
    assert a.num_free() == free_before + 3
    # restore the exact table
    assert a.restore(0, table)
    assert np.array_equal(a.table(0)[:3], table)
    assert a.num_free() == free_before
    # double restore fails (slot active)
    assert not a.restore(0, table)
    # restoring the same table into ANOTHER slot shares the pages
    # (prefix-shared checkpoint tables): refcounted, no new pages consumed
    assert a.restore(1, table)
    assert a.num_free() == free_before
    a.free_seq(0)
    assert a.num_free() == free_before  # pages still held by slot 1
    a.free_seq(1)
    assert a.num_free() == free_before + 3
    # duplicates rejected
    assert not a.restore(2, [5, 5])


@pytest.mark.parametrize("cache_dtype", ["float32", "int8"])
def test_engine_resume_matches_uninterrupted(tmp_path, cache_dtype):
    """Greedy decode interrupted by snapshot+restore must produce exactly
    the tokens an uninterrupted engine produces."""
    params = tfm.init_params(jax.random.PRNGKey(0), _MCFG)
    prompts = [
        list(np.random.default_rng(i).integers(1, 255, 10 + 3 * i))
        for i in range(3)
    ]

    def fresh_engine():
        eng = Engine(params, _MCFG, _cache_cfg(cache_dtype), EngineConfig(max_batch=4))
        for rid, p in enumerate(prompts):
            eng.submit(Request(rid=rid, prompt=p, max_new_tokens=12))
        return eng

    ref = fresh_engine()
    ref_done = sorted((f.rid, tuple(f.tokens)) for f in ref.run())

    eng = fresh_engine()
    for _ in range(4):  # part-way through decode
        eng.step()
    save_checkpoint(str(tmp_path / "ckpt"), eng)

    resumed = load_checkpoint(str(tmp_path / "ckpt"))
    assert resumed.running, "snapshot should contain in-flight requests"
    res_done = sorted((f.rid, tuple(f.tokens)) for f in resumed.run())
    assert res_done == ref_done
