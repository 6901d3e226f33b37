"""Flash kernel ≈ oracle gates — the reference's core test contract
(test/test.jl:20 `dense_fa ≈ dense_dpa`), extended to every schedule,
ragged shapes, and the lse statistic."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops import flash, oracle


def _rand(rng, *shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def _qkv(rng, b, h, n, d, dv=None, dtype=jnp.float32):
    return (
        _rand(rng, b, h, n, d, dtype=dtype),
        _rand(rng, b, h, n, d, dtype=dtype),
        _rand(rng, b, h, n, dv or d, dtype=dtype),
    )


# Small blocks so multi-block paths and ragged tails are exercised on CPU.
_BLK = dict(block_q=128, block_kv=128)


@pytest.mark.parametrize("n", [128, 256, 300, 30])
@pytest.mark.parametrize("d", [64, 128])
def test_dense_fa_matches_oracle(rng, n, d):
    q, k, v = _qkv(rng, 2, 2, n, d)
    o, lse = flash.dense_fa(q, k, v, return_lse=True, **_BLK)
    o_ref, lse_ref = oracle.dense_dpa(q, k, v)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(lse, lse_ref, atol=2e-5, rtol=1e-5)


def test_dense_fa_dv_not_equal_d(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 64, dv=128)
    o = flash.dense_fa(q, k, v, **_BLK)
    o_ref, _ = oracle.dense_dpa(q, k, v)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n", [256, 200])
def test_causal_fa(rng, n):
    q, k, v = _qkv(rng, 1, 2, n, 32)
    o, lse = flash.dense_fa(q, k, v, causal=True, return_lse=True, **_BLK)
    o_ref, lse_ref = oracle.dense_dpa(q, k, v, causal=True)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(lse, lse_ref, atol=2e-5, rtol=1e-5)


def test_causal_fa_cross_lengths(rng):
    # decode-style: n_q < n_kv, right-aligned triangle
    b, h, d = 1, 2, 32
    nq, nkv = 64, 256
    q = _rand(rng, b, h, nq, d)
    k = _rand(rng, b, h, nkv, d)
    v = _rand(rng, b, h, nkv, d)
    o = flash.flash_attention(q, k, v, schedule="causal", **_BLK)
    i = jnp.arange(nq)[:, None]
    j = jnp.arange(nkv)[None, :]
    mask = (j <= i + (nkv - nq))[None, None]
    o_ref, _ = oracle._core(q, k, v, 1 / np.sqrt(d), mask=mask)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n,w", [(256, 65), (300, 31), (512, 129)])
def test_sliding_fa(rng, n, w):
    q, k, v = _qkv(rng, 1, 2, n, 32)
    o, lse = flash.sliding_fa(q, k, v, w, return_lse=True, **_BLK)
    o_ref, lse_ref = oracle.sliding_dpa(q, k, v, w)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(lse, lse_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n,w", [(256, 65), (512, 127), (256, 255)])
def test_circulant_fa(rng, n, w):
    q, k, v = _qkv(rng, 1, 2, n, 32)
    o, lse = flash.circulant_fa(q, k, v, w, return_lse=True, **_BLK)
    o_ref, lse_ref = oracle.circulant_dpa(q, k, v, w)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(lse, lse_ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("n,s", [(256, 64), (512, 128), (384, 192)])
def test_block_fa_1d(rng, n, s):
    q, k, v = _qkv(rng, 1, 2, n, 32)
    o = flash.block_fa(q, k, v, s, **_BLK)
    # oracle: block_dpa over (b, n, h, d) layout
    qs = q.transpose(0, 2, 1, 3)
    ks = k.transpose(0, 2, 1, 3)
    vs = v.transpose(0, 2, 1, 3)
    o_ref = oracle.block_dpa(qs, ks, vs, s).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)


def test_block_fa_2d(rng):
    b, h, d = 1, 2, 16
    q = _rand(rng, b, 16, 16, h, d)
    k = _rand(rng, b, 16, 16, h, d)
    v = _rand(rng, b, 16, 16, h, d)
    o = flash.block_fa(q, k, v, 8, **_BLK)
    o_ref = oracle.block_dpa(q, k, v, 8)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)


def test_windowed_fa_1d_overlap(rng):
    b, h, n, d = 1, 2, 64, 16
    q = _rand(rng, b, n, h, d)
    k = _rand(rng, b, n, h, d)
    v = _rand(rng, b, n, h, d)
    o = flash.windowed_fa(q, k, v, 16, stride=8, pad=0, **_BLK)
    o_ref = oracle.windowed_dpa(q, k, v, 16, stride=8, pad=0)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)


def test_windowed_fa_2d(rng):
    b, h, d = 1, 1, 8
    q = _rand(rng, b, 12, 12, h, d)
    k = _rand(rng, b, 12, 12, h, d)
    v = _rand(rng, b, 12, 12, h, d)
    o = flash.windowed_fa(q, k, v, 4, stride=2, pad=1, **_BLK)
    o_ref = oracle.windowed_dpa(q, k, v, 4, stride=2, pad=1)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)


def test_dense_fa_3d_input(rng):
    b, h, d = 1, 2, 16
    q = _rand(rng, b, 4, 4, 4, h, d)
    k = _rand(rng, b, 4, 4, 4, h, d)
    v = _rand(rng, b, 4, 4, 4, h, d)
    o = flash.dense_fa(q, k, v, **_BLK)
    o_ref, _ = oracle.dense_dpa(q, k, v)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)


def test_bf16_accuracy(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 64, dtype=jnp.bfloat16)
    o = flash.dense_fa(q, k, v, **_BLK)
    o_ref, _ = oracle.dense_dpa(q, k, v)  # f32 internally
    assert o.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        o.astype(jnp.float32), o_ref.astype(jnp.float32), atol=2e-2, rtol=2e-2
    )


def test_gqa_matches_repeated_kv(rng):
    """Native GQA (kv-head index maps, no copies) must equal explicitly
    repeated K/V, forward and backward."""
    b, hq, hkv, n, d = 2, 6, 2, 200, 32
    q = jnp.asarray(rng.standard_normal((b, hq, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    kr = jnp.repeat(k, hq // hkv, axis=1)
    vr = jnp.repeat(v, hq // hkv, axis=1)

    o = flash.dense_fa(q, k, v, causal=True, **_BLK)
    o_ref = flash.dense_fa(q, kr, vr, causal=True, **_BLK)
    assert jnp.allclose(o, o_ref, atol=1e-6)

    def loss(q, k, v):
        return jnp.sum(flash.dense_fa(q, k, v, causal=True, **_BLK) ** 2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    gq_r, gk_r, gv_r = jax.grad(
        lambda q, k, v: loss(q, jnp.repeat(k, 3, axis=1),
                             jnp.repeat(v, 3, axis=1)), argnums=(0, 1, 2)
    )(q, k, v)
    assert jnp.allclose(gq, gq_r, atol=1e-4)
    assert jnp.allclose(gk, gk_r, atol=1e-4)
    assert jnp.allclose(gv, gv_r, atol=1e-4)


@pytest.mark.parametrize("bhb", [2, 4])
def test_forced_bh_block_matches_oracle(rng, bhb):
    """force_bh_block packs several batch-head rows per grid step; results
    must be identical to the auto policy (pure scheduling change)."""
    q, k, v = _qkv(rng, 2, 4, 300, 128)  # bh=8, ragged n
    o_ref, _ = oracle.sliding_dpa(q, k, v, 129)
    with flash.force_bh_block(bhb):
        o = flash.sliding_fa(q, k, v, 129, **_BLK)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)
    # non-divisible override falls back to 1
    with flash.force_bh_block(3):
        o = flash.sliding_fa(q, k, v, 129, **_BLK)
    np.testing.assert_allclose(o, o_ref, atol=2e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# in-step pipelined band forward (manual double-buffered kv DMA)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("case", ["sliding", "sliding_causal", "circulant",
                                  "ragged"])
def test_band_pipeline_matches_blockspec_path(rng, case):
    """The hand-pipelined band kernel is the SAME online softmax over the
    same tiles — outputs and lse match the BlockSpec-pipelined path."""
    from tpu_flash.ops import flash

    b, h, d, w = 1, 2, 64, 129
    n = 1000 if case == "ragged" else 1024
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
               for _ in range(3))
    kw = dict(block_q=256, block_kv=256)
    fn = {
        "sliding": lambda: flash.sliding_fa(q, k, v, w, return_lse=True, **kw),
        "ragged": lambda: flash.sliding_fa(q, k, v, w, return_lse=True, **kw),
        "sliding_causal": lambda: flash.sliding_fa(
            q, k, v, w, causal=True, return_lse=True, **kw),
        "circulant": lambda: flash.circulant_fa(
            q, k, v, w, return_lse=True, **kw),
    }[case]
    # pin the BlockSpec path to the exact running max: the DMA-pipeline
    # kernel has no bound-max variant, and this test compares PIPELINES,
    # not max strategies (bound-max default landed r4, logs/r4_exp8.jsonl)
    with flash.force_bound_max(False):
        with flash.band_pipeline(True, sub=256):
            o_p, lse_p = fn()
        o_s, lse_s = fn()
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_s),
                               atol=1e-6)


@pytest.mark.parametrize("case", ["sliding", "sliding_causal", "circulant",
                                  "ragged"])
def test_band_elem_offset_matches_blockspec_path(rng, case):
    """The r5 element-offset band variant (kv slab starts at the block's
    exact band_lo via a dynamic pl.ds DMA offset — DESIGN §22 re-probe)
    computes the same online softmax: outputs and lse match the BlockSpec
    path. The ragged case exercises the end-of-sequence slab clamp, where
    early slabs can fall fully below the band and must be skipped."""
    from tpu_flash.ops import flash

    b, h, d, w = 1, 2, 64, 129
    n = 1000 if case == "ragged" else 1024
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
               for _ in range(3))
    kw = dict(block_q=256, block_kv=256)
    fn = {
        "sliding": lambda: flash.sliding_fa(q, k, v, w, return_lse=True, **kw),
        "ragged": lambda: flash.sliding_fa(q, k, v, w, return_lse=True, **kw),
        "sliding_causal": lambda: flash.sliding_fa(
            q, k, v, w, causal=True, return_lse=True, **kw),
        "circulant": lambda: flash.circulant_fa(
            q, k, v, w, return_lse=True, **kw),
    }[case]
    with flash.force_bound_max(False):
        with flash.band_pipeline(True, sub=256, elem=True):
            o_p, lse_p = fn()
        o_s, lse_s = fn()
    np.testing.assert_allclose(np.asarray(o_p), np.asarray(o_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(lse_p), np.asarray(lse_s),
                               atol=1e-6)


@pytest.mark.parametrize("schedule,kw,okw", [
    ("local", dict(radius=128), dict(window_size=257)),
    ("causal", {}, dict(causal=True)),
    ("dense", {}, {}),
])
@pytest.mark.parametrize("bound", [False, True])
def test_bound_max_kwarg(rng, schedule, kw, okw, bound):
    """The public ``bound_max`` kwarg forces the exact / norm-bound
    running max on the bf16 path; both are exact online softmax
    (any upper bound is just an exponent shift) and must match the
    oracle. Auto-defaults are measured (logs/r4_exp8/9.jsonl); this
    pins the forced settings so the kwarg stays wired."""
    from tpu_flash.ops.flash import flash_attention
    from tpu_flash.ops.oracle import blockwise_dpa

    # d=128: d<=64 dense/causal route to the transposed kernel, whose
    # running max is structurally the bound — the kwarg must be pinned
    # on the STANDARD kernel where it switches real code paths
    b, h, n, d = 1, 2, 512, 128
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
               for _ in range(3))
    got = flash_attention(q, k, v, schedule=schedule, block_q=256,
                          block_kv=256, bound_max=bound, **kw)
    want, _ = blockwise_dpa(q, k, v, chunk=256, **okw)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-3)
