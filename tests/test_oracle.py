"""Oracle correctness: anchor to jax.nn.dot_product_attention (the NNlib
ground-truth role, reference test/test.jl:14) and internal consistency
between the oracle family members."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops import oracle
from tpu_flash.utils import layout


def _rand(rng, *shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


# Ragged shapes on purpose: edge fibers exercised (reference used N=30, d=12).
@pytest.mark.parametrize("n,d", [(30, 12), (128, 64), (100, 32)])
def test_dense_dpa_matches_jax_sdpa(rng, n, d):
    b, h = 2, 3
    q = _rand(rng, b, h, n, d)
    k = _rand(rng, b, h, n, d)
    v = _rand(rng, b, h, n, d)
    o, lse = oracle.dense_dpa(q, k, v)
    # jax.nn.dot_product_attention wants (b, n, h, d)
    ref = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3)
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(o, ref, atol=1e-5, rtol=1e-5)
    # lse sanity: exp(lse) = rowsum of exp(scaled scores)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d)
    np.testing.assert_allclose(
        lse, jax.scipy.special.logsumexp(s, axis=-1), atol=1e-5, rtol=1e-5
    )


def test_dense_dpa_dv_not_equal_d(rng):
    # dv ≠ d (reference test/test.jl uses dqk=12, dv=6); check vs plain math.
    b, h, n, d, dv = 2, 2, 30, 12, 6
    q, k = _rand(rng, b, h, n, d), _rand(rng, b, h, n, d)
    v = _rand(rng, b, h, n, dv)
    o, _ = oracle.dense_dpa(q, k, v)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    np.testing.assert_allclose(o, ref, atol=1e-5, rtol=1e-5)


def test_dense_dpa_causal(rng):
    b, h, n, d = 1, 2, 37, 16
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    o, _ = oracle.dense_dpa(q, k, v, causal=True)
    ref = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3),
        k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        is_causal=True,
    ).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(o, ref, atol=1e-5, rtol=1e-5)


def test_dense_dpa_nd_flattens(rng):
    b, h, d = 2, 2, 8
    q = _rand(rng, b, 4, 6, h, d)
    k = _rand(rng, b, 4, 6, h, d)
    v = _rand(rng, b, 4, 6, h, d)
    o, _ = oracle.dense_dpa(q, k, v)
    qf, sp = layout.flatten_spatial(q)
    kf, _ = layout.flatten_spatial(k)
    vf, _ = layout.flatten_spatial(v)
    of, _ = oracle.dense_dpa(qf, kf, vf)
    np.testing.assert_allclose(o, layout.unflatten_spatial(of, sp), atol=1e-6)


def test_window_unwindow_adjoint(rng):
    # <window(x), y> == <x, unwindow(y)> — adjointness of im2col/fold.
    x = _rand(rng, 2, 12, 10, 3)
    y_shape = layout.window(x, (4, 5), stride=(2, 3), pad=1).shape
    y = _rand(rng, *y_shape)
    lhs = jnp.vdot(layout.window(x, (4, 5), stride=(2, 3), pad=1), y)
    rhs = jnp.vdot(x, layout.unwindow(y, (12, 10), (4, 5), stride=(2, 3), pad=1))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_window_counts_1d():
    # len 8, window 4, stride 2, no pad: windows at 0,2,4 →
    # coverage: [1,1,2,2,2,2,1,1]
    counts = layout.window_counts((8,), 4, stride=2, pad=0)
    np.testing.assert_array_equal(
        np.asarray(counts).squeeze(), [1, 1, 2, 2, 2, 2, 1, 1]
    )


@pytest.mark.parametrize("spatial", [(16,), (8, 8), (4, 4, 4)])
def test_block_dpa_equals_masked_dense(rng, spatial):
    """Disjoint blocks: windowed_dpa(stride=W) == dense attention restricted
    to each block (checked in 1D against an explicit mask)."""
    b, h, d = 1, 2, 8
    q = _rand(rng, b, *spatial, h, d)
    k = _rand(rng, b, *spatial, h, d)
    v = _rand(rng, b, *spatial, h, d)
    block = 4 if len(spatial) == 1 else 2
    o = oracle.block_dpa(q, k, v, block)
    assert o.shape == q.shape
    if len(spatial) == 1:
        n = spatial[0]
        qf, sp = layout.flatten_spatial(q)
        kf, _ = layout.flatten_spatial(k)
        vf, _ = layout.flatten_spatial(v)
        i = jnp.arange(n)
        mask = (i[:, None] // block) == (i[None, :] // block)
        of, _ = oracle._core(qf, kf, vf, 1.0 / np.sqrt(d), mask=mask[None, None])
        np.testing.assert_allclose(o, layout.unflatten_spatial(of, sp), atol=1e-5)


def test_windowed_dpa_overlap_average(rng):
    """Overlapping windows average: with window W=4, stride 2 in 1D, interior
    positions are covered by 2 windows; verify against a hand-rolled
    per-window dense computation."""
    b, h, n, d = 1, 1, 8, 4
    q = _rand(rng, b, n, h, d)
    k = _rand(rng, b, n, h, d)
    v = _rand(rng, b, n, h, d)
    o = oracle.windowed_dpa(q, k, v, 4, stride=2, pad=0)

    qf = q[:, :, 0]  # (b, n, d)
    acc = np.zeros((n, d), np.float32)
    cnt = np.zeros((n, 1), np.float32)
    for start in range(0, n - 4 + 1, 2):
        sl = slice(start, start + 4)
        qs, ks, vs = (np.asarray(x[0, sl, 0]) for x in (q, k, v))
        s = qs @ ks.T / np.sqrt(d)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        acc[sl] += p @ vs
        cnt[sl] += 1
    ref = acc / cnt
    np.testing.assert_allclose(o[0, :, 0], ref, atol=1e-5)


def test_circulant_dpa_band(rng):
    """Circulant band equals dense attention under the wraparound band mask."""
    b, h, n, d, w = 1, 2, 12, 8, 5
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    o, lse = oracle.circulant_dpa(q, k, v, w)
    p = (w - 1) // 2
    i = jnp.arange(n)
    delta = jnp.abs(i[:, None] - i[None, :])
    mask = jnp.minimum(delta, n - delta) <= p
    ref, ref_lse = oracle._core(q, k, v, 1.0 / np.sqrt(d), mask=mask[None, None])
    np.testing.assert_allclose(o, ref, atol=1e-5)
    np.testing.assert_allclose(lse, ref_lse, atol=1e-5)


def test_circulant_neighbors_wraparound():
    idx = np.asarray(layout.circulant_neighbors(6, 3))
    np.testing.assert_array_equal(idx[0], [5, 0, 1])
    np.testing.assert_array_equal(idx[5], [4, 5, 0])


def test_sliding_dpa_clamps_edges(rng):
    b, h, n, d, w = 1, 1, 10, 4, 5
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    o, _ = oracle.sliding_dpa(q, k, v, w)
    i = jnp.arange(n)
    mask = jnp.abs(i[:, None] - i[None, :]) <= 2
    ref, _ = oracle._core(q, k, v, 0.5, mask=mask[None, None])
    np.testing.assert_allclose(o, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# blockwise (O(N)-memory) oracle — must agree with the materialized oracles
# bit-for-bit up to f32 merge rounding, on every mask family, including
# ragged n (chunk does not divide n) and chunk > n.
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("n,chunk", [(96, 32), (100, 32), (48, 64)])
def test_blockwise_dense_matches_dense(rng, n, chunk):
    b, h, d = 2, 3, 16
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    o, lse = oracle.blockwise_dpa(q, k, v, chunk=chunk)
    ref, ref_lse = oracle.dense_dpa(q, k, v)
    np.testing.assert_allclose(o, ref, atol=1e-5)
    np.testing.assert_allclose(lse, ref_lse, atol=1e-5)


def test_blockwise_causal(rng):
    b, h, n, d = 1, 2, 70, 8
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    o, lse = oracle.blockwise_dpa(q, k, v, causal=True, chunk=32)
    ref, ref_lse = oracle.dense_dpa(q, k, v, causal=True)
    np.testing.assert_allclose(o, ref, atol=1e-5)
    np.testing.assert_allclose(lse, ref_lse, atol=1e-5)


def test_blockwise_sliding(rng):
    b, h, n, d, w = 1, 2, 90, 8, 11
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    o, lse = oracle.blockwise_dpa(q, k, v, window_size=w, chunk=32)
    ref, ref_lse = oracle.sliding_dpa(q, k, v, w)
    np.testing.assert_allclose(o, ref, atol=1e-5)
    np.testing.assert_allclose(lse, ref_lse, atol=1e-5)


def test_blockwise_circulant(rng):
    b, h, n, d, w = 1, 2, 64, 8, 9
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    o, lse = oracle.blockwise_dpa(q, k, v, window_size=w, wrap=True, chunk=16)
    ref, ref_lse = oracle.circulant_dpa(q, k, v, w)
    np.testing.assert_allclose(o, ref, atol=1e-5)
    np.testing.assert_allclose(lse, ref_lse, atol=1e-5)


def test_blockwise_block_diagonal(rng):
    b, h, n, d, sec = 1, 2, 96, 8, 24
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    o, _ = oracle.blockwise_dpa(q, k, v, block_size=sec, chunk=32)
    tr = lambda x: x.transpose(0, 2, 1, 3)
    ref = tr(oracle.block_dpa(tr(q), tr(k), tr(v), sec))
    np.testing.assert_allclose(o, ref, atol=1e-5)


def test_blockwise_fully_masked_rows(rng):
    """Causal + cross attention where early queries see no keys: the
    blockwise oracle must emit o=0, lse=-inf like dense_dpa does."""
    b, h, n, d = 1, 1, 8, 4
    q, k, v = (_rand(rng, b, h, n, d) for _ in range(3))
    # block_size=4 with chunk=2 exercises masked-everything chunks too.
    o, lse = oracle.blockwise_dpa(q, k, v, block_size=4, chunk=2)
    assert bool(jnp.all(jnp.isfinite(lse)))
    o2, lse2 = oracle.blockwise_dpa(q, k, v, causal=True, chunk=4)
    ref, ref_lse = oracle.dense_dpa(q, k, v, causal=True)
    np.testing.assert_allclose(o2, ref, atol=1e-5)
