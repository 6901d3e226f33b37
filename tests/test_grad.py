"""Backward-pass correctness: jax.grad through the flash kernels must match
grad through the f32 oracle — the test the reference never had (its backward
contained undefined variables and never ran, src/dense.jl:104-167)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops import flash, oracle

_BLK = dict(block_q=128, block_kv=128)


def _rand(rng, *shape, dtype=jnp.float32):
    return jnp.asarray(rng.standard_normal(shape), dtype)


def _qkv(rng, b, h, n, d, dv=None):
    return (
        _rand(rng, b, h, n, d),
        _rand(rng, b, h, n, d),
        _rand(rng, b, h, n, dv or d),
    )


def _check_grads(fa_fn, oracle_fn, q, k, v, atol=3e-4):
    w = jnp.asarray(
        np.random.default_rng(7).standard_normal(
            (q.shape[0], q.shape[1], q.shape[2], v.shape[-1])
        ),
        jnp.float32,
    )

    def loss_fa(q, k, v):
        return jnp.sum(fa_fn(q, k, v) * w)

    def loss_ref(q, k, v):
        return jnp.sum(oracle_fn(q, k, v) * w)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_fa, g_ref):
        np.testing.assert_allclose(
            a, b, atol=atol, rtol=1e-3, err_msg=f"d{name} mismatch"
        )


@pytest.mark.parametrize("n", [256, 200])
def test_dense_grad(rng, n):
    q, k, v = _qkv(rng, 1, 2, n, 32)
    _check_grads(
        lambda q, k, v: flash.dense_fa(q, k, v, **_BLK),
        lambda q, k, v: oracle.dense_dpa(q, k, v)[0],
        q, k, v,
    )


def test_dense_grad_dv_neq_d(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 32, dv=64)
    _check_grads(
        lambda q, k, v: flash.dense_fa(q, k, v, **_BLK),
        lambda q, k, v: oracle.dense_dpa(q, k, v)[0],
        q, k, v,
    )


@pytest.mark.parametrize("n", [256, 200])
def test_causal_grad(rng, n):
    q, k, v = _qkv(rng, 1, 2, n, 32)
    _check_grads(
        lambda q, k, v: flash.dense_fa(q, k, v, causal=True, **_BLK),
        lambda q, k, v: oracle.dense_dpa(q, k, v, causal=True)[0],
        q, k, v,
    )


@pytest.mark.parametrize("n,w", [(256, 65), (300, 31)])
def test_sliding_grad(rng, n, w):
    q, k, v = _qkv(rng, 1, 2, n, 32)
    _check_grads(
        lambda q, k, v: flash.sliding_fa(q, k, v, w, **_BLK),
        lambda q, k, v: oracle.sliding_dpa(q, k, v, w)[0],
        q, k, v,
    )


@pytest.mark.parametrize("n,w", [(256, 65), (256, 255)])
def test_circulant_grad(rng, n, w):
    """Includes the halo fold-back: grads w.r.t. k/v must account for the
    wraparound copies (handled by autodiff of the halo concat)."""
    q, k, v = _qkv(rng, 1, 2, n, 32)
    _check_grads(
        lambda q, k, v: flash.circulant_fa(q, k, v, w, **_BLK),
        lambda q, k, v: oracle.circulant_dpa(q, k, v, w)[0],
        q, k, v,
    )


def test_block_grad(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 32)
    _check_grads(
        lambda q, k, v: flash.block_fa(q, k, v, 64, **_BLK),
        lambda q, k, v: oracle.block_dpa(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3), v.transpose(0, 2, 1, 3), 64
        ).transpose(0, 2, 1, 3),
        q, k, v,
    )


def test_lse_cotangent(rng):
    """Gradient flows through the lse output (the ring-merge path)."""
    q, k, v = _qkv(rng, 1, 1, 128, 32)

    def loss_fa(q, k, v):
        o, lse = flash.dense_fa(q, k, v, return_lse=True, **_BLK)
        return jnp.sum(o) + jnp.sum(lse * 0.3)

    def loss_ref(q, k, v):
        o, lse = oracle.dense_dpa(q, k, v)
        return jnp.sum(o) + jnp.sum(lse * 0.3)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_fa, g_ref):
        np.testing.assert_allclose(
            a, b, atol=3e-4, rtol=1e-3, err_msg=f"d{name} mismatch"
        )


def test_windowed_grad(rng):
    """Windowed path: grads flow through window-extract + kernel + fold."""
    b, h, n, d = 1, 1, 64, 16
    q = _rand(rng, b, n, h, d)
    k = _rand(rng, b, n, h, d)
    v = _rand(rng, b, n, h, d)
    w = _rand(rng, b, n, h, d)

    def loss_fa(q, k, v):
        return jnp.sum(flash.windowed_fa(q, k, v, 16, stride=8, pad=0, **_BLK) * w)

    def loss_ref(q, k, v):
        return jnp.sum(oracle.windowed_dpa(q, k, v, 16, stride=8, pad=0) * w)

    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_fa, g_ref):
        np.testing.assert_allclose(
            a, b, atol=3e-4, rtol=1e-3, err_msg=f"d{name} mismatch"
        )


@pytest.mark.parametrize("schedule_kw", [
    {},                       # dense
    {"causal": True},         # masked path exercises per-sub-tile iota
])
def test_dense_grad_bwd_split(rng, schedule_kw):
    """split=2 sub-tile staging in the d=128 backward kernels is a pure
    reassociation: grads still match the oracle. Exercises the bwd_split
    kwarg plumbing (flash_attention → _fa nondiff arg → flash_backward)."""
    q, k, v = _qkv(rng, 1, 2, 512, 128)
    blk = dict(block_q=256, block_kv=256, bwd_split=2)
    _check_grads(
        lambda q, k, v: flash.dense_fa(q, k, v, **blk, **schedule_kw),
        lambda q, k, v: oracle.dense_dpa(q, k, v, **schedule_kw)[0],
        q, k, v,
        atol=1e-3,
    )


@pytest.mark.parametrize("schedule_kw", [{}, {"causal": True}])
def test_bwd_quant_dp(rng, schedule_kw):
    """bwd_quant="dp" (int8 dO·Vᵀ dots, DESIGN §23 follow-up): gradients
    stay within the quantized-backward contract (rel ≤ 2.5e-2) against the
    oracle grads; dv is exact-path and holds the plain tolerance."""
    q, k, v = _qkv(rng, 1, 2, 256, 128)
    w = _rand(rng, 1, 2, 256, 128)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v) * w), argnums=(0, 1, 2))

    fa = loss(lambda q, k, v: flash.flash_attention(
        q, k, v, schedule="causal" if schedule_kw else "dense",
        bwd_quant="dp", **_BLK))(q, k, v)
    ref = loss(lambda q, k, v: oracle.blockwise_dpa(
        q, k, v, **schedule_kw)[0])(q, k, v)
    for name, a, b, tol in zip("qkv", fa, ref, (2.5e-2, 2.5e-2, 1e-3)):
        rel = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        assert rel <= tol, (name, rel)


def test_bwd_quant_rejects_unknown_mode(rng):
    q, k, v = _qkv(rng, 1, 1, 128, 128)
    with pytest.raises(ValueError, match="quant"):
        jax.grad(lambda q: jnp.sum(flash.flash_attention(
            q, k, v, bwd_quant="int4", **_BLK)))(q)
