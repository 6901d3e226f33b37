"""Ulysses (all-to-all) sequence parallelism on the 8-device CPU mesh:
exactness vs the oracle for every schedule, GQA head handling, gradients,
and agreement with the ring path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops import oracle
from tpu_flash.parallel import make_mesh, ring_dense_fa
from tpu_flash.parallel.ulysses import ulysses_fa

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)

_BLK = dict(block_q=128, block_kv=128)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _qkv(rng, b, h, n, d, hkv=None):
    return (
        _rand(rng, b, h, n, d),
        _rand(rng, b, hkv or h, n, d),
        _rand(rng, b, hkv or h, n, d),
    )


@pytest.fixture(scope="module")
def seq_mesh():
    return make_mesh(data=1, model=1, seq=4)


def test_ulysses_dense(rng, seq_mesh):
    q, k, v = _qkv(rng, 1, 4, 1024, 32)
    fn = ulysses_fa(seq_mesh, schedule="dense", **_BLK)
    o = fn(q, k, v)
    o_ref, _ = oracle.dense_dpa(q, k, v)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-5, rtol=1e-4)


def test_ulysses_causal(rng, seq_mesh):
    q, k, v = _qkv(rng, 1, 4, 1024, 32)
    fn = ulysses_fa(seq_mesh, schedule="causal", **_BLK)
    o = fn(q, k, v)
    o_ref, _ = oracle.dense_dpa(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-5, rtol=1e-4)


@pytest.mark.parametrize("radius", [64, 200])
def test_ulysses_sliding(rng, seq_mesh, radius):
    q, k, v = _qkv(rng, 1, 4, 1024, 32)
    fn = ulysses_fa(seq_mesh, schedule="local", radius=radius, **_BLK)
    o = fn(q, k, v)
    o_ref, _ = oracle.sliding_dpa(q, k, v, 2 * radius + 1)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-5, rtol=1e-4)


def test_ulysses_circulant(rng, seq_mesh):
    q, k, v = _qkv(rng, 1, 4, 1024, 32)
    fn = ulysses_fa(seq_mesh, schedule="circulant", radius=64, **_BLK)
    o = fn(q, k, v)
    o_ref, _ = oracle.circulant_dpa(q, k, v, 129)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-5, rtol=1e-4)


def test_ulysses_gqa_repeat(rng, seq_mesh):
    """KV heads (2) not divisible by the axis (4): Ulysses replicates them
    up to the Q head count and must still match the GQA oracle."""
    q, k, v = _qkv(rng, 1, 4, 512, 32, hkv=2)
    fn = ulysses_fa(seq_mesh, schedule="causal", **_BLK)
    o = fn(q, k, v)
    kf = jnp.repeat(k, 2, axis=1)
    vf = jnp.repeat(v, 2, axis=1)
    o_ref, _ = oracle.dense_dpa(q, kf, vf, causal=True)
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-5, rtol=1e-4)


def test_ulysses_gqa_sharded(rng, seq_mesh):
    """KV heads (8) divisible by the axis (4): the GQA ratio survives the
    head split (2 kv heads per shard) — no replication traffic."""
    q, k, v = _qkv(rng, 1, 8, 512, 32, hkv=8)
    kk, vv = k[:, ::2], v[:, ::2]  # 4 kv heads, group size 2
    fn = ulysses_fa(seq_mesh, schedule="causal", **_BLK)
    o = fn(q, kk, vv)
    o_ref, _ = oracle.dense_dpa(
        q, jnp.repeat(kk, 2, axis=1), jnp.repeat(vv, 2, axis=1), causal=True
    )
    np.testing.assert_allclose(np.asarray(o), np.asarray(o_ref), atol=3e-5, rtol=1e-4)


def test_ulysses_matches_ring(rng, seq_mesh):
    q, k, v = _qkv(rng, 2, 4, 512, 32)
    o_u = ulysses_fa(seq_mesh, schedule="causal", **_BLK)(q, k, v)
    o_r = ring_dense_fa(seq_mesh, pattern="causal", **_BLK)(q, k, v)
    np.testing.assert_allclose(np.asarray(o_u), np.asarray(o_r), atol=3e-5, rtol=1e-4)


def test_ulysses_grad_matches_oracle(rng, seq_mesh):
    """Autodiff transposes each all_to_all into its inverse — gradients
    through the sharded path must match the oracle's."""
    q, k, v = _qkv(rng, 1, 4, 512, 32)
    fn = ulysses_fa(seq_mesh, schedule="causal", **_BLK)

    def loss_sharded(q, k, v):
        return jnp.sum(fn(q, k, v) ** 2)

    def loss_ref(q, k, v):
        o, _ = oracle.dense_dpa(q, k, v, causal=True)
        return jnp.sum(o ** 2)

    g_s = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_s, g_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
        )
