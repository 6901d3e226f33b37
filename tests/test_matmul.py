"""Matmul study kernels + sparse circulant builders — unlike the reference's
assertion-free study scripts (test/matmul.jl), these are tested."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops.matmul import circulant_matmul, matmul, matvec
from tpu_flash.utils.layout import batch_circulant, circulant_matrix, circulant_neighbors


@pytest.mark.parametrize("shape", [(256, 256, 256), (300, 130, 70), (1024, 512, 256)])
def test_matmul_matches_jnp(rng, shape):
    m, k, n = shape
    a = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)
    got = matmul(a, b, block_m=256, block_n=256, block_k=128)
    want = a @ b
    assert float(jnp.max(jnp.abs(got - want))) < 1e-2


def test_matvec(rng):
    a = jnp.asarray(rng.standard_normal((257, 129)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(129), jnp.float32)
    got = matvec(a, x, block_m=128, block_k=128)
    assert float(jnp.max(jnp.abs(got - a @ x))) < 1e-2


def test_circulant_matrix_structure(rng):
    n, w = 12, 5
    vals = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
    dense = circulant_matrix(vals).todense()
    idx = np.asarray(circulant_neighbors(n, w))
    expect = np.zeros((n, n), np.float32)
    for i in range(n):
        for c in range(w):
            expect[i, idx[i, c]] = vals[i, c]
    assert np.allclose(np.asarray(dense), expect)


def test_batch_circulant_matvec(rng):
    b, n, w = 3, 16, 5
    vals = jnp.asarray(rng.standard_normal((b, n, w)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    A = batch_circulant(vals)
    got = jnp.einsum("bij,bj->bi", A.todense(), x)
    want = jnp.stack([
        circulant_matrix(vals[i]).todense() @ x[i] for i in range(b)
    ])
    assert np.allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_circulant_matmul_matches_dense(rng):
    n, w = 64, 9
    vals = jnp.asarray(rng.standard_normal((n, w)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, 7)), jnp.float32)
    got = circulant_matmul(vals, x)
    want = circulant_matrix(vals).todense() @ x
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4

    xv = jnp.asarray(rng.standard_normal(n), jnp.float32)
    got_v = circulant_matmul(vals, xv)
    want_v = circulant_matrix(vals).todense() @ xv
    assert float(jnp.max(jnp.abs(got_v - want_v))) < 1e-4
