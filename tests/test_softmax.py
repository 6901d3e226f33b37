"""Fused softmax kernels vs jax.nn.softmax — the reference anchors its
fused softmax to NNlib's (bench/softmax.jl:21-22,45-46); same role here.

Covers all four kernel families: row one-pass, row chunked two-pass
(fiber > VMEM block), col one-pass (sublane reduction, no transpose), col
chunked two-pass — plus the moveaxis fallback for interior axes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops.softmax import fused_softmax

RNG = np.random.default_rng(7)


def _x(shape, dtype=jnp.float32, scale=3.0):
    return jnp.asarray(RNG.standard_normal(shape) * scale, dtype)


@pytest.mark.parametrize(
    "shape,axis",
    [
        ((37, 500), -1),  # row one-pass, ragged rows
        ((3, 5, 300), -1),  # leading dims collapse
        ((8, 70000), -1),  # row two-pass (fiber > VMEM block)
        ((300, 40), -2),  # col one-pass, ragged lanes
        ((2, 1000, 130), -2),  # col one-pass, 3-d
        ((5000, 260), -2),  # col two-pass (fiber > sublane budget)
        ((2, 5000, 130), -2),  # col two-pass, 3-d
        ((4, 7, 9), 0),  # moveaxis fallback
        ((10, 11, 12), 1),  # axis=-2 of 3-d via col kernel
    ],
)
def test_matches_xla(shape, axis):
    x = _x(shape)
    got = fused_softmax(x, axis=axis)
    want = jax.nn.softmax(x, axis=axis)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_bf16_io_f32_compute():
    x = _x((64, 3000), jnp.bfloat16)
    got = fused_softmax(x, axis=-1)
    want = jax.nn.softmax(x.astype(jnp.float32), axis=-1)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=1e-2
    )


def test_extreme_values_stable():
    # Large magnitudes: the online merge must not overflow exp.
    x = _x((16, 70000), scale=50.0)
    got = fused_softmax(x, axis=-1)
    assert bool(jnp.all(jnp.isfinite(got)))
    np.testing.assert_allclose(
        np.asarray(jnp.sum(got, -1)), np.ones(16), rtol=1e-5
    )


def test_rows_sum_to_one_col_axis():
    x = _x((5000, 200))
    got = fused_softmax(x, axis=0)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(got, 0)), np.ones(200), rtol=1e-5
    )
