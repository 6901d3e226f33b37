"""Fused softmax primitive (Pallas) — parity with the reference's
``fused_softmax`` family (src/fused_softmax.jl CPU; src/cuda/fused_softmax.jl
GPU row/col/vector kernels).

On TPU a softmax fiber lives in VMEM and the whole max/exp/sum/divide chain
fuses into one kernel-resident pass — the role the reference's
shared-memory-cached CUDA kernels played (src/cuda/fused_softmax.jl:99-207).
The reference's stream-split trick for >2¹⁶ fibers (:186-204) maps to the
Pallas grid: fibers are tiled over grid steps and Mosaic splits the parallel
dimension over megacores; no manual stream plumbing exists or is needed.

``axis`` may be -1 (rows, lanes) or -2 (columns, sublanes); other axes are
handled by transposition in the wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.ops.schedule import cdiv


def _softmax_kernel(x_ref, o_ref, *, axis: int):
    x = x_ref[...].astype(jnp.float32)
    m = jnp.max(x, axis=axis, keepdims=True)
    p = jnp.exp(x - m)
    o_ref[...] = (p / jnp.sum(p, axis=axis, keepdims=True)).astype(o_ref.dtype)


def fused_softmax(
    x: jnp.ndarray,
    axis: int = -1,
    *,
    block_rows: int = 1024,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax over ``axis``, fused in one Pallas pass.

    The non-softmax dims are flattened and tiled over the grid; each grid
    step reduces whole fibers held in VMEM (single pass: max, exp, sum,
    divide — reference src/fused_softmax.jl:17-27 semantics).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    axis = axis % x.ndim
    # Move the softmax axis last, flatten the rest to rows.
    xt = jnp.moveaxis(x, axis, -1)
    lead = xt.shape[:-1]
    n = xt.shape[-1]
    rows = 1
    for s in lead:
        rows *= s
    x2 = xt.reshape(rows, n)

    # VMEM budget: a fiber must be VMEM-resident for the one-pass kernel —
    # the reference's cache-derived Bc sizing (src/dense.jl:34), here per
    # fiber length. Scoped-vmem limit observed on v5e is 16 MB and in/out
    # double buffering keeps 4 row-blocks live, so cap blocks at ≈2 MB.
    # Fibers too long for even an 8-row block fall back to XLA's softmax
    # (a chunked multi-pass kernel would match XLA's HBM traffic anyway —
    # the fused win exists only for VMEM-resident fibers).
    if n * 4 * 8 > (2 << 20):
        out = jax.nn.softmax(x2.astype(jnp.float32), axis=-1).astype(x.dtype)
        return jnp.moveaxis(out.reshape(*lead, n), -1, axis)
    budget_rows = max(int((2 << 20) // max(n * 4, 1)), 8)
    br = min(block_rows, rows, budget_rows)
    br = max(br // 8 * 8, 1) if br >= 8 else br
    rows_pad = cdiv(rows, br) * br
    if rows_pad != rows:
        x2 = jnp.pad(x2, ((0, rows_pad - rows), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_softmax_kernel, axis=-1),
        grid=(rows_pad // br,),
        in_specs=[pl.BlockSpec((br, n), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((br, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2)
    out = out[:rows].reshape(*lead, n)
    return jnp.moveaxis(out, -1, axis)
