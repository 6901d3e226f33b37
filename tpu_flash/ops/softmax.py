"""Fused softmax primitives (Pallas) — parity with the reference's
``fused_softmax`` family (src/fused_softmax.jl CPU; src/cuda/fused_softmax.jl
GPU row/col/vector kernels).

Three kernel families:

* **Row one-pass** (axis=-1, fiber fits VMEM): whole fibers VMEM-resident,
  max/exp/sum/divide in one pass — the role of the reference's
  shared-memory-cached row kernel (src/cuda/fused_softmax.jl:99-207).
* **Col one-pass** (axis=-2, fiber fits VMEM): reduction over the *sublane*
  axis of the tile — no transpose, unlike round 1's moveaxis fallback.
  Reference col kernel: src/cuda/fused_softmax.jl:209-314.
* **Chunked two-pass** (either axis, fiber > VMEM): a stats kernel streams
  chunks with an online (m, l) merge — the same algebra as the flash
  kernel's softmax — and emits per-fiber ``lse = m + log(l)``; a second
  elementwise kernel computes ``exp(x - lse)``. Three HBM passes total
  (2 reads + 1 write), vs XLA's materialized max/exp/sum chain. This is
  the TPU analog of the reference's cooperative-grid vector softmax
  (src/cuda/fused_softmax.jl:11-88): its grid-wide sync between the
  max/sum/normalize phases becomes the Pallas grid's sequential chunk axis
  plus a second kernel launch.

The reference's stream-split trick for >2^16 fibers (:186-204) maps to the
Pallas grid: fibers tile over a ``parallel`` grid dimension and Mosaic
splits it over megacores; no manual stream plumbing is needed.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.ops.schedule import cdiv

# Chunk budget per VMEM block. Scoped-VMEM limit observed on this v5e is
# 16 MB; with in/out double buffering 4 blocks are live, so ~2 MB each.
_BLOCK_BYTES = 2 << 20
_NEG_BIG = -1e30  # -inf stand-in that survives (x - m) subtraction


def _pad_to(x, axis, mult, value=0.0):
    n = x.shape[axis]
    pad = cdiv(n, mult) * mult - n
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------- row kernels


def _row_onepass_kernel(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    m = jnp.max(x, axis=-1, keepdims=True)
    p = jnp.exp(x - m)
    o_ref[...] = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(o_ref.dtype)


def _row_stats_kernel(x_ref, lse_ref, m_ref, l_ref, *, nchunks: int):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref)

    x = x_ref[...].astype(jnp.float32)
    m_new = jnp.maximum(m_ref[...], jnp.max(x, axis=-1, keepdims=True))
    p = jnp.exp(x - m_new)
    l_ref[...] = l_ref[...] * jnp.exp(m_ref[...] - m_new) + jnp.sum(
        p, axis=-1, keepdims=True
    )
    m_ref[...] = m_new

    @pl.when(c == nchunks - 1)
    def _fin():
        lse_ref[...] = m_ref[...] + jnp.log(l_ref[...])


def _row_norm_kernel(x_ref, lse_ref, o_ref):
    o_ref[...] = jnp.exp(
        x_ref[...].astype(jnp.float32) - lse_ref[...]
    ).astype(o_ref.dtype)


def _row_softmax(x2, interpret: bool, block_rows: int):
    rows, n = x2.shape
    dtype = x2.dtype

    if n * 4 * 8 <= _BLOCK_BYTES:
        # One-pass: whole fibers in VMEM.
        budget_rows = max(_BLOCK_BYTES // max(n * 4, 1), 8)
        br = min(block_rows, rows, budget_rows)
        br = max(br // 8 * 8, 1) if br >= 8 else br
        x2 = _pad_to(x2, 0, br)
        rows_pad = x2.shape[0]
        out = pl.pallas_call(
            _row_onepass_kernel,
            grid=(rows_pad // br,),
            in_specs=[pl.BlockSpec((br, n), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((br, n), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows_pad, n), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
            ),
            interpret=interpret,
        )(x2)
        return out[:rows]

    # Two-pass chunked: fibers longer than a VMEM block.
    bc = 2048
    br = max(min(block_rows, rows, _BLOCK_BYTES // (bc * 4)) // 8 * 8, 8)
    x2 = _pad_to(_pad_to(x2, 1, bc, _NEG_BIG), 0, br)
    rows_pad, n_pad = x2.shape
    grid = (rows_pad // br, n_pad // bc)
    lse = pl.pallas_call(
        functools.partial(_row_stats_kernel, nchunks=grid[1]),
        grid=grid,
        in_specs=[pl.BlockSpec((br, bc), lambda i, c: (i, c))],
        out_specs=pl.BlockSpec((br, 1), lambda i, c: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((br, 1), jnp.float32),
            pltpu.VMEM((br, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x2)
    out = pl.pallas_call(
        _row_norm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, bc), lambda i, c: (i, c)),
            pl.BlockSpec((br, 1), lambda i, c: (i, 0)),
        ],
        out_specs=pl.BlockSpec((br, bc), lambda i, c: (i, c)),
        out_shape=jax.ShapeDtypeStruct((rows_pad, n_pad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(x2, lse)
    return out[:rows, :n]


# ---------------------------------------------------------------- col kernels


def _col_onepass_kernel(x_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    m = jnp.max(x, axis=-2, keepdims=True)
    p = jnp.exp(x - m)
    o_ref[...] = (p / jnp.sum(p, axis=-2, keepdims=True)).astype(o_ref.dtype)


def _col_stats_kernel(x_ref, lse_ref, m_ref, l_ref, *, nchunks: int):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG_BIG)
        l_ref[...] = jnp.zeros_like(l_ref)

    x = x_ref[...].astype(jnp.float32)
    m_new = jnp.maximum(m_ref[...], jnp.max(x, axis=-2, keepdims=True))
    p = jnp.exp(x - m_new)
    l_ref[...] = l_ref[...] * jnp.exp(m_ref[...] - m_new) + jnp.sum(
        p, axis=-2, keepdims=True
    )
    m_ref[...] = m_new

    @pl.when(c == nchunks - 1)
    def _fin():
        lse_ref[...] = m_ref[...] + jnp.log(l_ref[...])


def _col_norm_kernel(x_ref, lse_ref, o_ref):
    o_ref[...] = jnp.exp(
        x_ref[...].astype(jnp.float32) - lse_ref[...]
    ).astype(o_ref.dtype)


def _col_softmax(x3, interpret: bool):
    """Softmax over axis=-2 of ``(L, n, m)`` — sublane reduction, no
    transpose."""
    L, n, m = x3.shape
    dtype = x3.dtype

    n8 = cdiv(n, 8) * 8
    if n8 * 128 * 4 <= _BLOCK_BYTES:
        # One-pass: full fibers (n) in the sublane axis of one block.
        bm = min(max(_BLOCK_BYTES // (n8 * 4) // 128 * 128, 128), 512)
        x3 = _pad_to(_pad_to(x3, 1, 8, _NEG_BIG), 2, bm)
        _, n_pad, m_pad = x3.shape
        bm = min(bm, m_pad)
        out = pl.pallas_call(
            _col_onepass_kernel,
            grid=(L, m_pad // bm),
            in_specs=[pl.BlockSpec((1, n_pad, bm), lambda l, j: (l, 0, j))],
            out_specs=pl.BlockSpec((1, n_pad, bm), lambda l, j: (l, 0, j)),
            out_shape=jax.ShapeDtypeStruct((L, n_pad, m_pad), dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=interpret,
        )(x3)
        return out[:, :n, :m]

    # Two-pass chunked over the fiber (n) axis.
    bm = 512
    bn = max(_BLOCK_BYTES // (bm * 4) // 8 * 8, 8)
    x3 = _pad_to(_pad_to(x3, 1, bn, _NEG_BIG), 2, bm)
    _, n_pad, m_pad = x3.shape
    bm = min(bm, m_pad)
    grid = (L, m_pad // bm, n_pad // bn)
    lse = pl.pallas_call(
        functools.partial(_col_stats_kernel, nchunks=grid[2]),
        grid=grid,
        in_specs=[pl.BlockSpec((1, bn, bm), lambda l, j, c: (l, c, j))],
        out_specs=pl.BlockSpec((1, 1, bm), lambda l, j, c: (l, 0, j)),
        out_shape=jax.ShapeDtypeStruct((L, 1, m_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, 1, bm), jnp.float32),
            pltpu.VMEM((1, 1, bm), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x3)
    out = pl.pallas_call(
        _col_norm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, bm), lambda l, j, c: (l, c, j)),
            pl.BlockSpec((1, 1, bm), lambda l, j, c: (l, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, bn, bm), lambda l, j, c: (l, c, j)),
        out_shape=jax.ShapeDtypeStruct((L, n_pad, m_pad), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(x3, lse)
    return out[:, :n, :m]


# -------------------------------------------------------------------- public


def fused_softmax(
    x: jnp.ndarray,
    axis: int = -1,
    *,
    block_rows: int = 1024,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Numerically-stable softmax over ``axis``, fused in Pallas kernels.

    axis=-1 uses the row (lane-reduction) kernels; axis=-2 uses the
    dedicated column (sublane-reduction) kernels with no transpose; other
    axes are moved to the last position first. Fibers longer than a VMEM
    block stream through the chunked two-pass (online-merge) kernels.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    axis = axis % x.ndim

    if axis == x.ndim - 2 and x.ndim >= 2:
        lead = x.shape[:-2]
        L = 1
        for s in lead:
            L *= s
        n, m = x.shape[-2], x.shape[-1]
        out = _col_softmax(x.reshape(L, n, m), interpret)
        return out.reshape(*lead, n, m)

    xt = jnp.moveaxis(x, axis, -1) if axis != x.ndim - 1 else x
    lead = xt.shape[:-1]
    n = xt.shape[-1]
    rows = 1
    for s in lead:
        rows *= s
    out = _row_softmax(xt.reshape(rows, n), interpret, block_rows)
    out = out.reshape(*lead, n)
    return jnp.moveaxis(out, -1, axis) if axis != x.ndim - 1 else out
