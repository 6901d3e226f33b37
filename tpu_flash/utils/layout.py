"""Index & layout utilities: circulant band algebra and N-d window (im2col).

TPU-native re-expression of the reference's L1 layer (src/utils.jl):

* ``circulant_neighbors`` replaces ``cartesian_circulant`` (src/utils.jl:6-17):
  instead of a flat-nonzero-index → (i, j) map feeding scalar gathers, we emit
  the whole (N, W) neighbour index array at once so gathers are batched XLA
  ops — and the flash kernels avoid gathers entirely by re-deriving the band
  as contiguous block schedules (see ops/schedule.py).
* ``window`` / ``unwindow`` replace the NNlib unfold/fold pair
  (src/utils.jl:36-54). ``window`` is built on
  ``lax.conv_general_dilated_patches`` (XLA's im2col); ``unwindow`` is its
  exact adjoint obtained with ``jax.linear_transpose`` so the
  overlap-averaging semantics of the reference (src/naive/windowed.jl:16-19)
  are reproduced for any rank/stride/padding without hand-written scatter
  code. Supports 1D/2D/3D spatial inputs.

Layout: spatial arrays are ``(batch, *spatial, channels)``.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax


def _as_tuple(x, n: int) -> tuple:
    if isinstance(x, (list, tuple)):
        if len(x) != n:
            raise ValueError(f"expected length-{n} tuple, got {x}")
        return tuple(x)
    return (x,) * n


def circulant_neighbors(n: int, w: int) -> jnp.ndarray:
    """Neighbour index map of the N×N band-circulant attention pattern.

    Query ``i`` attends keys ``(i + o) mod n`` for offsets
    ``o ∈ [-(w-1)//2, (w-1)//2]`` (``w`` odd), reproducing the sparsity
    pattern of the reference's ``cartesian_circulant`` (src/utils.jl:6-17)
    for the whole matrix in one vectorised expression.

    Returns int32 array of shape ``(n, w)``; ``[i, c]`` is the key index for
    query ``i``, column ``c`` (offsets in ascending order).
    """
    if w % 2 != 1:
        raise ValueError(f"circulant window must be odd, got {w}")
    if w > n:
        raise ValueError(f"window {w} larger than sequence {n}")
    p = (w - 1) // 2
    i = jnp.arange(n, dtype=jnp.int32)[:, None]
    o = jnp.arange(-p, p + 1, dtype=jnp.int32)[None, :]
    return jnp.mod(i + o, n)


def circulant_matrix(values: jnp.ndarray) -> "jax.experimental.sparse.BCOO":
    """Build the N×N band-circulant sparse matrix from per-entry values.

    ``values`` is ``(n, w)`` (``w`` odd): ``A[i, (i + o) mod n] =
    values[i, c]`` for offset ``o = c - (w-1)//2``. The JAX-native
    re-expression of the reference's CSC builder ``circulant(V)``
    (src/utils.jl:19-30) — BCOO instead of CSC because XLA's sparse
    support is COO-based.
    """
    from jax.experimental import sparse

    n, w = values.shape
    idx_j = circulant_neighbors(n, w)
    idx_i = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, w))
    indices = jnp.stack([idx_i.reshape(-1), idx_j.reshape(-1)], axis=-1)
    return sparse.BCOO((values.reshape(-1), indices), shape=(n, n))


def batch_circulant(values: jnp.ndarray) -> "jax.experimental.sparse.BCOO":
    """Batched circulant builder: ``(b, n, w)`` → BCOO ``(b, n, n)``.

    The reference block-diagonalizes per-batch circulants into one big
    sparse matrix (``batch_circulant``, src/utils.jl:32-34) because Julia's
    sparse matvec is 2D-only; BCOO batch dimensions make the block-diag
    embedding unnecessary.
    """
    from jax.experimental import sparse

    b, n, w = values.shape
    idx_j = circulant_neighbors(n, w)
    idx_i = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, w))
    indices = jnp.stack([idx_i.reshape(-1), idx_j.reshape(-1)], axis=-1)
    indices = jnp.broadcast_to(indices[None], (b, n * w, 2))
    return sparse.BCOO(
        (values.reshape(b, n * w), indices), shape=(b, n, n)
    )


def window(
    x: jnp.ndarray,
    window_size,
    *,
    stride=None,
    pad=0,
) -> jnp.ndarray:
    """Extract sliding windows (im2col) from ``(batch, *spatial, channels)``.

    The N-d analog of reference ``window`` (src/utils.jl:36-44): 1D/2D/3D
    windowed attention reduces to dense attention over the extracted patches.

    Returns ``(batch, num_windows, prod(window_size), channels)`` where
    patch elements are ordered row-major over the spatial dims (matching
    ``conv_general_dilated_patches``).
    """
    nd = x.ndim - 2
    if nd not in (1, 2, 3):
        raise ValueError(f"expected 1/2/3 spatial dims, got shape {x.shape}")
    ws = _as_tuple(window_size, nd)
    st = _as_tuple(stride if stride is not None else window_size, nd)
    pd = _as_tuple(pad, nd)

    b, c = x.shape[0], x.shape[-1]
    # Per-dim strided gathers, not conv_general_dilated_patches: the conv
    # formulation materializes an identity filter of shape
    # (c·∏ws, c, *ws) — gigabytes as a captured constant for large 1D
    # windows — while a (nw, w) row gather per dim is O(nw·w) index data.
    out = jnp.pad(x, [(0, 0)] + [(p, p) for p in pd] + [(0, 0)])
    padded = out.shape[1:-1]
    axis = 1
    for k in range(nd):
        nw = (padded[k] - ws[k]) // st[k] + 1
        if nw <= 0:
            raise ValueError(
                f"window {ws[k]} exceeds padded spatial extent {padded[k]} "
                f"on dim {k} (input {x.shape}; layout is (batch, *spatial, "
                "channels) — a (b, h, n, d) attention array passed here is "
                "usually a layout mistake)"
            )
        starts = jnp.arange(nw, dtype=jnp.int32) * st[k]
        idx = starts[:, None] + jnp.arange(ws[k], dtype=jnp.int32)[None, :]
        out = jnp.take(out, idx, axis=axis)  # inserts (nw, w) at axis
        axis += 2
    # (b, nw1, w1, …, nwk, wk, c) → (b, nw…, w…, c), both row-major.
    perm = (
        [0]
        + [1 + 2 * k for k in range(nd)]
        + [2 + 2 * k for k in range(nd)]
        + [out.ndim - 1]
    )
    out = out.transpose(perm)
    nwin = math.prod(out.shape[1 : 1 + nd])
    return out.reshape(b, nwin, math.prod(ws), c)


def _window_out_spatial(spatial, ws, st, pd):
    return tuple((s + 2 * p - w) // t + 1 for s, w, t, p in zip(spatial, ws, st, pd))


@functools.lru_cache(maxsize=64)
def _unwindow_fn(shape: tuple, dtype_name: str, ws: tuple, st: tuple, pd: tuple):
    """Adjoint of ``window`` for a given input geometry, via linear_transpose."""
    dtype = jnp.dtype(dtype_name)
    primal = jax.ShapeDtypeStruct(shape, dtype)

    def fwd(x):
        return window(x, ws, stride=st, pad=pd)

    transpose = jax.linear_transpose(fwd, primal)

    def apply(patches):
        (out,) = transpose(patches)
        return out

    return jax.jit(apply)


def unwindow(
    patches: jnp.ndarray,
    spatial: Sequence[int],
    window_size,
    *,
    stride=None,
    pad=0,
) -> jnp.ndarray:
    """Fold windows back to ``(batch, *spatial, channels)``, summing overlaps.

    Exact adjoint of :func:`window` (the NNlib ``fold`` role,
    src/utils.jl:46-54). Combined with :func:`window_counts` it reproduces
    the reference's overlap-averaging (src/naive/windowed.jl:16-19).
    """
    nd = len(spatial)
    ws = _as_tuple(window_size, nd)
    st = _as_tuple(stride if stride is not None else window_size, nd)
    pd = _as_tuple(pad, nd)
    b, c = patches.shape[0], patches.shape[-1]
    shape = (b, *spatial, c)
    fn = _unwindow_fn(tuple(shape), jnp.dtype(patches.dtype).name, ws, st, pd)
    return fn(patches)


def window_counts(spatial: Sequence[int], window_size, *, stride=None, pad=0) -> jnp.ndarray:
    """Per-position window coverage count ``unwindow(window(ones))``.

    The overlap divisor of reference src/windowed.jl:16-17. Shape
    ``(1, *spatial, 1)``; zero where no window covers a position (those
    outputs are defined as zero, matching the reference's 0/0→NaN avoided
    by masking here).
    """
    nd = len(spatial)
    ones = jnp.ones((1, *spatial, 1), jnp.float32)
    w = window(ones, window_size, stride=stride, pad=pad)
    counts = unwindow(w, spatial, window_size, stride=stride, pad=pad)
    return counts


def flatten_spatial(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple]:
    """(batch, *spatial, heads, dim) → ((batch, heads, N, dim), spatial)."""
    *lead, h, d = x.shape
    b, spatial = lead[0], tuple(lead[1:])
    n = math.prod(spatial)
    return jnp.moveaxis(x.reshape(b, n, h, d), 1, 2), spatial


def unflatten_spatial(x: jnp.ndarray, spatial: tuple) -> jnp.ndarray:
    """(batch, heads, N, dim) → (batch, *spatial, heads, dim)."""
    b, h, n, d = x.shape
    return jnp.moveaxis(x, 1, 2).reshape(b, *spatial, h, d)
