"""f32 oracle attention family — the ground-truth path.

TPU-native replacement for the reference's L3 naive oracles (src/naive/):
pure-jnp implementations that materialize the full attention matrix in f32
and are used to (a) anchor the Pallas kernels' correctness and (b) bound
quantized-kernel error (≤1e-2 max-abs per BASELINE.md).

Reference parity map:
* ``dense_dpa``      ↔ src/naive/dense.jl:8-35 (P = softmax(QKᵀ/√d), O = P V)
* ``windowed_dpa``   ↔ src/naive/windowed.jl:3-22 (window → dense → unwindow,
  overlapping windows *averaged* by coverage count, :16-19)
* ``block_dpa``      ↔ src/naive/windowed.jl:1 (stride = window, pad = 0)
* ``circulant_dpa``  ↔ src/naive/circulant.jl:8-36 (band with wraparound) —
  extended here to any spatial rank via flattened sequence, vs 1D-only in the
  reference (README.md:24-27).
* ``sliding_dpa``    — no reference analog: standard sliding-window (local)
  attention, one softmax per query over its clamped band. Provided because
  it is the production long-context variant the flash path also serves.

All cores take ``(batch, heads, seq, head_dim)`` and compute in f32
regardless of input dtype, returning outputs in the input dtype and the
per-row log-sum-exp (the FA-2 form of the reference's ``(l, m)`` running
statistics, src/dense.jl:15-18 — ``lse = m + log l`` carries the same
merge algebra).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_flash.utils.layout import (
    circulant_neighbors,
    flatten_spatial,
    unflatten_spatial,
    window,
    unwindow,
    window_counts,
)

_NEG_INF = float("-inf")


_HI = jax.lax.Precision.HIGHEST  # true f32 MXU passes — this is the oracle


def _core(q, k, v, scale, mask=None, bias=None, return_p=False):
    """softmax(scale·QKᵀ + bias, masked) V in f32; returns (o, lse[, p])."""
    q32, k32, v32 = (x.astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("bhqd,bhkd->bhqk", q32, k32, precision=_HI) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    if mask is not None:
        s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    # Fully-masked rows: define output 0, lse = -inf.
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(s - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v32, precision=_HI) / jnp.maximum(l, 1e-30)
    lse = (m_safe + jnp.log(jnp.maximum(l, 1e-30))).squeeze(-1)
    lse = jnp.where(jnp.isfinite(m.squeeze(-1)), lse, _NEG_INF)
    o = jnp.where(jnp.isfinite(m), o, 0.0)
    if return_p:
        return o.astype(q.dtype), lse, p / jnp.maximum(l, 1e-30)
    return o.astype(q.dtype), lse


def _default_scale(d: int, scale: Optional[float]) -> float:
    return 1.0 / math.sqrt(d) if scale is None else scale


def dense_dpa(q, k, v, *, scale=None, causal=False, return_p=False):
    """Dense oracle attention.

    Args:
      q, k, v: ``(batch, heads, n, d)`` (v may have different last dim).
        N-d inputs ``(batch, *spatial, heads, d)`` are accepted and have
        their spatial dims flattened (reference src/naive/dense.jl:20-35).
      scale: logit scale, default ``1/√d``.
      causal: lower-triangular mask (not in the reference; required for LM
        inference).
      return_p: also return the normalized attention matrix.

    Returns ``(o, lse)`` (and ``p`` if requested).
    """
    spatial = None
    if q.ndim > 4:
        q, spatial = flatten_spatial(q)
        k, _ = flatten_spatial(k)
        v, _ = flatten_spatial(v)
    scale = _default_scale(q.shape[-1], scale)
    mask = None
    if causal:
        n, nk = q.shape[-2], k.shape[-2]
        mask = jnp.tril(jnp.ones((n, nk), bool), k=nk - n)[None, None]
    out = _core(q, k, v, scale, mask=mask, return_p=return_p)
    if spatial is not None:
        out = (unflatten_spatial(out[0], spatial), *out[1:])
    return out


def sliding_dpa(q, k, v, window_size: int, *, scale=None, causal=False):
    """Standard sliding-window (local band) attention oracle.

    Query ``i`` attends keys ``j`` with ``|i-j| ≤ (window_size-1)//2``
    (clamped at the edges, no wraparound), one softmax per query.
    """
    if window_size % 2 != 1:
        raise ValueError("sliding window must be odd")
    scale = _default_scale(q.shape[-1], scale)
    n, nk = q.shape[-2], k.shape[-2]
    p = (window_size - 1) // 2
    i = jnp.arange(n)[:, None]
    j = jnp.arange(nk)[None, :]
    mask = jnp.abs(i - j) <= p
    if causal:
        mask &= j <= i
    return _core(q, k, v, scale, mask=mask[None, None])


def windowed_dpa(q, k, v, window_size, *, stride=None, pad=0, scale=None):
    """Windowed oracle attention over 1D/2D/3D inputs.

    Inputs are ``(batch, *spatial, heads, d)``. Windows of shape
    ``window_size`` (per-dim) are extracted with ``stride``/``pad``; dense
    attention runs independently inside each window; outputs at positions
    covered by several windows are **averaged** by coverage count —
    reference semantics exactly (src/naive/windowed.jl:3-22).

    Returns ``o`` with the input's shape (lse is per-(window,row) and not
    meaningful after overlap-averaging, so it is not returned — the
    reference reshapes it similarly only for the flash variant).
    """
    nd = q.ndim - 3
    if nd not in (1, 2, 3):
        raise ValueError(f"expected (batch, *spatial(1..3), heads, d), got {q.shape}")
    b, *spatial, h, d = q.shape
    dv = v.shape[-1]
    scale = _default_scale(d, scale)

    def to_patches(x):
        xdim = x.shape[-1]
        flat = x.reshape(b, *spatial, h * xdim)
        pw = window(flat, window_size, stride=stride, pad=pad)
        nwin, wlen = pw.shape[1], pw.shape[2]
        pw = pw.reshape(b, nwin, wlen, h, xdim)
        # (b·nwin, h, wlen, xdim)
        return pw.transpose(0, 1, 3, 2, 4).reshape(b * nwin, h, wlen, xdim), nwin, wlen

    qw, nwin, wlen = to_patches(q)
    kw, _, _ = to_patches(k)
    vw, _, _ = to_patches(v)
    ow, _ = _core(qw, kw, vw, scale)
    # back to (b, nwin, wlen, h·dv) patches and fold.
    ow = ow.reshape(b, nwin, h, wlen, dv).transpose(0, 1, 3, 2, 4).reshape(b, nwin, wlen, h * dv)
    folded = unwindow(ow, spatial, window_size, stride=stride, pad=pad)
    counts = window_counts(spatial, window_size, stride=stride, pad=pad).astype(folded.dtype)
    out = jnp.where(counts > 0, folded / jnp.maximum(counts, 1), 0)
    return out.reshape(b, *spatial, h, dv).astype(q.dtype)


def block_dpa(q, k, v, block_size, *, scale=None):
    """Disjoint block-diagonal oracle: windowed with stride=window, pad=0
    (reference src/naive/windowed.jl:1)."""
    return windowed_dpa(q, k, v, block_size, stride=block_size, pad=0, scale=scale)


def blockwise_dpa(
    q,
    k,
    v,
    *,
    scale=None,
    causal: bool = False,
    window_size: Optional[int] = None,
    wrap: bool = False,
    block_size: Optional[int] = None,
    chunk: int = 2048,
    q_start: int = 0,
):
    """Exact f32 oracle with O(n·chunk) memory — usable at bench shapes.

    Mathematically identical to ``dense_dpa``/``sliding_dpa``/
    ``circulant_dpa``/``block_dpa`` (as selected by the mask arguments) but
    never materializes the (n, n) score matrix: it scans KV in chunks with
    the associative online-softmax merge — the reference's (l, m) algebra
    (src/dense.jl:82-89) run in f32/HIGHEST, so it serves as ground truth at
    n = 8k–32k where the dense oracle exceeds HBM (VERDICT r2 item 6: 48
    bench rows carried max_abs_err = NaN because only the O(N²) oracle
    existed).

    Masks (mutually exclusive beyond ``causal``):
      * ``window_size`` (odd): sliding band |i−j| ≤ (W−1)/2, clamped —
        or circulant wraparound when ``wrap=True``.
      * ``block_size``: disjoint block-diagonal (i//B == j//B).

    ``q_start``: global index of q's first row. Query rows are independent
    in attention, so passing a row band ``q[:, :, a:b]`` with ``q_start=a``
    yields exactly rows a..b of the full result — that is how bench gates
    check 16k–32k shapes without an O(N²) pass per row.

    Returns ``(o, lse)`` with o in q's dtype.
    """
    if window_size is not None and block_size is not None:
        raise ValueError("window_size and block_size are mutually exclusive")
    if window_size is not None and window_size % 2 != 1:
        raise ValueError("sliding/circulant window must be odd")
    b, h, n, d = q.shape
    nk = k.shape[-2]
    dv = v.shape[-1]
    scale = _default_scale(d, scale)
    chunk = min(chunk, nk)
    if nk % chunk != 0:
        # pad kv to a chunk multiple; padding is masked out below.
        pad = chunk - nk % chunk
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
    nck = k.shape[-2] // chunk

    q32 = q.astype(jnp.float32)
    kc = k.astype(jnp.float32).reshape(b, h, nck, chunk, k.shape[-1])
    vc = v.astype(jnp.float32).reshape(b, h, nck, chunk, dv)
    kc = jnp.moveaxis(kc, 2, 0)  # (nck, b, h, chunk, d)
    vc = jnp.moveaxis(vc, 2, 0)
    qi = q_start + jnp.arange(n)[:, None]
    radius = (window_size - 1) // 2 if window_size is not None else 0

    def body(carry, xs):
        m, l, acc = carry
        kj, vj, c = xs
        j = c * chunk + jnp.arange(chunk)[None, :]
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, kj, precision=_HI) * scale
        live = j < nk
        if causal:
            live &= j <= qi
        if window_size is not None:
            if wrap:
                off = (qi - j) % nk
                live &= (off <= radius) | (off >= nk - radius)
            else:
                live &= jnp.abs(qi - j) <= radius
        if block_size is not None:
            live &= (qi // block_size) == (j // block_size)
        s = jnp.where(live[None, None], s, _NEG_INF)
        mj = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, mj)
        m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - m_safe)
        alpha = jnp.exp(jnp.where(jnp.isfinite(m), m - m_safe, _NEG_INF))
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = alpha * acc + jnp.einsum(
            "bhqk,bhkd->bhqd", p, vj, precision=_HI)
        return (m_new, l_new, acc_new), None

    init = (
        jnp.full((b, h, n, 1), _NEG_INF, jnp.float32),
        jnp.zeros((b, h, n, 1), jnp.float32),
        jnp.zeros((b, h, n, dv), jnp.float32),
    )
    # checkpoint keeps grad-through-the-oracle at O(n·chunk) residuals too
    # (otherwise scan saves every chunk's (n, chunk) score tile = O(N²)),
    # so backward bench rows can gate against ∇blockwise_dpa at 8k–16k.
    (m, l, acc), _ = jax.lax.scan(
        jax.checkpoint(body), init, (kc, vc, jnp.arange(nck)))
    o = (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)
    o = jnp.where(jnp.isfinite(m), o, 0)
    lse = jnp.where(
        jnp.isfinite(m), m + jnp.log(jnp.maximum(l, 1e-30)), _NEG_INF
    ).squeeze(-1)
    return o, lse


def circulant_dpa(q, k, v, window_size: int, *, scale=None, return_p=False):
    """Circulant-band oracle: query ``i`` attends keys ``(i+o) mod n``,
    ``o ∈ [-(W-1)/2, (W-1)/2]`` (reference src/naive/circulant.jl:8-36).

    Accepts ``(batch, heads, n, d)`` or N-d ``(batch, *spatial, heads, d)``
    (flattened — generalizing the reference's 1D-only support).
    Returns ``(o, lse)``.
    """
    spatial = None
    if q.ndim > 4:
        q, spatial = flatten_spatial(q)
        k, _ = flatten_spatial(k)
        v, _ = flatten_spatial(v)
    b, h, n, d = q.shape
    scale = _default_scale(d, scale)
    idx = circulant_neighbors(n, window_size)  # (n, W)
    kg = k.astype(jnp.float32)[:, :, idx]  # (b, h, n, W, d)
    vg = v.astype(jnp.float32)[:, :, idx]
    s = jnp.einsum("bhnd,bhnwd->bhnw", q.astype(jnp.float32), kg, precision=_HI) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhnw,bhnwd->bhnd", p / l, vg, precision=_HI).astype(q.dtype)
    lse = (m + jnp.log(l)).squeeze(-1)
    if spatial is not None:
        o = unflatten_spatial(o, spatial)
    if return_p:
        return o, lse, p / l
    return o, lse
