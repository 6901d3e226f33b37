"""Paged-attention decode kernel: one query token per sequence, K/V read
page-by-page from the paged cache through scalar-prefetched page tables.

This is the decode half of the north star (the prefill half is ops/flash.py).
Grid = (batch, kv_heads, max_pages); the page table is a scalar-prefetch
input so each grid step's BlockSpec index map can point the DMA engine at
the right physical page before the kernel body runs — pages stream HBM→VMEM
double-buffered by the Pallas pipeline, which is the whole game for decode
(HBM-bandwidth-bound; the MXU is idle either way at G = q_heads/kv_heads
rows per dot).

Quantized caches (int8 / int4-packed) are dequantized in-register:
int4 unpack is two VPU shifts + one lane concat (see
quant/qarray.py pack_int4_halves); per-token scales fold into the score
columns (K) and into P's columns before the PV dot (V), so no per-element
dequant multiplies touch the (page × head_dim) tiles.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.cache.paged_cache import PagedKVCache
from tpu_flash.ops.flash import DEFAULT_MASK_VALUE, LN2, LOG2E, _interpret_default
from tpu_flash.ops.schedule import cdiv
from tpu_flash.quant.flash_q import _fp8_upcast

_F8 = (jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2))


def _deq_vals(x, dtype):
    """Storage values → compute dtype. fp8 pages decode through the
    `_fp8_upcast` bit-trick (Mosaic's fp8 astype lowering is slow —
    quant/flash_q.py §8 notes); everything else is a plain astype."""
    if jnp.dtype(x.dtype) in _F8:
        x = _fp8_upcast(x)
    return x.astype(dtype)

_LANES = 128
_NT = (((1,), (1,)), ((), ()))
_NN = (((1,), (0,)), ((), ()))
# per-array VMEM budget for keeping quantization scales grid-resident
_RESIDENT_SCALES_BYTES = 2 * 1024 * 1024


def _encode_row(x, *, quantized: bool, int4: bool, out_dtype):
    """(kvh, d) f32 → (storage values (kvh, stor), scales (kvh, 1) | None).
    Matches PagedKVCache._encode exactly (same clip ranges/eps)."""
    if not quantized:
        return x.astype(out_dtype), None
    if jnp.dtype(out_dtype) in _F8:
        amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        sc = jnp.maximum(amax, 1e-12) / 448.0
        return (x / sc).astype(out_dtype), sc
    qmax = 7.0 if int4 else 127.0
    qmin = -8.0 if int4 else -127.0
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    sc = jnp.maximum(amax, 1e-12) / qmax
    qv = jnp.clip(jnp.round(x / sc), qmin, qmax).astype(jnp.int32)
    if int4:
        d = qv.shape[-1]
        qv = (qv[:, : d // 2] & 0x0F) | ((qv[:, d // 2 :] & 0x0F) << 4)
    return qv.astype(jnp.int8), sc


def _paged_kernel(
    # scalar prefetch: lens, pt [, tpage, off when appending]
    *all_refs,
    page: int,
    num_steps: int,
    quantized: bool,
    int4: bool,
    head_dim: int,
    append: bool,
    want_lse: bool,
    resident_scales: bool,
    shared_table: bool = False,
):
    if append:
        (lens_ref, pt_ref, start_ref, tpage_ref, off_ref, q_ref, k_ref,
         v_ref, *rest) = all_refs
        if quantized:
            (ks_ref, vs_ref, kn_ref, vn_ref, o_ref, kp_out, vp_out,
             ks_out, vs_out, *rest2) = rest
        else:
            (kn_ref, vn_ref, o_ref, kp_out, vp_out, *rest2) = rest
            ks_ref = vs_ref = ks_out = vs_out = None
    else:
        (lens_ref, pt_ref, start_ref, q_ref, k_ref, v_ref, *rest) = all_refs
        if quantized:
            (ks_ref, vs_ref, o_ref, *rest2) = rest
        else:
            (o_ref, *rest2) = rest
    if want_lse:
        (lse_ref, m_scr, l_scr, acc_scr) = rest2
    else:
        (m_scr, l_scr, acc_scr) = rest2
        lse_ref = None

    b = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    length = lens_ref[b]
    # banded (sliding-window) decode starts at token `start` (0 for full
    # attention): grid step i covers page start//page + i, so the bound can
    # be sized to the WINDOW, not the sequence.
    start_tok = start_ref[b]
    start_pg = start_tok // page
    page_idx = start_pg + i
    num_pages = pl.cdiv(length, page) - start_pg

    if quantized and resident_scales:
        # Scales live whole-array in VMEM (constant index map → fetched
        # once for the entire grid); slice this step's physical page here.
        # Streaming them as per-page blocks added two ~256 B DMAs to every
        # grid step — at decode's tiny per-step compute the step count is
        # the cost, and this pays for a large share of it (measured ~20%
        # off the int8 decode attention stack).
        np_b = jnp.maximum(pl.cdiv(length, page), 1)
        phys = pt_ref[0 if shared_table else b,
                      jnp.clip(page_idx, 0, np_b - 1)]
        ks_blk = ks_ref[:, pl.ds(phys, 1)]  # (kvh, 1, 1, page)
        vs_blk = vs_ref[:, pl.ds(phys, 1)]
    elif quantized:
        ks_blk = ks_ref[...]
        vs_blk = vs_ref[...]
    else:
        ks_blk = vs_blk = None

    if append:
        # Fused append: the target page is being read for attention anyway,
        # so the new token's row is merged in-register and written back
        # through an aliased output whose index map points at the TARGET
        # page for every step of the lane — the block is written exactly
        # once (at i == tpage) and Pallas flushes it at the lane boundary.
        # Writing every visited page back instead measurably serializes the
        # input pipeline.
        off = off_ref[b]
        is_target = page_idx == tpage_ref[b]
        kn, ksc = _encode_row(
            kn_ref[0].astype(jnp.float32),
            quantized=quantized, int4=int4, out_dtype=kp_out.dtype,
        )
        vn, vsc = _encode_row(
            vn_ref[0].astype(jnp.float32),
            quantized=quantized, int4=int4, out_dtype=vp_out.dtype,
        )
        row_hit = (
            lax.broadcasted_iota(jnp.int32, (1, 1, page, 1), 2) == off
        ) & is_target
        wd = (jnp.int32 if jnp.issubdtype(kp_out.dtype, jnp.integer)
              else jnp.float32)

        def merged_pages(pages_ref, vals):
            return jnp.where(
                row_hit, _deq_vals(vals, wd)[:, None, None, :],
                _deq_vals(pages_ref[...], wd),
            )

        k_merged = merged_pages(k_ref, kn)
        v_merged = merged_pages(v_ref, vn)
        if quantized:
            col_hit = (
                lax.broadcasted_iota(jnp.int32, (1, 1, 1, page), 3) == off
            ) & is_target
            ks_m = jnp.where(col_hit, ksc[:, :, None, None], ks_blk)
            vs_m = jnp.where(col_hit, vsc[:, :, None, None], vs_blk)

        @pl.when(is_target)
        def _write_target_page():
            kp_out[...] = k_merged.astype(kp_out.dtype)
            vp_out[...] = v_merged.astype(vp_out.dtype)
            if quantized:
                ks_out[...] = ks_m
                vs_out[...] = vs_m

    # All kv heads per grid step (batched over the head dim) — one head per
    # step multiplied the per-step fixed cost by kvh and left each DMA at a
    # single 8-16 KB page (measured 2048 steps ≈ 0.6 ms/layer of pure
    # overhead at batch 16).
    @pl.when(i < num_pages)
    def _step():
        q = q_ref[0]      # (kvh, G, d) — pre-scaled bf16/f32
        if append:
            k = k_merged[:, 0].astype(kp_out.dtype)  # (kvh, page, stor)
            v = v_merged[:, 0].astype(vp_out.dtype)
        else:
            k = k_ref[:, 0]   # (kvh, page, stor)
            v = v_ref[:, 0]
        if int4:
            # Mosaic has no int8 shifts; widen to int32 (sign-extending),
            # then two arithmetic shifts recover each nibble.
            def _unpack(x):
                x32 = x.astype(jnp.int32)
                lo = (x32 << 28) >> 28
                hi = x32 >> 4
                return jnp.concatenate([lo, hi], axis=-1)

            k = _unpack(k)
            v = _unpack(v)
        kf = _deq_vals(k, q.dtype)
        vf = _deq_vals(v, q.dtype)

        # (kvh, G, d) x (kvh, page, d) -> (kvh, G, page), batched over heads
        s = lax.dot_general(
            q, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if quantized:
            s = s * (ks_m[:, 0] if append else ks_blk[:, 0])  # (kvh, 1, page)
        # mask outside [start, length) — beyond-length tail of the last
        # page, and (for banded decode) pre-window head of the first page
        k_pos = page_idx * page + lax.broadcasted_iota(
            jnp.int32, (1, 1, page), 2)
        s = jnp.where((k_pos >= start_tok) & (k_pos < length), s,
                      DEFAULT_MASK_VALUE)

        m_prev = m_scr[:, :, :1]
        l_prev = l_scr[:, :, :1]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
        if quantized:
            p = p * (vs_m[:, 0] if append else vs_blk[:, 0])  # (kvh, 1, page)
        # (kvh, G, page) x (kvh, page, stor) -> (kvh, G, stor)
        pv = lax.dot_general(
            p.astype(vf.dtype), vf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(i == num_steps - 1)
    def _finish():
        l = l_scr[:, :, :1]
        m = m_scr[:, :, :1]
        # empty/fully-masked shard: o = 0, lse = -inf (merge weight 0)
        valid = (l > 0.0) & (m > DEFAULT_MASK_VALUE * 0.5)
        l_inv = jnp.where(valid, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        if want_lse:
            lse = jnp.where(
                valid,
                m * LN2 + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                -jnp.inf,
            )
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _append_kernel(
    # scalar prefetch
    phys_ref,
    off_ref,
    # inputs
    kn_ref,  # (1, kh, d) new K for this lane
    vn_ref,
    kp_in,   # (kh, 1, page, stor) aliased page block (read side)
    vp_in,
    *rest,
    page: int,
    quantized: bool,
    int4: bool,
):
    if quantized:
        (ks_in, vs_in, kp_out, vp_out, ks_out, vs_out) = rest
    else:
        (kp_out, vp_out) = rest
        ks_in = vs_in = ks_out = vs_out = None

    b = pl.program_id(0)
    off = off_ref[b]
    row_hit = lax.broadcasted_iota(jnp.int32, (1, page, 1), 1) == off

    def rmw(pages_in, pages_out, scales_in, scales_out, xn_ref):
        x = xn_ref[0].astype(jnp.float32)  # (kh, d)
        vals, sc = _encode_row(
            x, quantized=quantized, int4=int4, out_dtype=pages_out.dtype
        )
        old = pages_in[...]  # (kh, 1, page, stor)
        # row `off` of the page gets vals[h]; everything else kept. The
        # merge runs in 32-bit: Mosaic cannot relayout sub-32-bit vectors
        # through the rank-4 broadcast reshape ("unsupported shape cast"
        # on vector<2x32xi8>).
        wd = (jnp.int32 if jnp.issubdtype(pages_out.dtype, jnp.integer)
              else jnp.float32)
        upd = jnp.where(
            row_hit[None],                        # (1, 1, page, 1)
            _deq_vals(vals, wd)[:, None, None, :],  # (kh, 1, 1, stor)
            _deq_vals(old, wd),
        )
        pages_out[...] = upd.astype(pages_out.dtype)
        if scales_out is not None:
            olds = scales_in[...]  # (kh, 1, 1, page)
            col_hit = lax.broadcasted_iota(jnp.int32, (1, 1, 1, page), 3) == off
            scales_out[...] = jnp.where(col_hit, sc[:, :, None, None], olds)

    rmw(kp_in, kp_out, ks_in, ks_out, kn_ref)
    rmw(vp_in, vp_out, vs_in, vs_out, vn_ref)


def fused_append(
    cache: PagedKVCache,
    slots: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    interpret: Optional[bool] = None,
):
    """One-token-per-slot cache append as a single Pallas kernel.

    Replaces the XLA scatter path (``.at[:, phys, offset].set``) which costs
    ~1.3 ms per layer on v5e — scatter on TPU serializes per index — with a
    scalar-prefetched read-modify-write of exactly one page block per lane,
    quantization fused in-register. Returns the four updated page arrays
    (values + scales; scales are None for unquantized caches).
    """
    cfg = cache.config
    b = slots.shape[0]
    # Geometry from the ARRAYS, not the config: inside a tensor-parallel
    # shard_map the local shard holds num_kv_heads/tp heads while the
    # static config still records the global count.
    kh, _, page, stor = cache.k_pages.shape
    d = k.shape[-1]
    quantized = cfg.quantized
    int4 = cfg.dtype == "int4"
    if interpret is None:
        interpret = _interpret_default()

    pos = cache.lengths[slots]
    phys = cache.page_tables[slots, pos // page].astype(jnp.int32)
    off = (pos % page).astype(jnp.int32)

    if k.shape != (b, kh, d) or v.shape != (b, kh, d):
        raise ValueError(
            f"append expects k/v of shape {(b, kh, d)}, got {k.shape}/{v.shape}"
        )
    kn, vn = k, v

    page_spec = pl.BlockSpec(
        (kh, 1, page, stor), lambda bi, phys, off: (0, phys[bi], 0, 0)
    )
    # scales ride as (kh, P, 1, page) so the block's trailing dims satisfy
    # the TPU (8,128)-or-full-dim tiling rule (same trick as paged_attention)
    scale_spec = pl.BlockSpec(
        (kh, 1, 1, page), lambda bi, phys, off: (0, phys[bi], 0, 0)
    )
    new_spec = pl.BlockSpec((1, kh, d), lambda bi, phys, off: (bi, 0, 0))

    in_specs = [new_spec, new_spec, page_spec, page_spec]
    inputs = [kn, vn, cache.k_pages, cache.v_pages]
    out_specs = [page_spec, page_spec]
    out_shapes = [
        jax.ShapeDtypeStruct(cache.k_pages.shape, cache.k_pages.dtype),
        jax.ShapeDtypeStruct(cache.v_pages.shape, cache.v_pages.dtype),
    ]
    # alias indices count scalar-prefetch args first (2 of them)
    aliases = {4: 0, 5: 1}
    if quantized:
        sc_shape = cache.k_scales.shape  # (kh, P, page)
        sc4 = (kh, sc_shape[1], 1, page)
        in_specs += [scale_spec, scale_spec]
        inputs += [cache.k_scales.reshape(sc4), cache.v_scales.reshape(sc4)]
        out_specs += [scale_spec, scale_spec]
        out_shapes += [
            jax.ShapeDtypeStruct(sc4, jnp.float32),
            jax.ShapeDtypeStruct(sc4, jnp.float32),
        ]
        aliases = {4: 0, 5: 1, 6: 2, 7: 3}

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    outs = pl.pallas_call(
        functools.partial(
            _append_kernel, page=page, quantized=quantized, int4=int4
        ),
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(phys, off, *inputs)
    if quantized:
        return (outs[0], outs[1],
                outs[2].reshape(sc_shape), outs[3].reshape(sc_shape))
    return outs[0], outs[1], None, None


def paged_attention(
    q: jnp.ndarray,
    cache: PagedKVCache,
    slots: jnp.ndarray,
    *,
    new_kv=None,
    radius: Optional[int] = None,
    positions: Optional[jnp.ndarray] = None,
    lengths_override: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    pages_bound: Optional[int] = None,
    return_lse: bool = False,
    shared_page_table: bool = False,
    interpret: Optional[bool] = None,
):
    """Decode attention over the paged cache, optionally fused with the
    new token's cache append.

    Args:
      q: ``(B, q_heads, head_dim)`` — one new token per sequence.
      cache: the paged KV cache.
      slots: ``(B,)`` sequence-slot ids.
      new_kv: optional ``(k, v)`` each ``(B, kv_heads, head_dim)`` — the new
        token's K/V. When given, the kernel quantizes and writes them into
        each slot's tail page in the same pass that reads it for attention
        (the separate append kernel costs ~0.4 ms/layer of pure overhead),
        and the call returns ``(out, new_cache)``. Without it the K/V must
        already be appended and the call returns just ``out``.
      radius: sliding-window band radius — the query attends only keys at
        positions ≥ pos − radius (plus itself). The page scan starts at the
        band, so ``pages_bound`` can be sized to the WINDOW instead of the
        sequence. None = full history.
      positions: optional ``(B,)`` int32 per-lane QUERY positions. By
        default the query sits at the sequence tail (position
        ``lengths − 1``); chunked prefill rides C chunk tokens on the lane
        axis against the same slot, where lane i's true position is
        ``offset + i`` — without this the banded window start would be
        computed from the (shared) prefix length for every lane. Only
        affects the band start; the visible key range stays
        ``[start, lengths)``.
      pages_bound: static cap on pages scanned (defaults to the cache's
        max_pages_per_seq; pass a tighter bound when max length is known).
      shared_page_table: all lanes address the SAME slot (chunked prefill
        rides C chunk tokens of one sequence on the lane axis). Prefetches
        ONE page-table row instead of a per-lane gather — a 2048-lane
        chunk otherwise prefetches (2048, max_pages) int32 into SMEM,
        which blows the 1 MB SMEM budget (r3 queue, exp6 A). Incompatible
        with the fused append.
    """
    cfg = cache.config
    b, qh, d = q.shape
    if d != cfg.head_dim:
        raise ValueError(f"head_dim mismatch: {d} vs {cfg.head_dim}")
    # kv-head count from the array (local shard under tensor parallelism)
    kvh = cache.k_pages.shape[0]
    if qh % kvh:
        raise ValueError(f"q_heads {qh} not a multiple of kv_heads {kvh}")
    g = qh // kvh
    page = cfg.page_size
    stor = cache.k_pages.shape[3]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    num_steps = pages_bound or cfg.max_pages_per_seq
    if radius is not None:
        # the band spans ≤ radius+1 tokens → at most this many pages
        num_steps = min(num_steps, cdiv(radius + 1, page) + 1)
    quantized = cfg.quantized
    int4 = cfg.dtype == "int4"
    append = new_kv is not None

    pos = cache.lengths[slots].astype(jnp.int32)  # (B,)
    # with fused append the new token (at position pos) is part of the view
    if lengths_override is not None:
        # per-lane visible key counts — speculative verification rides K
        # tokens of ONE slot on K lanes, lane j attending [0, base+j+1)
        # (its own already-written K/V included). Incompatible with the
        # fused append, whose write position derives from cache.lengths.
        if append:
            raise ValueError("lengths_override requires pre-appended K/V")
        lengths = lengths_override.astype(jnp.int32)
    else:
        lengths = pos + 1 if append else pos
    # banded decode: first visible key position (current token = lengths-1
    # unless per-lane query positions are given — chunked sliding prefill)
    if radius is not None:
        qpos = (lengths - 1) if positions is None else positions.astype(jnp.int32)
        start = jnp.maximum(qpos - radius, 0)
    else:
        start = jnp.zeros_like(lengths)
    if shared_page_table:
        if append:
            raise ValueError("shared_page_table requires pre-appended K/V")
        # one row serves every lane (index maps read pt[0])
        page_tables = cache.page_tables[slots[:1]].astype(jnp.int32)
    else:
        page_tables = cache.page_tables[slots].astype(jnp.int32)  # (B, maxp)

    # base-2 softmax: log2(e) rides the q prescale (see ops/flash.py); the
    # quantized cache's K scales multiply s elementwise afterwards, which
    # commutes with the constant factor.
    qg = (q.astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    qg = qg.reshape(b, kvh, g, d)

    n_prefetch = 5 if append else 3

    def phys_page(bi, i, lens, pt, st, *_):
        np_b = jnp.maximum(pl.cdiv(lens[bi], page), 1)
        logical = st[bi] // page + i
        row = 0 if shared_page_table else bi
        return pt[row, jnp.clip(logical, 0, np_b - 1)]

    def q_map(bi, i, *_):
        return (bi, 0, 0, 0)

    def kv_map(bi, i, lens, pt, st, *_):
        return (0, phys_page(bi, i, lens, pt, st), 0, 0)

    page_spec = pl.BlockSpec((kvh, 1, page, stor), kv_map)
    sc_spec = pl.BlockSpec((kvh, 1, 1, page), kv_map)
    new_spec = pl.BlockSpec((1, kvh, d), lambda bi, i, *_: (bi, 0, 0))

    in_specs = [pl.BlockSpec((1, kvh, g, d), q_map), page_spec, page_spec]
    inputs = [qg, cache.k_pages, cache.v_pages]
    scalars = [lengths, page_tables, start]
    if append:
        scalars += [pos // page, pos % page]
    # Small scale arrays stay whole in VMEM (constant index map → one fetch
    # for the whole grid) instead of adding two tiny DMAs per page step —
    # decode is step-overhead-bound, not bytes-bound. Large pools fall back
    # to streaming per-page scale blocks.
    resident_scales = (
        quantized and cache.k_scales.nbytes <= _RESIDENT_SCALES_BYTES
    )
    if quantized:
        # Scales ride as (kvh, pages, 1, page) so the block's trailing dims
        # (1, page) satisfy the TPU (8,128)-or-full-dim tiling rule.
        if resident_scales:
            full_sc = pl.BlockSpec(
                (cache.k_scales.shape[0], cache.k_scales.shape[1], 1, page),
                lambda bi, i, *_: (0, 0, 0, 0),
            )
            in_specs += [full_sc, full_sc]
        else:
            in_specs += [sc_spec, sc_spec]
        kvh_, tp_, pg_ = cache.k_scales.shape
        sc4 = (kvh_, tp_, 1, pg_)
        inputs += [
            cache.k_scales.reshape(sc4),
            cache.v_scales.reshape(sc4),
        ]
    out_specs = [pl.BlockSpec((1, kvh, g, d), q_map)]
    out_shapes = [jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype)]
    aliases = {}
    if append:
        kn, vn = new_kv
        if kn.shape != (b, kvh, d) or vn.shape != (b, kvh, d):
            raise ValueError(
                f"new_kv must be {(b, kvh, d)}, got {kn.shape}/{vn.shape}"
            )
        in_specs += [new_spec, new_spec]
        inputs += [kn, vn]

        def target_map(bi, i, lens, pt, st, tpage, off):
            # clamp defensively: an out-of-range tpage (corrupted lengths)
            # must never alias another lane's page-table row
            tp = jnp.minimum(tpage[bi], pt.shape[1] - 1)
            return (0, pt[bi, tp], 0, 0)

        t_page_spec = pl.BlockSpec((kvh, 1, page, stor), target_map)
        t_sc_spec = pl.BlockSpec((kvh, 1, 1, page), target_map)
        out_specs += [t_page_spec, t_page_spec]
        out_shapes += [
            jax.ShapeDtypeStruct(cache.k_pages.shape, cache.k_pages.dtype),
            jax.ShapeDtypeStruct(cache.v_pages.shape, cache.v_pages.dtype),
        ]
        # alias indices count scalar-prefetch args first
        aliases = {n_prefetch + 1: 1, n_prefetch + 2: 2}
        if quantized:
            out_specs += [t_sc_spec, t_sc_spec]
            out_shapes += [
                jax.ShapeDtypeStruct(sc4, jnp.float32),
                jax.ShapeDtypeStruct(sc4, jnp.float32),
            ]
            aliases[n_prefetch + 3] = 3
            aliases[n_prefetch + 4] = 4

    if return_lse:
        # lse rides as the LAST output so the page-alias indices above stay
        # valid; natural-log units (the cross-shard merge contract).
        out_specs += [pl.BlockSpec((1, kvh, g, _LANES), q_map)]
        out_shapes += [jax.ShapeDtypeStruct((b, kvh, g, _LANES), jnp.float32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(b, num_steps),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((kvh, g, _LANES), jnp.float32),
            pltpu.VMEM((kvh, g, _LANES), jnp.float32),
            pltpu.VMEM((kvh, g, d), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _paged_kernel,
        page=page,
        num_steps=num_steps,
        quantized=quantized,
        int4=int4,
        head_dim=d,
        append=append,
        want_lse=return_lse,
        resident_scales=resident_scales,
        shared_table=shared_page_table,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*scalars, *inputs)
    o = outs[0].reshape(b, qh, d)
    lse = outs[-1][..., 0].reshape(b, qh) if return_lse else None
    if not append:
        return (o, lse) if return_lse else o
    import dataclasses as _dc

    kw = dict(
        k_pages=outs[1],
        v_pages=outs[2],
        lengths=cache.lengths.at[slots].add(1),
    )
    if quantized:
        kw["k_scales"] = outs[3].reshape(cache.k_scales.shape)
        kw["v_scales"] = outs[4].reshape(cache.v_scales.shape)
    new_cache = _dc.replace(cache, **kw)
    if return_lse:
        return o, lse, new_cache
    return o, new_cache


# ---------------------------------------------------------------------------
# Pipelined decode (v2): manual double-buffered page DMA + rank-1 append
# ---------------------------------------------------------------------------


def _pipe_kernel(
    # scalar prefetch: lens, page table, start [, tpage, off]
    *all_refs,
    page: int,
    chunk_pages: int,
    quantized: bool,
    int4: bool,
    append: bool,
    want_lse: bool,
):
    """Decode attention with the page stream hand-pipelined.

    The BlockSpec pipeline (v1, `_paged_kernel`) pays one grid step per
    page — at decode shapes each step is ~1 µs of compute against a fixed
    ~2 µs step cost, and `pages_bound` rounds the grid up past the live
    length. Here the grid is just (batch,): pages stream from the
    ANY-space pools through double-buffered `make_async_copy` chunks of
    ``chunk_pages`` pages inside a dynamic-trip `fori_loop` (exactly
    ⌈len/page⌉ iterations — no bubble steps, no bucketing), with chunk
    c+1's DMAs issued before chunk c's compute.

    The fused append is re-cast as a **rank-1 online-softmax update**: the
    new token's score/value contribution is computed directly from the
    in-register quantized row (identical numerics to reading it back from
    the cache), and the cache write degenerates to one row DMA per pool —
    no read-modify-write of the tail page, no merged-page aliasing.
    """
    it = iter(all_refs)
    lens_ref = next(it)
    pt_ref = next(it)
    start_ref = next(it)
    tpage_ref = next(it) if append else None
    off_ref = next(it) if append else None
    q_ref = next(it)
    kpool = next(it)            # ANY (kvh, P, page, stor)
    vpool = next(it)
    ks_ref = next(it) if quantized else None   # VMEM-resident (kvh, P, 1, page)
    vs_ref = next(it) if quantized else None
    kn_ref = next(it) if append else None
    vn_ref = next(it) if append else None
    o_ref = next(it)
    kp_out = next(it) if append else None      # (1, kvh, page, stor) VMEM
    vp_out = next(it) if append else None      # merged tail page out
    lse_ref = next(it) if want_lse else None
    kbuf = next(it)             # VMEM (2, kvh, chunk_pages*page, stor)
    vbuf = next(it)
    sems = next(it)             # DMA sems (2, 2, chunk_pages)
    row_sems = next(it) if append else None    # DMA sems (4,)
    ktail = next(it) if append else None       # VMEM (kvh, page, stor)
    vtail = next(it) if append else None
    acc_scr = next(it)
    m_scr = next(it)
    l_scr = next(it)

    b = pl.program_id(0)
    length = lens_ref[b]
    start_tok = start_ref[b]
    start_pg = start_tok // page
    np_b = jnp.maximum(pl.cdiv(length, page), 1)
    num_pages = np_b - start_pg
    nchunks = pl.cdiv(num_pages, chunk_pages)
    cp = chunk_pages

    def issue(c, slot):
        """Start the DMAs for chunk c into buffer `slot`."""
        for j in range(cp):
            logical = start_pg + c * cp + j
            phys = pt_ref[b, jnp.clip(logical, 0, np_b - 1)]
            pltpu.make_async_copy(
                kpool.at[:, phys],
                kbuf.at[slot, :, pl.ds(j * page, page)],
                sems.at[slot, 0, j],
            ).start()
            pltpu.make_async_copy(
                vpool.at[:, phys],
                vbuf.at[slot, :, pl.ds(j * page, page)],
                sems.at[slot, 1, j],
            ).start()

    def wait(c, slot):
        for j in range(cp):
            logical = start_pg + c * cp + j
            phys = pt_ref[b, jnp.clip(logical, 0, np_b - 1)]
            pltpu.make_async_copy(
                kpool.at[:, phys],
                kbuf.at[slot, :, pl.ds(j * page, page)],
                sems.at[slot, 0, j],
            ).wait()
            pltpu.make_async_copy(
                vpool.at[:, phys],
                vbuf.at[slot, :, pl.ds(j * page, page)],
                sems.at[slot, 1, j],
            ).wait()

    m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)
    issue(0, 0)

    q = q_ref[0]  # (kvh, G, d) pre-scaled bf16

    def body(c, _):
        slot = lax.rem(c, 2)

        @pl.when(c + 1 < nchunks)
        def _prefetch():
            issue(c + 1, lax.rem(c + 1, 2))

        wait(c, slot)
        k = kbuf[slot]
        v = vbuf[slot]
        if int4:
            def _unpack(x):
                x32 = x.astype(jnp.int32)
                lo = (x32 << 28) >> 28
                hi = x32 >> 4
                return jnp.concatenate([lo, hi], axis=-1)

            k = _unpack(k)
            v = _unpack(v)
        kf = _deq_vals(k, q.dtype)
        vf = _deq_vals(v, q.dtype)
        s = lax.dot_general(
            q, kf, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (kvh, G, cp*page)
        if quantized:
            # gather this chunk's scale rows from the resident arrays
            parts_k = []
            parts_v = []
            for j in range(cp):
                logical = start_pg + c * cp + j
                phys = pt_ref[b, jnp.clip(logical, 0, np_b - 1)]
                parts_k.append(ks_ref[:, pl.ds(phys, 1), 0])  # (kvh,1,page)
                parts_v.append(vs_ref[:, pl.ds(phys, 1), 0])
            ks_c = jnp.concatenate(parts_k, axis=-1)  # (kvh, 1, cp*page)
            vs_c = jnp.concatenate(parts_v, axis=-1)
            s = s * ks_c
        k_pos = (start_pg + c * cp) * page + lax.broadcasted_iota(
            jnp.int32, (1, 1, cp * page), 2)
        s = jnp.where((k_pos >= start_tok) & (k_pos < length), s,
                      DEFAULT_MASK_VALUE)
        m_prev = m_scr[:, :, :1]
        l_prev = l_scr[:, :, :1]
        m_next = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp2(m_prev - m_next)
        p = jnp.exp2(s - m_next)
        l_scr[:, :, :1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        m_scr[:, :, :1] = m_next
        if quantized:
            p = p * vs_c
        pv = lax.dot_general(
            p.astype(vf.dtype), vf, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc_scr[...] = acc_scr[...] * alpha + pv
        return 0

    lax.fori_loop(0, nchunks, body, 0)

    if append:
        # ---- rank-1 update: the new token never round-trips the cache.
        kn, ksc = _encode_row(
            kn_ref[0].astype(jnp.float32),
            quantized=quantized, int4=int4, out_dtype=kbuf.dtype,
        )
        vn, vsc = _encode_row(
            vn_ref[0].astype(jnp.float32),
            quantized=quantized, int4=int4, out_dtype=vbuf.dtype,
        )
        if int4:
            x32 = kn.astype(jnp.int32)
            kn_deq = jnp.concatenate(
                [(x32 << 28) >> 28, x32 >> 4], axis=-1).astype(q.dtype)
            v32 = vn.astype(jnp.int32)
            vn_deq = jnp.concatenate(
                [(v32 << 28) >> 28, v32 >> 4], axis=-1).astype(q.dtype)
        else:
            kn_deq = _deq_vals(kn, q.dtype)
            vn_deq = _deq_vals(vn, q.dtype)
        # score of the single new key: (kvh, G, d) · (kvh, d) → (kvh, G, 1)
        s_new = lax.dot_general(
            q, kn_deq[:, None, :], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        if quantized:
            s_new = s_new * ksc[:, None, :]
        m_prev = m_scr[:, :, :1]
        l_prev = l_scr[:, :, :1]
        m_next = jnp.maximum(m_prev, s_new)
        alpha = jnp.exp2(m_prev - m_next)
        p_new = jnp.exp2(s_new - m_next)  # (kvh, G, 1)
        if quantized:
            pv_new = (p_new * vsc[:, None, :]) * vn_deq.astype(
                jnp.float32)[:, None, :]
        else:
            pv_new = p_new * vn_deq.astype(jnp.float32)[:, None, :]
        acc_scr[...] = acc_scr[...] * alpha + pv_new
        l_scr[:, :, :1] = alpha * l_prev + p_new
        m_scr[:, :, :1] = m_next

        # ---- cache write: the merged tail page leaves the kernel as a
        # REGULAR per-slot output (kp_out/vp_out, (1, kvh, page, stor)
        # blocks); the host scatters it into the (donated) pool with one
        # XLA dynamic-update per slot. No pool aliasing: an earlier
        # variant that DMA-wrote the aliased ANY-space pool deadlocked
        # the chip after completing. Scale updates are host-side too (the
        # 64-lane scale pages cannot be DMA-sliced under (·,128) tiling).
        tphys = pt_ref[b, jnp.minimum(tpage_ref[b], pt_ref.shape[1] - 1)]
        off = off_ref[b]
        pltpu.make_async_copy(
            kpool.at[:, tphys], ktail, row_sems.at[0]).start()
        pltpu.make_async_copy(
            vpool.at[:, tphys], vtail, row_sems.at[1]).start()
        pltpu.make_async_copy(
            kpool.at[:, tphys], ktail, row_sems.at[0]).wait()
        pltpu.make_async_copy(
            vpool.at[:, tphys], vtail, row_sems.at[1]).wait()
        row_hit = lax.broadcasted_iota(
            jnp.int32, (1, page, 1), 1) == off
        # merge in 32-bit: sub-32-bit selects through broadcasts trip
        # Mosaic relayout (same workaround as _append_kernel)
        wd = (jnp.int32 if jnp.issubdtype(ktail.dtype, jnp.integer)
              else jnp.float32)
        kp_out[0] = jnp.where(
            row_hit, _deq_vals(kn, wd)[:, None, :], _deq_vals(ktail[...], wd)
        ).astype(kp_out.dtype)
        vp_out[0] = jnp.where(
            row_hit, _deq_vals(vn, wd)[:, None, :], _deq_vals(vtail[...], wd)
        ).astype(vp_out.dtype)

    l = l_scr[:, :, :1]
    m = m_scr[:, :, :1]
    valid = (l > 0.0) & (m > DEFAULT_MASK_VALUE * 0.5)
    l_inv = jnp.where(valid, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
    o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
    if want_lse:
        lse = jnp.where(
            valid, m * LN2 + jnp.log(jnp.where(l > 0.0, l, 1.0)), -jnp.inf
        )
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def paged_attention_pipelined(
    q: jnp.ndarray,
    cache: PagedKVCache,
    slots: jnp.ndarray,
    *,
    new_kv=None,
    radius: Optional[int] = None,
    positions: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    chunk_pages: int = 4,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    rank1_append: bool = False,
):
    """Hand-pipelined decode attention — see :func:`_pipe_kernel`.

    Same contract as :func:`paged_attention` (incl. fused append via
    ``new_kv`` and banded decode via ``radius``) minus ``pages_bound``:
    the in-kernel loop runs exactly ⌈len/page⌉ iterations. Requires
    VMEM-resident scales for quantized caches.

    Append is **split** by default: the standalone :func:`fused_append`
    kernel quantizes + writes the new token's row, then the (hardware-
    validated) no-append pipelined kernel attends over the updated cache
    — identical cache bytes and attention numerics to v1, none of the
    rank-1 variant's tail-page DMA hazards. ``rank1_append=True`` selects
    the in-kernel rank-1 online-softmax append instead (interpret-mode
    only until the v5e hang is root-caused — see the gate below).
    """
    cfg = cache.config
    b, qh, d = q.shape
    kvh = cache.k_pages.shape[0]
    if qh % kvh:
        raise ValueError(f"q_heads {qh} not a multiple of kv_heads {kvh}")
    g = qh // kvh
    page = cfg.page_size
    stor = cache.k_pages.shape[3]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    quantized = cfg.quantized
    int4 = cfg.dtype == "int4"
    append = new_kv is not None
    if append and not rank1_append:
        import dataclasses as _dc

        kn, vn = new_kv
        kp_, vp_, ks_, vs_ = fused_append(
            cache, slots, kn, vn, interpret=interpret
        )
        kw = dict(
            k_pages=kp_, v_pages=vp_,
            lengths=cache.lengths.at[slots].add(1),
        )
        if ks_ is not None:
            kw["k_scales"], kw["v_scales"] = ks_, vs_
        cache = _dc.replace(cache, **kw)
        out = paged_attention_pipelined(
            q, cache, slots, radius=radius, positions=positions,
            scale=scale, chunk_pages=chunk_pages, return_lse=return_lse,
            interpret=interpret,
        )
        if return_lse:
            return out[0], out[1], cache
        return out, cache
    if append and not (interpret or _interpret_default()):
        # The append variant hangs the v5e after (or while) executing —
        # reproduced both with aliased ANY-pool DMA writes AND with the
        # aliasing-free tail-page-output design, so the suspect is the
        # tail-page fetch DMA issued after the dynamic-trip fori_loop
        # (the no-append kernel, which ends at the loop, runs clean and
        # 2.1× faster than v1). Each repro wedges the chip for ~15 min,
        # so hardware validation is parked; interpret mode and the
        # engine's CPU tests cover the full semantics. On hardware use
        # `paged_attention` (v1) for fused-append decode.
        raise NotImplementedError(
            "pipelined decode append is not yet safe on TPU hardware; "
            "use paged_attention (see ops/paged.py _pipe_kernel notes)"
        )
    if quantized and cache.k_scales.nbytes > _RESIDENT_SCALES_BYTES:
        raise ValueError(
            "pipelined decode needs VMEM-resident scales "
            f"({cache.k_scales.nbytes} B > {_RESIDENT_SCALES_BYTES})"
        )

    pos = cache.lengths[slots].astype(jnp.int32)
    # the loop covers only CACHED tokens; the new token is a rank-1 update
    lengths = pos
    full_len = pos + 1 if append else pos
    if radius is not None:
        qpos = ((full_len - 1) if positions is None
                else positions.astype(jnp.int32))
        start = jnp.maximum(qpos - radius, 0)
    else:
        start = jnp.zeros_like(lengths)
    page_tables = cache.page_tables[slots].astype(jnp.int32)

    qg = (q.astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    qg = qg.reshape(b, kvh, g, d)

    scalars = [lengths, page_tables, start]
    if append:
        scalars += [pos // page, pos % page]
    n_prefetch = len(scalars)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((1, kvh, g, d), lambda bi, *_: (bi, 0, 0, 0)),
        any_spec,
        any_spec,
    ]
    inputs = [qg, cache.k_pages, cache.v_pages]
    if quantized:
        kvh_, tp_, pg_ = cache.k_scales.shape
        sc4 = (kvh_, tp_, 1, pg_)
        full_sc = pl.BlockSpec(
            (kvh_, tp_, 1, pg_), lambda bi, *_: (0, 0, 0, 0))
        in_specs += [full_sc, full_sc]
        inputs += [cache.k_scales.reshape(sc4), cache.v_scales.reshape(sc4)]
    if append:
        kn, vn = new_kv
        new_spec = pl.BlockSpec((1, kvh, d), lambda bi, *_: (bi, 0, 0))
        in_specs += [new_spec, new_spec]
        inputs += [kn, vn]

    out_specs = [pl.BlockSpec((1, kvh, g, d), lambda bi, *_: (bi, 0, 0, 0))]
    out_shapes = [jax.ShapeDtypeStruct((b, kvh, g, d), q.dtype)]
    aliases = {}
    if append:
        # merged tail pages as regular per-slot outputs (scattered into
        # the donated pools host-side — no pool aliasing in the kernel)
        tail_spec = pl.BlockSpec(
            (1, kvh, page, stor), lambda bi, *_: (bi, 0, 0, 0))
        out_specs += [tail_spec, tail_spec]
        out_shapes += [
            jax.ShapeDtypeStruct((b, kvh, page, stor), cache.k_pages.dtype),
            jax.ShapeDtypeStruct((b, kvh, page, stor), cache.v_pages.dtype),
        ]
    if return_lse:
        out_specs += [pl.BlockSpec(
            (1, kvh, g, _LANES), lambda bi, *_: (bi, 0, 0, 0))]
        out_shapes += [jax.ShapeDtypeStruct((b, kvh, g, _LANES), jnp.float32)]

    scratch = [
        pltpu.VMEM((2, kvh, chunk_pages * page, stor), cache.k_pages.dtype),
        pltpu.VMEM((2, kvh, chunk_pages * page, stor), cache.v_pages.dtype),
        pltpu.SemaphoreType.DMA((2, 2, chunk_pages)),
    ]
    if append:
        scratch += [
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((kvh, page, stor), cache.k_pages.dtype),
            pltpu.VMEM((kvh, page, stor), cache.v_pages.dtype),
        ]
    scratch += [
        pltpu.VMEM((kvh, g, d), jnp.float32),
        pltpu.VMEM((kvh, g, _LANES), jnp.float32),
        pltpu.VMEM((kvh, g, _LANES), jnp.float32),
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_prefetch,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    kernel = functools.partial(
        _pipe_kernel,
        page=page,
        chunk_pages=chunk_pages,
        quantized=quantized,
        int4=int4,
        append=append,
        want_lse=return_lse,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(*scalars, *inputs)
    o = outs[0].reshape(b, qh, d)
    lse = outs[-1][..., 0].reshape(b, qh) if return_lse else None
    if not append:
        return (o, lse) if return_lse else o
    import dataclasses as _dc

    tphys = jnp.take_along_axis(
        page_tables,
        jnp.minimum(pos // page, page_tables.shape[1] - 1)[:, None],
        axis=1,
    )[:, 0]
    kw = dict(
        # scatter the merged tail pages into the (donated) pools: one
        # dynamic update per slot, in place under the engine's donation
        k_pages=cache.k_pages.at[:, tphys].set(outs[1].transpose(1, 0, 2, 3)),
        v_pages=cache.v_pages.at[:, tphys].set(outs[2].transpose(1, 0, 2, 3)),
        lengths=cache.lengths.at[slots].add(1),
    )
    if quantized:
        # host-side scale scatter (b*kvh elements -- the 64-lane scale
        # pages can't be DMA-sliced in-kernel); formula matches
        # _encode_row exactly so reads reproduce the kernel's dequant.
        qmax = (448.0 if jnp.dtype(cache.k_pages.dtype) in _F8
                else 7.0 if int4 else 127.0)
        offs = pos % page

        def _sc(x):
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
            return jnp.maximum(amax, 1e-12) / qmax  # (b, kvh)

        kw["k_scales"] = cache.k_scales.at[:, tphys, offs].set(_sc(kn).T)
        kw["v_scales"] = cache.v_scales.at[:, tphys, offs].set(_sc(vn).T)
    new_cache = _dc.replace(cache, **kw)
    if return_lse:
        return o, lse, new_cache
    return o, new_cache
