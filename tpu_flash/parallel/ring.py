"""Ring attention: sequence-sharded exact attention over a mesh axis.

The reference's flash kernels return the ``(l, m)`` running statistics
precisely because the online-softmax merge is associative
(src/dense.jl:82-89). Ring attention is that same algebra lifted across
devices: K/V shards rotate around the mesh's ``seq`` axis with
``jax.lax.ppermute`` while each device folds every arriving shard into its
local ``(o, lse)`` accumulator — O(N/P) memory per device, exact result.

TPU-native structure:
* per-hop attention is the SAME differentiable Pallas kernel family
  (ops/flash.py), so the ring forward AND backward both run fused kernels;
  autodiff of the hop loop reverses the ppermutes automatically;
* per-hop masks are static: the relative offset between the local Q shard
  and hop ``t``'s K/V shard is ``t·Nl`` (or ``(t−P)·Nl`` across the wrap),
  so causal / sliding-window / circulant hops lower to the static
  ``ShiftedMaskSchedule`` — no data-dependent masking;
* **hop skipping**: banded patterns statically skip hops whose shard lies
  wholly outside the band (reference windowed/circulant sparsity exploited
  at the ring level — ⌈radius/Nl⌉+1 hops instead of P). Wrap-aware for
  circulant. The device-dependent wrap case of non-circulant patterns is
  resolved with one ``lax.cond`` per hop (still differentiable).

Use inside ``jax.shard_map`` with q/k/v sharded over the ``seq`` axis —
see :func:`ring_dense_fa` for a ready-made wrapper.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from tpu_flash.ops import flash

_NEG_INF = float("-inf")


def merge_partials(o1, lse1, o2, lse2):
    """Merge two attention partials — the cross-device form of the
    reference's (l, m) column-tile merge (src/dense.jl:82-89).

    o: (..., n, d); lse: (..., n). Fully-masked partials carry lse = -inf
    and weight 0.
    """
    lse = jnp.logaddexp(lse1, lse2)
    w1 = jnp.where(jnp.isinf(lse1) & (lse1 < 0), 0.0, jnp.exp(lse1 - lse))
    w2 = jnp.where(jnp.isinf(lse2) & (lse2 < 0), 0.0, jnp.exp(lse2 - lse))
    o = o1 * w1[..., None] + o2 * w2[..., None]
    return o, lse


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    *,
    pattern: str = "causal",  # dense | causal | local | circulant
    radius: int = 0,
    scale: Optional[float] = None,
    seq_len: Optional[int] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
    q_dtype=None,
    kv_dtype=None,
):
    """Exact attention with K/V rotating around ``axis_name``.

    Call inside shard_map; q, k, v are the LOCAL shards ``(B, H, Nl, D)``
    of a global sequence of length ``P·Nl`` sharded over the axis.
    ``radius`` is the band radius for local/circulant. Returns the local
    output shard (input dtype).

    ``kv_dtype`` (int8 / fp8) turns on the quantized ring: each shard's
    K/V are quantized ONCE before the hop loop (per-token K, per-channel V
    — shard-local scales travel with their values), the ring rotates
    int8/fp8 bytes (half the bf16 ICI traffic), and every hop runs the
    quantized kernel with no per-hop quantize pass. ``q_dtype`` optionally
    quantizes Q too (int8 MXU path / fp8 grid). Quantized mode is
    inference-only (no VJP).
    """
    p = lax.axis_size(axis_name)
    didx = lax.axis_index(axis_name)
    b, h, nl, d = q.shape
    dv = v.shape[-1]
    n_total = p * nl if seq_len is None else seq_len
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    if kv_dtype == "int4":
        # INT4 ring (BASELINE.md target #4: 32k ring with INT4 KV): each
        # shard quantizes K per-token / V per-channel to the int4 grid
        # ONCE, nibble-packs pairs into int8 bytes, and the ring rotates
        # the PACKED bytes — one QUARTER the bf16 ICI traffic. Per hop the
        # nibbles unpack to int8 values (two arithmetic shifts; the int4
        # grid is a subset of int8, so the hop runs the native int8-MXU
        # prequant kernel with bit-exact int4 numerics). Q rides the int8
        # path (there is no practical int4 Q: it is fresh each call and
        # never moves over ICI).
        from tpu_flash.quant import qarray
        from tpu_flash.quant.flash_q import (
            QArray,
            prepare_ring_operands,
            quantized_flash_attention_prequant,
        )

        if q_dtype not in (None, "int8"):
            raise ValueError("int4 ring pairs with q_dtype=None or 'int8'")
        k4 = qarray.quantize_int4(k.astype(jnp.float32), axis=-1)
        v4 = qarray.quantize_int4(v.astype(jnp.float32), axis=-2)
        q_in, _, _ = prepare_ring_operands(
            q, k, v, q_dtype=q_dtype, kv_dtype="int8", scale=scale
        )
        kv0 = (k4.values, k4.scales, v4.values, v4.scales)

        def attend(qh, kvh, **skw):
            kqh = QArray(values=qarray.unpack_int4(kvh[0]),
                         scales=kvh[1], axis=-1)
            vqh = QArray(values=qarray.unpack_int4(kvh[2]),
                         scales=kvh[3], axis=-2)
            return quantized_flash_attention_prequant(
                qh, kqh, vqh, block_q=block_q, block_kv=block_kv,
                return_lse=True, interpret=interpret, out_dtype=q.dtype,
                **skw,
            )
    elif kv_dtype is not None:
        from tpu_flash.quant.flash_q import (
            QArray,
            prepare_ring_operands,
            quantized_flash_attention_prequant,
        )

        q_in, kq, vq = prepare_ring_operands(
            q, k, v, q_dtype=q_dtype, kv_dtype=kv_dtype, scale=scale
        )
        kv0 = (kq.values, kq.scales, vq.values, vq.scales)

        def attend(qh, kvh, **skw):
            kqh = QArray(values=kvh[0], scales=kvh[1], axis=-1)
            vqh = QArray(values=kvh[2], scales=kvh[3], axis=-2)
            return quantized_flash_attention_prequant(
                qh, kqh, vqh, block_q=block_q, block_kv=block_kv,
                return_lse=True, interpret=interpret, out_dtype=q.dtype,
                **skw,
            )
    elif q_dtype is not None:
        raise ValueError("q_dtype requires kv_dtype (quantized ring mode)")
    else:
        q_in = q
        kv0 = (k, v)

        def attend(qh, kvh, **skw):
            return flash.flash_attention(
                qh, kvh[0], kvh[1], scale=scale, block_q=block_q,
                block_kv=block_kv, return_lse=True, interpret=interpret,
                **skw,
            )

    def hop_needed_static(t: int) -> bool:
        """Can hop t's shard intersect the band for ANY device?"""
        if pattern in ("dense", "causal"):
            return True
        span = radius + nl - 1
        if pattern == "circulant":
            # hop t covers global deltas t·Nl ± (Nl−1) mod N; needed iff the
            # wrap distance of t·Nl to 0 is within the widened band.
            return min(t * nl, n_total - t * nl) <= span
        # local: forward offset t·Nl or backward (p−t)·Nl
        return t * nl <= span or (t != 0 and (p - t) * nl <= span)

    def hop_attention(qh, kvh, t: int):
        """Partial attention for hop t. Static masks; one cond for wrap."""
        fwd_shift = t * nl          # source = didx − t (no wrap)
        bwd_shift = (t - p) * nl    # source wrapped past 0

        if pattern == "dense":
            o, lse = attend(qh, kvh, schedule="dense")
            return o.astype(jnp.float32), lse

        if pattern == "circulant":
            # offset is static mod n_total — single static branch.
            o, lse = attend(
                qh, kvh, schedule="shifted", shift=fwd_shift % n_total,
                radius=radius, wrap_n=n_total,
            )
            return o.astype(jnp.float32), lse

        if pattern == "causal":
            if t == 0:
                o, lse = attend(qh, kvh, schedule="causal")
                return o.astype(jnp.float32), lse

            def fwd_branch(args):
                qh, kvh = args
                o, lse = attend(qh, kvh, schedule="dense")
                return o.astype(jnp.float32), lse

            def skip_branch(args):
                qh, _ = args
                return _empty_partial_nl(dv)

            return lax.cond(didx >= t, fwd_branch, skip_branch, (qh, kvh))

        if pattern == "local":
            span = radius + nl - 1

            def banded(shift):
                def f(args):
                    qh, kvh = args
                    o, lse = attend(
                        qh, kvh, schedule="shifted", shift=shift,
                        radius=radius,
                    )
                    return o.astype(jnp.float32), lse

                return f

            def skip_branch(args):
                qh, _ = args
                return _empty_partial_nl(dv)

            fwd_possible = t * nl <= span
            bwd_possible = t != 0 and (p - t) * nl <= span
            if t == 0:
                return banded(0)((qh, kvh))
            if fwd_possible and bwd_possible:
                return lax.cond(
                    didx >= t, banded(fwd_shift), banded(bwd_shift), (qh, kvh)
                )
            if fwd_possible:
                return lax.cond(didx >= t, banded(fwd_shift), skip_branch, (qh, kvh))
            if bwd_possible:
                return lax.cond(didx < t, banded(bwd_shift), skip_branch, (qh, kvh))
            return _empty_partial_nl(dv)

        raise ValueError(f"unknown ring pattern {pattern!r}")

    def _empty_partial_nl(dv):
        return (
            jnp.zeros((b, h, nl, dv), jnp.float32),
            jnp.full((b, h, nl), _NEG_INF, jnp.float32),
        )

    perm = [(i, (i + 1) % p) for i in range(p)]
    acc_o, acc_lse = _empty_partial_nl(dv)
    kv = kv0
    for t in range(p):
        # Communication/compute overlap: issue hop t+1's rotation BEFORE
        # hop t's attention. kv_next has no data dependency on the hop's
        # kernel, so XLA's async collectives (collective-permute-start /
        # -done) run the ICI transfer underneath the Pallas compute instead
        # of strictly alternating with it (VERDICT r1 item 5; SURVEY §7
        # "ring overlap" hard part). The permute only *reads* the local
        # shard, so sending while computing on it is safe.
        kv_next = lax.ppermute(kv, axis_name, perm) if t < p - 1 else None
        if hop_needed_static(t):
            o_t, lse_t = hop_attention(q_in, kv, t)
            acc_o, acc_lse = merge_partials(acc_o, acc_lse, o_t, lse_t)
        kv = kv_next
    return acc_o.astype(q.dtype)


def ring_dense_fa(
    mesh,
    *,
    pattern: str = "causal",
    radius: int = 0,
    axis_name: str = "seq",
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
    q_dtype=None,
    kv_dtype=None,
):
    """Build a jitted sequence-sharded attention fn over ``mesh``.

    Returns ``fn(q, k, v)`` taking GLOBAL ``(B, H, N, D)`` arrays sharded
    (or shardable) over ``axis_name``; batch rides the ``data`` axis and
    heads the ``model`` axis when present in the mesh.
    """
    from jax.sharding import PartitionSpec as P

    axes = mesh.axis_names
    spec = P(
        "data" if "data" in axes else None,
        "model" if "model" in axes else None,
        axis_name,
        None,
    )

    def local_fn(q, k, v):
        return ring_attention(
            q, k, v, axis_name, pattern=pattern, radius=radius, scale=scale,
            block_q=block_q, block_kv=block_kv, interpret=interpret,
            q_dtype=q_dtype, kv_dtype=kv_dtype,
        )

    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)
