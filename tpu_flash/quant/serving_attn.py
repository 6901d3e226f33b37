"""Serving-mode quantized attention: K/V pre-quantized (cache residents),
Q quantized IN-KERNEL — zero quantize preamble.

The round-1 fp8 headline lost ~20% of its wall time to an XLA quantize
preamble (amax/cast/dequant passes over Q/K/V — ~1.9 ms at the 8k bench
shape, logs/r2_exp1.jsonl E-rows). In the workload the north star actually
describes, K/V live in the cache *already quantized* (they are written once
at prefill/decode-append), and only Q is fresh each call. This kernel makes
that the benchmark- and engine-path: the caller passes ``QArray`` K/V; the
kernel quantizes each Q block on first touch (s == 0) into VMEM scratch —
one rowwise amax + round over (block_q, d) elements, amortized over every
kv step — so the HBM traffic is exactly q(bf16) + k̂ + v̂ + o.

Numerics match quant/flash_q.py's activation-quant contract: per-token Q
scales, per-token ("token") or per-(batch,head) ("tensor") K scales,
per-channel V scales; fp8 values ride the bf16 MXU via the `_fp8_upcast`
bit-trick (v5e has no fp8 MXU), int8 runs the native int8→int32 MXU path.
In "tensor" mode the K scale folds into the Q scratch at init, so the score
loop carries ZERO per-element dequant work — identical inner loop to the
bf16 kernel.

Reference parity note: this plays the role of the reference's (never-run)
quantization ambitions — there is no analog in FlashAttention.jl; the
structure extends src/cuda/flash.jl's shared-memory staging (Qi loaded once
per row-block, src/cuda/flash.jl:22-29) with an on-load quantize.
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

from tpu_flash.ops.flash import (
    DEFAULT_MASK_VALUE,
    LN2,
    LOG2E,
    _LANES,
    _NT_DIMS,
    _interpret_default,
    _pad_seq,
    build_schedule,
)
from tpu_flash.ops.schedule import Schedule
from tpu_flash.ops.vmem import estimate_fwd_vmem
from tpu_flash.quant.flash_q import _fp8_upcast, _pad_scales, scaled_k_norms
from tpu_flash.quant.qarray import QMAX, QArray

_F8 = (jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2))
_EPS = 1e-12


def _sv_kernel(
    *refs,
    sched: Schedule,
    num_steps: int,
    q_mode: str,      # "fp8" | "int8" | "raw"
    kv_dtype,
    k_scaled: bool,   # per-token K scales (else per-tensor, folded at init)
    need_lse: bool,
    scale: float,
    pv_quant: bool = False,
    bound_max: bool = False,
    kv_split: int = 1,
    isolate: str = "",
    bh_block: int = 1,
    kv_resident: bool = False,
):
    # ``isolate`` is a DIAGNOSTIC knob (scripts/r3_exp2.py): it deletes one
    # VPU pass to measure its serial cost against the MXU chain — outputs
    # are WRONG under it. "noexp": the per-element exp2 becomes a subtract;
    # "nosum": the l (denominator) reduction is skipped; "dots": bare dot
    # chain (no softmax state at all). Floor analysis for the fp8 headline
    # (VERDICT r2 item 2) — see docs/DESIGN.md §15.
    #
    # ``bh_block`` > 1 packs several batch·head rows into one grid step and
    # software-pipelines them exactly as ops/flash.py:_fwd_kernel: row
    # bb+1's QKᵀ (MXU) is issued before row bb's exp2/PV chain (VPU), so
    # the two units overlap across INDEPENDENT rows instead of serializing
    # on the dot → exp2 → dot dependency within one row — the exposure that
    # kv_split measurably failed to hide (DESIGN §20). MHA only (the packed
    # rows must map 1:1 onto kv rows); mutually exclusive with kv_split.
    it = iter(refs)
    # (bhb,1,1) GLOBAL scaled-k̂-norm max per kv row: with a CONSTANT
    # per-q-block bound m = ‖q‖·max_ALL_j‖k̂_j‖, alpha ≡ 1 and the
    # per-step max/rescale chain vanishes — the r4_exp8 dense-bf16 win
    # (166.9 → 174.0) applied to the serving kernel (DESIGN §22).
    gk_ref = next(it) if bound_max else None
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    sk_ref = next(it)           # (bhb,1,bkv) token scales OR (bhb,1,1) scalar
    sv_ref = next(it)           # (bhb,1,dv) per-channel V scales
    o_ref = next(it)
    lse_ref = next(it)
    m_scr = next(it)
    l_scr = next(it)
    acc_scr = next(it)
    q_scr = next(it)            # (bhb,bq,d): bf16 deq q (fp8/raw) or int8 q̂
    qs_scr = next(it) if q_mode == "int8" else None
    # kv_resident staging (DESIGN §21): the e4m3→bf16 upcast of every K/V
    # tile re-ran once per Q BLOCK — the measured fp8 floor term (§20,
    # ~1.07 ms @ bq1024 8k). With a dense schedule the kv tile at step s
    # is the same for every q block i, so q-sweep 0 stages the upcast
    # result into persistent VMEM scratch and i > 0 reuses it — (I−1)/I
    # of the upcast deleted at SMALL q blocks, which keeps bh packing
    # feasible too (big-bq amortization and packing were VMEM-exclusive,
    # logs/r4_exp3.jsonl).
    # int8 QKᵀ rides the native int8 MXU — only V needs the bf16 staging
    kres_scr = (next(it) if kv_resident and q_mode != "int8"
                else None)  # (bhb,S,bkv,d) bf16
    vres_scr = next(it) if kv_resident else None  # (bhb,S,bkv,dv) bf16

    i = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv
    fp8_kv = jnp.dtype(kv_dtype) in _F8

    def _k_op(bb, lo, w):
        """bf16 score operand for K rows [lo, lo+w) of row bb."""
        if kv_resident:
            return kres_scr[bb, s, lo:lo + w]
        k = k_ref[bb, lo:lo + w]
        if fp8_kv:
            return _fp8_upcast(k)
        if k.dtype == jnp.int8:
            return k.astype(jnp.bfloat16)  # weight-only int8: in-register
        return k

    def _v_op(bb, lo, w):
        if kv_resident:
            return vres_scr[bb, s, lo:lo + w]
        v = v_ref[bb, lo:lo + w]
        return _fp8_upcast(v) if fp8_kv else v.astype(jnp.bfloat16)

    if kv_resident:
        @pl.when(i == 0)
        def _stage_kv():
            for bb in range(bh_block):
                if q_mode != "int8":
                    k = k_ref[bb]
                    kres_scr[bb, s] = (
                        _fp8_upcast(k) if fp8_kv else
                        k.astype(jnp.bfloat16))
                v = v_ref[bb]
                vres_scr[bb, s] = (
                    _fp8_upcast(v) if fp8_kv else v.astype(jnp.bfloat16))

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        for bb in range(bh_block):
            q = q_ref[bb].astype(jnp.float32)
            # per-(batch,head) K scale folds into the Q staging when not
            # per-token — the score loop then has no dequant work at all.
            sk_fold = 1.0 if k_scaled else sk_ref[bb, 0, 0]
            if q_mode == "fp8":
                amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
                sq = jnp.maximum(amax, _EPS) / QMAX[
                    jnp.dtype(jnp.float8_e4m3fn)]
                q8 = (q / sq).astype(jnp.float8_e4m3fn)
                qd = _fp8_upcast(q8).astype(jnp.float32) * (
                    sq * (scale * LOG2E) * sk_fold
                )
                q_scr[bb] = qd.astype(jnp.bfloat16)
            elif q_mode == "int8":
                amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
                sq = jnp.maximum(amax, _EPS) / 127.0
                q_scr[bb] = jnp.clip(
                    jnp.round(q / sq), -127, 127
                ).astype(jnp.int8)
                qs_scr[bb] = jnp.broadcast_to(
                    sq * (scale * LOG2E) * sk_fold, qs_scr.shape[1:]
                )
            else:
                q_scr[bb] = (
                    q * (scale * LOG2E * sk_fold)).astype(jnp.bfloat16)
            if bound_max:
                # Cauchy-Schwarz row bound on the kernel's score operand:
                # any upper bound keeps online softmax exact (an exponent
                # shift); CONSTANT per q block (global ‖k̂‖ max), so the
                # whole per-step max + alpha-rescale chain vanishes —
                # m_scr is set ONCE here and never updated (DESIGN
                # §10/§11; constant-bound upgrade §22).
                qop = q_scr[bb].astype(jnp.float32)
                qb = jnp.sqrt(jnp.sum(qop * qop, axis=-1, keepdims=True))
                if q_mode == "int8":
                    qb = qb * qs_scr[bb, :, :1]
                m_scr[bb] = jnp.broadcast_to(
                    qb * (gk_ref[bb, 0, 0] * 1.0001), m_scr.shape[1:])

    def _apply_mask(sij, off, w):
        kv_idx = sched.kv_block_index(i, s)
        q_pos = i * bq + lax.broadcasted_iota(jnp.int32, (bq, w), 0)
        k_pos = (kv_idx * bkv + off
                 + lax.broadcasted_iota(jnp.int32, (bq, w), 1))
        mask = sched.mask(q_pos, k_pos)
        if mask is not None:
            sij = jnp.where(mask, sij, DEFAULT_MASK_VALUE)
        return sij

    csz = bkv // kv_split  # sub-tile width along kv

    def _qk(j, bb=0):
        """Score sub-tile j of row bb: (bq, csz) — pure value, no writes."""
        if q_mode == "int8":
            k = k_ref[bb, j * csz:(j + 1) * csz]
            raw = lax.dot_general(
                q_scr[bb], k, _NT_DIMS, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            sij = raw * qs_scr[bb, :, :1]
        else:
            # NOTE (r4, logs/r4_exp8.jsonl): folding the per-token K scale
            # into the (csz, d) operand instead of the (bq, csz) score
            # tile is arithmetically bq/d× less VPU work but MEASURED
            # SLOWER (fp8-token d=128: 166.5 → 160.2 TFLOP/s) — the
            # multiply+cast between `_fp8_upcast` and the MXU breaks
            # Mosaic's fused upcast scheduling. The score-tile multiply
            # below stays; tensor-mode scales (folded into Q at init)
            # remain the fast path.
            kf = _k_op(bb, j * csz, csz)
            sij = lax.dot_general(
                q_scr[bb], kf, _NT_DIMS, preferred_element_type=jnp.float32
            )
        if k_scaled:
            sij = sij * sk_ref[bb, 0, j * csz:(j + 1) * csz].reshape(1, csz)
        return sij

    def _pv(p, j, bb=0):
        """P·V for sub-tile j against V rows [j·csz, (j+1)·csz)."""
        if pv_quant:
            v = v_ref[bb, j * csz:(j + 1) * csz]
            # P ∈ [0, 1] after the base-2 exp (every element ≤ the running
            # max's exp2(0) = 1), so a STATIC ×127 scale quantizes it with
            # no amax pass; the PV dot then rides the 2× int8 MXU path
            # against the int8 V̂ pages, and the 1/127 folds into one
            # (bq, dv) multiply. Adds ~1/254-per-element P rounding noise —
            # see docs/DESIGN.md §int8 for the measured error behavior.
            p8 = jnp.clip(jnp.round(p * 127.0), 0, 127).astype(jnp.int8)
            return lax.dot_general(
                p8, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * jnp.float32(1.0 / 127.0)
        vf = _v_op(bb, j * csz, csz)
        return lax.dot_general(
            p.astype(jnp.bfloat16), vf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def _merge(sijs, bb, masked):
        """Online-softmax merge + PV for row ``bb`` given its staged score
        sub-tiles (pure values — every MXU dot feeding this was issued
        before any of its VPU work is consumed)."""
        if masked:
            sijs = [_apply_mask(sij, j * csz, csz) for j, sij in
                    enumerate(sijs)]
        if isolate == "dots":
            acc = acc_scr[bb]
            for j, sij in enumerate(sijs):
                acc = acc + _pv(sij * (1.0 / 4096.0), j, bb)
            acc_scr[bb] = acc
            l_scr[bb] = jnp.ones_like(l_scr[bb])
            return
        m_prev = m_scr[bb, :, :1]
        l_prev = l_scr[bb, :, :1]
        if bound_max:
            # constant bound set at init: no per-step max, alpha ≡ 1,
            # no l/acc rescale
            m_next = m_prev
            alpha = None
        else:
            m_curr = jnp.max(sijs[0], axis=-1, keepdims=True)
            for sij in sijs[1:]:
                m_curr = jnp.maximum(
                    m_curr, jnp.max(sij, axis=-1, keepdims=True))
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev - m_next)
        if isolate == "noexp":
            ps = [(sij - m_next) * (1.0 / 4096.0) for sij in sijs]
        else:
            ps = [jnp.exp2(sij - m_next) for sij in sijs]
        l_next = l_prev if bound_max else alpha * l_prev
        if isolate == "nosum":
            l_next = l_next + 1.0
        else:
            for p in ps:
                l_next = l_next + jnp.sum(p, axis=-1, keepdims=True)
        if not bound_max:
            m_scr[bb] = jnp.broadcast_to(m_next, m_scr.shape[1:])
        l_scr[bb] = jnp.broadcast_to(l_next, l_scr.shape[1:])
        acc = acc_scr[bb] if bound_max else acc_scr[bb] * alpha
        for j, p in enumerate(ps):
            acc = acc + _pv(p, j, bb)
        acc_scr[bb] = acc

    def _update(masked):
        # Two alternative stagings of MXU work ahead of VPU work:
        #  - kv_split > 1 (bh_block == 1): the step's kv tile is split into
        #    sub-tiles; all QK dots are staged before any exp2 runs.
        #  - bh_block > 1 (kv_split == 1): row bb+1's QKᵀ is issued before
        #    row bb's softmax/PV chain — independent ROWS overlap, the
        #    pattern that works for the bf16 kernel (_fwd_kernel).
        if bh_block == 1:
            _merge([_qk(j) for j in range(kv_split)], 0, masked)
            return
        s_next = _qk(0, 0)
        for bb in range(bh_block):
            sij = s_next
            if bb + 1 < bh_block:
                s_next = _qk(0, bb + 1)
            _merge([sij], bb, masked)

    @pl.when(sched.step_needed(i, s))
    def _step():
        unm = sched.block_unmasked(i, s) if sched.has_mask else None
        if not sched.has_mask or unm is True:
            _update(False)
        elif unm is None:
            _update(True)
        else:
            pl.when(unm)(lambda: _update(False))
            pl.when(jnp.logical_not(unm))(lambda: _update(True))

    @pl.when(s == num_steps - 1)
    def _finish():
        for bb in range(bh_block):
            l = l_scr[bb, :, :1]
            m = m_scr[bb, :, :1]
            valid = (l > 0.0) & (m > DEFAULT_MASK_VALUE * 0.5)
            l_inv = jnp.where(valid, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
            acc = acc_scr[bb] * l_inv * sv_ref[bb, 0].reshape(1, -1)
            o_ref[bb] = acc.astype(o_ref.dtype)
            if need_lse:
                lse = jnp.where(
                    valid, m * LN2 + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                    -jnp.inf,
                )
                lse_ref[bb] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _sv_kernel_t(
    *refs,
    sched: Schedule,
    num_steps: int,
    q_mode: str,      # "fp8"/"raw" (bf16 operand) | "int8"
    kv_dtype,
    k_scaled: bool,
    need_lse: bool,
    bound_max: bool,
):
    """Transposed-layout serving kernel for small head dims (d ≤ 64).

    The standard serving kernel's PV dot writes dv ≤ 64 output lanes —
    half the MXU (ops/flash.py `_fwd_kernel_t` measured the bf16 cost:
    74.9 → ~102 TFLOP/s at d=64). Same remedy here against the QUANTIZED
    cache: scores stay K-major ``s_t (bkv, bq) = K̂ ·NT· Q̂`` and PV is
    ``V̂ᵀ_ext (dv+1, bkv) @ p`` with a ones row carrying the softmax
    denominator (scale 1.0 in the per-channel dequant row vector).

    Q-side quantization moves OUTSIDE the kernel as lane vectors (the
    `_fwd_kernel_t` pattern for its norms): per-token Q scales / norm
    bounds are (1, bq) row vectors here, and producing them in-kernel
    would need a (bq,1)→(1,bq) relayout per q block; the XLA preamble
    touches only Q (the small, fresh operand — K/V stay residents), ~2%
    of attention time at d=64.
    """
    it = iter(refs)
    qn_ref = next(it) if bound_max else None   # (1,8,bq) effective-q norms
    gk_ref = next(it) if bound_max else None   # (1,1,1) global k̂-norm max
    qs_ref = next(it) if q_mode == "int8" else None  # (1,8,bq) q scales
    q_ref = next(it)            # (1,bq,d) int8 q̂ or bf16 scale-folded q
    k_ref = next(it)            # (1,bkv,d) cache-resident k̂
    vte_ref = next(it)          # (1,dv+1,bkv) v̂ᵀ with ones row
    sk_ref = next(it) if k_scaled else None    # (1,bkv,1) per-token K scales
    sv_ref = next(it)           # (1,dv+1,1) per-channel V scales (+1.0 row)
    ot_ref = next(it)
    lse_ref = next(it)
    m_scr = next(it)            # (8,bq)
    acc_scr = next(it)          # (dv+1,bq)

    i = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv
    fp8_kv = jnp.dtype(kv_dtype) in _F8

    @pl.when(s == 0)
    def _init():
        if bound_max:
            # CONSTANT per-q-block bound (global ‖k̂‖ max): m set once,
            # alpha ≡ 1, zero per-step max/rescale work (§22 upgrade)
            m_scr[...] = jnp.broadcast_to(
                qn_ref[0][:1] * (gk_ref[0, 0, 0] * 1.0001), m_scr.shape)
        else:
            m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _apply_mask(st):
        kv_idx = sched.kv_block_index(i, s)
        q_pos = i * bq + lax.broadcasted_iota(jnp.int32, (bkv, bq), 1)
        k_pos = kv_idx * bkv + lax.broadcasted_iota(jnp.int32, (bkv, bq), 0)
        mask = sched.mask(q_pos, k_pos)
        if mask is not None:
            st = jnp.where(mask, st, DEFAULT_MASK_VALUE)
        return st

    def _update(st):
        m_prev = m_scr[:1]
        p = jnp.exp2(st - m_prev if bound_max
                     else st - jnp.maximum(
                         m_prev, jnp.max(st, axis=0, keepdims=True))
                     ).astype(jnp.bfloat16)
        vf = (_fp8_upcast(vte_ref[0]) if fp8_kv
              else vte_ref[0].astype(jnp.bfloat16))
        pv = lax.dot_general(
            vf, p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (dv+1, bq); row dv accumulates l
        if bound_max:
            acc_scr[...] = acc_scr[...] + pv
        else:
            m_next = jnp.maximum(m_prev, jnp.max(st, axis=0, keepdims=True))
            alpha = jnp.exp2(m_prev - m_next)
            acc_scr[...] = acc_scr[...] * alpha + pv
            m_scr[:1] = m_next

    def _scores():
        k = k_ref[0]
        if q_mode == "int8":
            raw = lax.dot_general(
                k, q_ref[0], _NT_DIMS, preferred_element_type=jnp.int32
            ).astype(jnp.float32)  # (bkv, bq)
            st = raw * qs_ref[0][:1]
        else:
            # operand-side K-scale folding measured SLOWER here too
            # (logs/r4_exp8.jsonl d=64 rows; see _sv_kernel._qk note)
            kf = _fp8_upcast(k) if fp8_kv else (
                k.astype(jnp.bfloat16) if k.dtype == jnp.int8 else k)
            st = lax.dot_general(
                kf, q_ref[0], _NT_DIMS, preferred_element_type=jnp.float32
            )
        if k_scaled:
            st = st * sk_ref[0]  # (bkv, 1) row scales
        return st

    @pl.when(sched.step_needed(i, s))
    def _step():
        unm = sched.block_unmasked(i, s) if sched.has_mask else None
        if not sched.has_mask or unm is True:
            _update(_scores())
        elif unm is None:
            _update(_apply_mask(_scores()))
        else:
            pl.when(unm)(lambda: _update(_scores()))
            pl.when(jnp.logical_not(unm))(
                lambda: _update(_apply_mask(_scores())))

    @pl.when(s == num_steps - 1)
    def _finish():
        dv = acc_scr.shape[0] - 1
        l = acc_scr[dv:, :]
        m = m_scr[:1]
        valid = (l > 0.0) & (m > DEFAULT_MASK_VALUE * 0.5)
        l_inv = jnp.where(valid, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        ot_ref[0] = (acc_scr[:dv] * l_inv * sv_ref[0, :dv]).astype(
            ot_ref.dtype)
        if need_lse:
            lse = jnp.where(
                valid, m * LN2 + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                -jnp.inf,
            )
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def serving_flash_attention(
    q: jnp.ndarray,
    kq: QArray,
    vq: QArray,
    *,
    q_dtype=None,               # None (bf16 Q) | int8 | float8_e4m3fn
    schedule: str = "dense",
    scale: Optional[float] = None,
    radius: int = 0,
    section: int = 0,
    shift: int = 0,
    wrap_n: int = 0,
    shifted_causal: bool = False,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    pv_quant: bool = False,
    bound_max: Optional[bool] = None,
    kv_split: int = 1,
    bh_block: Optional[int] = None,
    transposed: Optional[bool] = None,
    isolate: str = "",
    kv_resident: Optional[bool] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
):
    """Attention over a quantized KV set with fresh bf16 Q.

    ``transposed`` selects the K-major small-head-dim layout
    (:func:`_sv_kernel_t`); default auto-enables it for d ≤ 64 (full MXU
    output lanes on PV, ones-row l, norm-bound max — the bf16 d=64 remedy
    of ops/flash.py `_fwd_kernel_t` applied to the quantized cache).
    Incompatible with ``pv_quant`` and ``kv_split``.

    ``bound_max`` replaces the per-step score-tile max with the
    Cauchy-Schwarz row bound (exact online softmax under any upper bound;
    docs/DESIGN.md §10). Defaults to True except under ``pv_quant`` (whose
    static ×127 P scale needs the true max). Measured v5e gains @8k d=128:
    int8 148→167, fp8-token 128→155, fp8-tensor 150→155 TFLOP/s.

    ``kv_split`` splits each kv block into that many sub-tiles whose QKᵀ
    dots are all staged before any softmax work, letting Mosaic overlap
    sub-tile j+1's MXU dot with sub-tile j's VPU exp2 pass (the kernel is
    otherwise VPU-bound; docs/DESIGN.md §11). Numerically it reassociates
    the per-step PV sum only — the online-softmax state is updated once
    per step either way.

    ``pv_quant=True`` additionally quantizes the probability matrix to
    int8 with a static ×127 scale so the PV product runs on the int8 MXU
    (int8 caches only) — trades ~1/254-per-element P rounding noise for
    half the PV matmul time.

    ``q``: (batch, heads, n, d) bf16/f32. ``kq``: K as QArray — per-token
    scales (axis=-1, shape (b, hkv, n, 1)) or per-tensor (axis=(-2,-1),
    shape (b, hkv, 1, 1)). ``vq``: V per-channel (axis=-2). Q is quantized
    inside the kernel to ``q_dtype`` (int8 → native int8 MXU; fp8 →
    fp8-grid rounding on the bf16 MXU; None → unquantized Q against a
    quantized cache, the weight-only mode). GQA: kv heads divide q heads.
    """
    if q.ndim != 4:
        raise ValueError(f"expected (batch, heads, n, d), got {q.shape}")
    b, h, n_q, d = q.shape
    hkv, n_kv = kq.values.shape[1], kq.values.shape[2]
    dv = vq.values.shape[-1]
    if h % hkv:
        raise ValueError(f"q heads {h} not a multiple of kv heads {hkv}")
    # Measured defaults (v5e):
    # * int8 Q·int8 cache at d>64 under MHA: SQUARE 1024² tiles with deep
    #   bh packing — the constant-bound × bhb8 corner the r4 sweep never
    #   measured (its bound upgrade postdated the packing grid) runs
    #   195.3 TFLOP/s @8k (99.1% of the bf16 peak) and 209.8 @32k vs
    #   187.6/200.5 at the old bq4096/bkv2048 (logs/r5_exp1.jsonl E,
    #   r5_exp3.jsonl eager rows). Packed rows hide the int8 path's short
    #   VPU chain under 8 independent rows' dots, and small tiles shrink
    #   the per-instance state the r5_exp1 D-ladder measured at ~10 µs.
    # * fp8/weight-only at d=128 keep large Q blocks: they amortize the
    #   per-q-block K/V upcast (DESIGN §20-21) and their E-row frontier
    #   is flat (171-174) with argmax at bq4096/bkv2048.
    # * d≤64 transposed layout: 1024/2048 (logs/r3_exp1.jsonl).
    int8_mha_fast = (
        q_dtype is not None and jnp.dtype(q_dtype) == jnp.int8
        and d > 64 and h == hkv and (b * h) % 8 == 0
        and not pv_quant and kv_split == 1 and not isolate
        and kv_resident is not True and bound_max is not False)
    if block_q is None and block_kv is None and bh_block is None \
            and int8_mha_fast:
        block_q, block_kv, bh_block = 1024, 1024, 8
    if block_q is None:
        block_q = 4096 if d > 64 else 1024
    if block_kv is None:
        block_kv = 2048
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()
    kv_dtype = jnp.dtype(kq.values.dtype)
    k_scaled = kq.axis == -1 or kq.axis == kq.values.ndim - 1
    if q_dtype is not None:
        q_dtype = jnp.dtype(q_dtype)
        if (q_dtype == jnp.int8) != (kv_dtype == jnp.int8):
            raise ValueError(
                "q_dtype and the cache dtype must share the MXU input family"
            )
        q_mode = "int8" if q_dtype == jnp.int8 else "fp8"
    else:
        q_mode = "raw"  # weight-only: bf16 Q, k̂ dequantized in-register
    if pv_quant and kv_dtype != jnp.int8:
        raise ValueError("pv_quant requires an int8 cache (int8 V̂ pages)")
    if bound_max and pv_quant:
        # pv_quant's static ×127 P scale needs the TRUE running max (P's
        # top value ≈ 1); under the norm bound P is shifted down by the
        # bound's slack and the int8 grid loses exactly those bits.
        raise ValueError("bound_max and pv_quant are mutually exclusive")
    if bound_max is None:
        # measured on v5e @8k d=128: int8 148→167, fp8-tensor 150→155,
        # fp8-token 128→155 TFLOP/s; errors unchanged (logs/r2_exp3.jsonl)
        bound_max = not pv_quant

    sched = build_schedule(
        schedule, n_q, n_kv, block_q, block_kv, radius=radius,
        section=section, shift=shift, wrap_n=wrap_n,
        shifted_causal=shifted_causal,
    )
    bq, bkv = sched.block_q, sched.block_kv
    bh, bh_kv = b * h, b * hkv
    g = h // hkv
    if bh_block is None:
        bh_block = 1
    if bh_block > 1:
        if g != 1:
            raise ValueError("bh_block > 1 requires MHA (hkv == h)")
        if kv_split != 1:
            raise ValueError("bh_block and kv_split are exclusive stagings")
        if isolate:
            raise ValueError("isolate is a bh_block == 1 diagnostic")
        if bh % bh_block:
            raise ValueError(f"batch*heads {bh} not divisible by {bh_block}")

    qf = _pad_seq(q.reshape(bh, n_q, d), sched.n_q_pad)
    k_vals = _pad_seq(kq.values.reshape(bh_kv, n_kv, d), sched.n_kv_pad)
    v_vals = _pad_seq(vq.values.reshape(bh_kv, n_kv, dv), sched.n_kv_pad)
    if k_scaled:
        sk = _pad_scales(
            kq.scales.reshape(bh_kv, n_kv, 1), sched.n_kv_pad
        ).reshape(bh_kv, 1, sched.n_kv_pad)
    else:
        sk = kq.scales.reshape(bh_kv, 1, 1)
    sv = vq.scales.reshape(bh_kv, 1, dv)

    def kv_row(bb):
        if g == 1:
            return bb
        return (bb // h) * hkv + (bb % h) // g

    kv_map = lambda bb, i, s, _s=sched: (kv_row(bb), _s.kv_block_index(i, s), 0)

    if transposed is None:
        transposed = (d <= 64 and dv <= 64 and not pv_quant
                      and kv_split == 1 and bh_block == 1 and not isolate
                      and not kv_resident)
    if transposed and bh_block > 1:
        raise ValueError("bh_block is a standard-layout knob")
    if transposed and kv_resident:
        # the transposed kernel has no staging scratch; silently ignoring
        # the knob would make an A/B sweep measure the same kernel twice
        raise ValueError("kv_resident is a standard-layout knob")
    if transposed:
        if pv_quant:
            raise ValueError("pv_quant requires the standard layout")
        if kv_split != 1:
            raise ValueError("kv_split is a standard-layout knob")
        # ---- Q-side staging in XLA (see _sv_kernel_t docstring) ----
        q32 = qf.astype(jnp.float32)
        if k_scaled:
            sk_fold = jnp.float32(1.0)
        else:
            # per-(batch,head) K scale folds into the Q staging
            skb = kq.scales.reshape(b, hkv, 1)
            sk_fold = jnp.broadcast_to(skb[:, :, None], (b, hkv, g, 1)
                                       ).reshape(bh, 1, 1)
        if q_mode == "int8":
            amax = jnp.max(jnp.abs(q32), axis=-1, keepdims=True)
            sq = jnp.maximum(amax, _EPS) / 127.0
            q_op = jnp.clip(jnp.round(q32 / sq), -127, 127).astype(jnp.int8)
            qs_row = (sq * (scale * LOG2E) * sk_fold)[..., 0]  # (bh, nq_pad)
            qn_row = jnp.sqrt(jnp.sum(
                q_op.astype(jnp.float32) ** 2, axis=-1)) * qs_row
        else:
            if q_mode == "fp8":
                amax = jnp.max(jnp.abs(q32), axis=-1, keepdims=True)
                sq = jnp.maximum(amax, _EPS) / QMAX[
                    jnp.dtype(jnp.float8_e4m3fn)]
                q8 = (q32 / sq).astype(jnp.float8_e4m3fn)
                qd = _fp8_upcast(q8).astype(jnp.float32) * (
                    sq * (scale * LOG2E) * sk_fold)
            else:
                qd = q32 * (scale * LOG2E) * sk_fold
            q_op = qd.astype(jnp.bfloat16)
            qs_row = None
            qn_row = jnp.sqrt(jnp.sum(
                q_op.astype(jnp.float32) ** 2, axis=-1))
        # V̂ᵀ with a ones row: the softmax denominator rides the PV dot;
        # its dequant row scale is 1.0.
        vte = jnp.concatenate(
            [v_vals.transpose(0, 2, 1),
             jnp.ones((bh_kv, 1, sched.n_kv_pad), v_vals.dtype)], axis=1)
        sv_ext = jnp.concatenate(
            [vq.scales.reshape(bh_kv, dv).astype(jnp.float32),
             jnp.ones((bh_kv, 1), jnp.float32)], axis=1)[..., None]

        lane_q_spec = pl.BlockSpec((1, 8, bq), lambda bb, i, s: (bb, 0, i))
        t_ops, t_specs = [], []
        if bound_max:
            # global ‖k̂‖ max per kv row — constant per-q-block bound
            kn = scaled_k_norms(k_vals, sk[:, 0, :] if k_scaled else None)
            t_ops += [
                jnp.broadcast_to(qn_row[:, None, :], (bh, 8, sched.n_q_pad)),
                jnp.max(kn, axis=-1).reshape(bh_kv, 1, 1),
            ]
            t_specs += [lane_q_spec, pl.BlockSpec(
                (1, 1, 1), lambda bb, i, s: (kv_row(bb), 0, 0))]
        if q_mode == "int8":
            t_ops.append(jnp.broadcast_to(
                qs_row[:, None, :], (bh, 8, sched.n_q_pad)))
            t_specs.append(lane_q_spec)
        t_ops += [q_op, k_vals, vte]
        t_specs += [
            pl.BlockSpec((1, bq, d), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, bkv, d), kv_map),
            pl.BlockSpec(
                (1, dv + 1, bkv),
                lambda bb, i, s, _s=sched: (kv_row(bb), 0,
                                            _s.kv_block_index(i, s))),
        ]
        if k_scaled:
            t_ops.append(sk.reshape(bh_kv, sched.n_kv_pad, 1))
            t_specs.append(pl.BlockSpec(
                (1, bkv, 1),
                lambda bb, i, s, _s=sched: (kv_row(bb),
                                            _s.kv_block_index(i, s), 0)))
        t_ops.append(sv_ext)
        t_specs.append(pl.BlockSpec(
            (1, dv + 1, 1), lambda bb, i, s: (kv_row(bb), 0, 0)))
        if return_lse:
            lse_spec = pl.BlockSpec((1, 8, bq), lambda bb, i, s: (bb, 0, i))
            lse_shape = jax.ShapeDtypeStruct(
                (bh, 8, sched.n_q_pad), jnp.float32)
        else:
            lse_spec = pl.BlockSpec((1, 8, bq), lambda bb, i, s: (bb, 0, 0))
            lse_shape = jax.ShapeDtypeStruct((bh, 8, bq), jnp.float32)
        kernel = functools.partial(
            _sv_kernel_t, sched=sched, num_steps=sched.max_kv_steps,
            q_mode=q_mode, kv_dtype=kv_dtype, k_scaled=k_scaled,
            need_lse=return_lse, bound_max=bound_max)
        out_dtype = q.dtype if q.dtype != jnp.float32 else jnp.float32
        ot, lse = pl.pallas_call(
            kernel,
            grid=(bh, sched.num_q_blocks, sched.max_kv_steps),
            in_specs=t_specs,
            out_specs=[
                pl.BlockSpec((1, dv, bq), lambda bb, i, s: (bb, 0, i)),
                lse_spec,
            ],
            out_shape=[
                jax.ShapeDtypeStruct((bh, dv, sched.n_q_pad), out_dtype),
                lse_shape,
            ],
            scratch_shapes=[
                pltpu.VMEM((8, bq), jnp.float32),
                pltpu.VMEM((dv + 1, bq), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*t_ops)
        o = ot.transpose(0, 2, 1)[:, :n_q].reshape(b, h, n_q, dv)
        if return_lse:
            return o, lse[:, 0, :n_q].reshape(b, h, n_q)
        return o

    bhb = bh_block
    operands = []
    in_specs = []
    if bound_max:
        # GLOBAL max of the per-token scaled-k̂ norms per kv row: the
        # constant per-q-block bound (m set once at init — alpha ≡ 1,
        # zero per-step max/rescale work; §22's dense-bf16 win applied
        # here). block-unit index: bhb == 1 goes through the GQA row
        # map; bhb > 1 implies MHA where block b covers rows
        # [b·bhb, (b+1)·bhb).
        kn = scaled_k_norms(k_vals, sk[:, 0, :] if k_scaled else None)
        operands.append(jnp.max(kn, axis=-1).reshape(bh_kv, 1, 1))
        in_specs.append(pl.BlockSpec(
            (bhb, 1, 1),
            lambda bb, i, s: ((kv_row(bb) if bhb == 1 else bb), 0, 0),
        ))

    in_specs += [
        pl.BlockSpec((bhb, bq, d), lambda bb, i, s: (bb, i, 0)),
        pl.BlockSpec((bhb, bkv, d), kv_map),
        pl.BlockSpec((bhb, bkv, dv), kv_map),
        (pl.BlockSpec(
            (bhb, 1, bkv),
            lambda bb, i, s, _s=sched: (kv_row(bb), 0, _s.kv_block_index(i, s)),
        ) if k_scaled else
         pl.BlockSpec((bhb, 1, 1), lambda bb, i, s: (kv_row(bb), 0, 0))),
        pl.BlockSpec((bhb, 1, dv), lambda bb, i, s: (kv_row(bb), 0, 0)),
    ]
    if return_lse:
        lse_spec = pl.BlockSpec((bhb, bq, _LANES), lambda bb, i, s: (bb, i, 0))
        lse_shape = jax.ShapeDtypeStruct(
            (bh, sched.n_q_pad, _LANES), jnp.float32)
    else:
        lse_spec = pl.BlockSpec((bhb, 1, _LANES), lambda bb, i, s: (bb, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((bh, 1, _LANES), jnp.float32)

    scratch = [
        pltpu.VMEM((bhb, bq, _LANES), jnp.float32),
        pltpu.VMEM((bhb, bq, _LANES), jnp.float32),
        pltpu.VMEM((bhb, bq, dv), jnp.float32),
        pltpu.VMEM(
            (bhb, bq, d), jnp.int8 if q_mode == "int8" else jnp.bfloat16),
    ]
    if q_mode == "int8":
        scratch.append(pltpu.VMEM((bhb, bq, _LANES), jnp.float32))
    if kv_resident:
        if q_mode != "int8":
            scratch.append(pltpu.VMEM(
                (bhb, sched.max_kv_steps, bkv, d), jnp.bfloat16))
        scratch.append(pltpu.VMEM(
            (bhb, sched.max_kv_steps, bkv, dv), jnp.bfloat16))

    if kv_split < 1 or bkv % kv_split or (bkv // kv_split) % 128:
        raise ValueError(
            f"kv_split={kv_split} must divide block_kv={bkv} into "
            "128-aligned sub-tiles")
    if kv_resident is None:
        kv_resident = False  # default decided by the r4 sweep (DESIGN §21)
    if kv_resident and schedule != "dense":
        # a band/causal q block sees different kv tiles per i — the
        # staged tile of q-sweep 0 would be the wrong one
        raise ValueError("kv_resident requires the dense schedule")
    if kv_resident and pv_quant:
        raise ValueError("pv_quant's int8 PV path has no bf16 V staging")
    kernel = functools.partial(
        _sv_kernel, sched=sched, num_steps=sched.max_kv_steps,
        q_mode=q_mode, kv_dtype=kv_dtype, k_scaled=k_scaled,
        need_lse=return_lse, scale=scale, pv_quant=pv_quant,
        bound_max=bound_max, kv_split=kv_split, isolate=isolate,
        bh_block=bhb, kv_resident=kv_resident,
    )
    out_dtype = q.dtype if q.dtype != jnp.float32 else jnp.float32
    # Large tiles (upcast-amortizing block_q ≥ 2048, DESIGN §20) or packed
    # bh rows push past the 16 MB default scoped budget. Size the grant to
    # the config's modeled demand — and refuse configs beyond the VMEM
    # envelope up front with a structured error instead of letting the
    # remote compiler 500 (VERDICT r3 item 2; model: ops/vmem.py).
    est = estimate_fwd_vmem(
        block_q=bq, block_kv=bkv, d=d, dv=dv, bh_block=bhb, q_mode=q_mode,
        kv_bytes=jnp.dtype(kv_dtype).itemsize, bound_max=bound_max,
        k_scaled=k_scaled, pv_quant=pv_quant, masked=sched.has_mask,
        need_lse=return_lse,
        kv_resident_steps=sched.max_kv_steps if kv_resident else 0,
    ).check()
    vmem_bytes = est.grant_bytes
    o, lse = pl.pallas_call(
        kernel,
        grid=(bh // bhb, sched.num_q_blocks, sched.max_kv_steps),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((bhb, bq, dv), lambda bb, i, s: (bb, i, 0)),
            lse_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sched.n_q_pad, dv), out_dtype),
            lse_shape,
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            # kv_resident relies on q-sweep i == 0 running before i > 0
            # (grid order) — mark the i dim arbitrary so Mosaic cannot
            # legally reorder it.
            dimension_semantics=(
                ("parallel", "arbitrary", "arbitrary") if kv_resident
                else ("parallel", "parallel", "arbitrary")),
            vmem_limit_bytes=vmem_bytes,
        ),
        interpret=interpret,
    )(*operands, qf, k_vals, v_vals, sk, sv)
    o = o[:, :n_q].reshape(b, h, n_q, dv)
    if return_lse:
        return o, lse[:, :n_q, 0].reshape(b, h, n_q)
    return o


def quantize_kv_cache(k, v, kv_dtype, *, kv_scale: str = "token"):
    """Quantize K/V once for :func:`serving_flash_attention` (the write-
    side of the cache). ``kv_scale``: "token" (per-key) or "tensor"
    (per batch·head — the delayed-scaling granularity)."""
    kv_dtype = jnp.dtype(kv_dtype)
    from tpu_flash.quant.qarray import quantize

    kq = quantize(k, kv_dtype, axis=-1 if kv_scale == "token" else (-2, -1))
    vq = quantize(v, kv_dtype, axis=-2)
    return kq, vq
