"""Flash-attention backward kernels (Pallas/TPU) + custom_vjp wiring.

The reference's backward passes never ran (undefined variables in
src/dense.jl:104-167 and src/naive/dense.jl:37-56; README "needs testing"),
and its C++ OpenMP backward has an unsynchronized dK/dV accumulation race
(src_cpp/FlashAttention.cpp:300-312). This module is the design done right:

* recompute-from-LSE (FA-2): P_ij = exp(S_ij − lse_i) — no O(N²) residuals,
  only (q, k, v, o, lse);
* two kernels with disjoint write sets:
  - **dQ kernel**: Q-major grid (same schedule as forward) — each dQ tile
    has one writer;
  - **dK/dV kernel**: KV-major grid using the schedule's *transposed*
    iteration (``q_block_index``) — each dK/dV tile has one writer. No
    atomics, no races, fully parallel over (batch·heads, kv-blocks).
* the LSE cotangent folds into the delta term (∂lse_i/∂s_ij = p_ij), so
  ring-attention partials remain differentiable through their merge.

Masking rides through the recompute: masked logits sit at the large negative
mask value, so ``exp(s − lse)`` underflows to exactly 0 — no second mask
application needed beyond the forward's.
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.ops.flash import DEFAULT_MASK_VALUE, LN2, LOG2E, _auto_vmem_mb
from tpu_flash.ops.schedule import (
    CirculantSchedule,
    LocalSchedule,
    Schedule,
)

_LANES = 128

# Global default for the d=128 kernels' sub-tile staging (see flash_backward
# ``split``). 1 = unsplit; flipped after hardware A/B if staging wins.
# Read at TRACE time only — already-compiled grad fns keep their split; to
# select per-call use flash_attention(..., bwd_split=) which is part of the
# jit cache key.
DEFAULT_SPLIT = 1

_NT = (((1,), (1,)), ((), ()))  # (m,d)x(n,d) -> (m,n)
_NN = (((1,), (0,)), ((), ()))  # (m,k)x(k,n) -> (m,n)
_TN = (((0,), (0,)), ((), ()))  # (k,m)x(k,n) -> (m,n)

# Diagnostic: run only one of the two backward kernels (the other grad
# returns zeros) so each kernel's wall cost can be measured separately —
# the dq-vs-dkv floor decomposition VERDICT r3 item 4 asked for.
_BWD_PARTS = "both"

# Diagnostic: delete one pass inside the backward kernels (outputs
# WRONG) to decompose their floor: "noexp" (exp2 → scaled subtract),
# "nods" (ds multiply skipped; dp used directly), "notn" (the TN dk/dv
# dots replaced by NT dots against the same operands — measures the
# transpose-staging cost of the TN orientation).
_BWD_ISOLATE = ""


@contextlib.contextmanager
def force_bwd_isolate(mode: str):
    """Delete one pass inside the backward kernels (outputs WRONG) —
    measurement only; see module comment for the modes.

    JIT-CACHE HAZARD (shared by :func:`force_bwd_parts`): the mode is a
    module global read at TRACE time and is NOT part of any jit cache key —
    a grad function first traced inside the context keeps the wrong kernel
    after it exits. Measurement scripts must build a fresh callable per
    mode (scripts/r4_exp6.py does) and never reuse it outside."""
    global _BWD_ISOLATE
    prev = _BWD_ISOLATE
    _BWD_ISOLATE = mode
    try:
        yield
    finally:
        _BWD_ISOLATE = prev


# Band backward retile override (experiment knob, same jit-cache hazard
# as the other trace-time globals): None = the measured default below.
_BWD_BAND_TILE = None

# Route band schedules at d ≤ 64 through the STANDARD backward kernels
# (bh packing) instead of the transposed layout — the forward measured
# this dispatch 2.77 → 2.24 ms (bands are step-latency-bound, packing
# beats full PV lanes; logs/r4_exp8.jsonl); the backward mirror is
# frozen from the r5 band-backward sweep.
_BWD_SMALL_D_STANDARD = True


@contextlib.contextmanager
def force_bwd_band_tile(bq: int | None, bkv: int | None):
    """A/B override for the band backward retile (scripts/r5 band sweep)."""
    global _BWD_BAND_TILE
    prev = _BWD_BAND_TILE
    _BWD_BAND_TILE = None if bq is None else (bq, bkv)
    try:
        yield
    finally:
        _BWD_BAND_TILE = prev


@contextlib.contextmanager
def force_bwd_small_d_standard(on: bool):
    global _BWD_SMALL_D_STANDARD
    prev = _BWD_SMALL_D_STANDARD
    _BWD_SMALL_D_STANDARD = on
    try:
        yield
    finally:
        _BWD_SMALL_D_STANDARD = prev


@contextlib.contextmanager
def force_bwd_parts(parts: str):
    """``parts`` ∈ {"both", "dq", "dkv"}. Outputs are WRONG under "dq"/
    "dkv" (the skipped grads are zeros) — measurement only
    (scripts/r4_exp6.py). Same jit-cache hazard as
    :func:`force_bwd_isolate`: trace-time global, not in the cache key."""
    global _BWD_PARTS
    prev = _BWD_PARTS
    _BWD_PARTS = parts
    try:
        yield
    finally:
        _BWD_PARTS = prev


def _dq_kernel(
    *refs,
    sched: Schedule, num_steps: int, split: int = 1, bh_block: int = 1,
    dp_quant: bool = False,
):
    # dp_quant (VERDICT r4 item 3 — past the ~151 TFLOP/s 5-dot structural
    # bound of DESIGN §23): the dp = dO·Vᵀ dot runs on the 2× int8 MXU.
    # ``v_ref``/``do_ref`` then hold int8 values quantized OUTSIDE the
    # kernel (V per channel; dO prescaled by V's channel scales, then
    # per-token), and ALL scales are pre-folded so the kernel adds only
    # the int32→f32 convert: dp = σdo_i·raw, and
    #   ds = p ⊙ (dp − Δ) = σdo_i ⊙ (p ⊙ (raw − Δ/σdo_i)),
    # so ``delta_ref`` arrives pre-divided by σdo and the per-row σdo
    # multiplies the dq EPILOGUE once (``sdo_ref``), not the hot loop.
    if dp_quant:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, sdo_ref,
         dq_ref, dq_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
         dq_acc) = refs
        sdo_ref = None
    i = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv
    csz = bkv // split

    @pl.when(s == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    @pl.when(sched.step_needed(i, s))
    def _step():
        # split > 1 sub-tiles the kv block: lse/delta are precomputed
        # inputs, so each sub-tile's QK → exp2 → dp → ds → dq chain is
        # independent and the MXU dots of sub-tile h+1 can run under the
        # VPU exp2/ds passes of sub-tile h (same staging as the forward's
        # kv_split; the accumulator is updated once per step).
        # bh_block > 1 packs several batch·head rows per grid step (the
        # forward's band remedy — band backward was step-overhead-bound
        # at 33 TFLOP/s covered, VERDICT r2 item 3) and pipelines row
        # bb+1's QKᵀ under row bb's VPU chain.
        def _sij(bb, h):
            k = k_ref[bb, h * csz:(h + 1) * csz]
            sij = lax.dot_general(
                q_ref[bb], k, _NT, preferred_element_type=jnp.float32)
            if sched.has_mask:
                kv_idx = sched.kv_block_index(i, s)
                q_pos = i * bq + lax.broadcasted_iota(
                    jnp.int32, (bq, csz), 0)
                k_pos = (kv_idx * bkv + h * csz
                         + lax.broadcasted_iota(jnp.int32, (bq, csz), 1))
                mask = sched.mask(q_pos, k_pos)
                if mask is not None:
                    sij = jnp.where(mask, sij, DEFAULT_MASK_VALUE)
            return sij

        def _tail(bb, sijs):
            lse = jnp.expand_dims(lse_ref[bb, 0], -1)  # (bq, 1)
            delta = jnp.expand_dims(delta_ref[bb, 0], -1)
            do = do_ref[bb]
            # q carries the forward's scale*log2e factor: sij is in base-2
            # units while lse is natural — rescale lse, exp2, and put the
            # ln2 chain-rule factor on the final dq write.
            if _BWD_ISOLATE == "noexp":
                ps = [(sij - lse) * (1.0 / 4096.0) for sij in sijs]
            else:
                ps = [jnp.exp2(sij - lse * LOG2E) for sij in sijs]
            if dp_quant:
                # int8·int8 → int32 on the 2× MXU; all scales pre-folded
                # (σdo into delta/epilogue, σv into dO before quant)
                dps = [
                    lax.dot_general(
                        do, v_ref[bb, h * csz:(h + 1) * csz],
                        _NT, preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    for h in range(split)
                ]
            else:
                dps = [
                    lax.dot_general(
                        do.astype(v_ref.dtype),
                        v_ref[bb, h * csz:(h + 1) * csz],
                        _NT, preferred_element_type=jnp.float32)
                    for h in range(split)
                ]
            acc = dq_acc[bb]
            for h in range(split):
                if _BWD_ISOLATE == "nods":
                    ds = ps[h]  # skip the (dp − Δ) combine
                else:
                    ds = ps[h] * (dps[h] - delta)
                acc = acc + lax.dot_general(
                    ds.astype(k_ref.dtype), k_ref[bb, h * csz:(h + 1) * csz],
                    _NN, preferred_element_type=jnp.float32)
            dq_acc[bb] = acc

        sijs_next = [_sij(0, h) for h in range(split)]
        for bb in range(bh_block):
            sijs = sijs_next
            if bb + 1 < bh_block:
                sijs_next = [_sij(bb + 1, h) for h in range(split)]
            _tail(bb, sijs)

    @pl.when(s == num_steps - 1)
    def _finish():
        for bb in range(bh_block):
            if dp_quant:
                # dq rows are uniformly scaled by σdo_i (ds = σdo·ds_raw):
                # one epilogue row multiply, zero hot-loop scale work
                sdo = jnp.expand_dims(sdo_ref[bb, 0], -1)  # (bq, 1)
                dq_ref[bb] = (dq_acc[bb] * (sdo * LN2)).astype(dq_ref.dtype)
            else:
                dq_ref[bb] = (dq_acc[bb] * LN2).astype(dq_ref.dtype)


def _dkv_kernel(
    *refs,
    sched: Schedule, num_steps: int, split: int = 1, bh_block: int = 1,
    dp_quant: bool = False,
):
    # dp_quant: v_ref holds int8 V̂ (per channel), do8_ref the int8
    # σv-prescaled per-token dO — the dp dot rides the 2× int8 MXU.
    # delta_ref arrives pre-divided by σdo; the per-row σdo that ds needs
    # is pre-folded into ``qs_ref`` (q ⊙ σdo, built outside), so
    # dk += ds_rawᵀ·(q·σdo) needs no in-kernel scale pass at all. The dv
    # dot keeps the exact bf16 dO (``do_ref``): P is exact, so dv stays
    # exact. See _dq_kernel's dp_quant note / DESIGN §23 follow-up.
    if dp_quant:
        (q_ref, qs_ref, k_ref, v_ref, do_ref, do8_ref, lse_ref, delta_ref,
         dk_ref, dv_ref, dk_acc, dv_acc) = refs
    else:
        (q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
         dk_acc, dv_acc) = refs
        qs_ref = do8_ref = None
    j = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv
    csz = bq // split

    @pl.when(s == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    @pl.when(sched.q_step_needed(j, s))
    def _step():
        q_idx = sched.q_block_index(j, s)

        # split > 1 sub-tiles the Q block (the non-accumulated axis here);
        # bh_block > 1 packs batch·head rows — see _dq_kernel.
        def _sij(bb, h):
            q = q_ref[bb, h * csz:(h + 1) * csz]
            sij = lax.dot_general(
                q, k_ref[bb], _NT, preferred_element_type=jnp.float32)
            if sched.has_mask:
                q_pos = (q_idx * bq + h * csz
                         + lax.broadcasted_iota(jnp.int32, (csz, bkv), 0))
                k_pos = j * bkv + lax.broadcasted_iota(
                    jnp.int32, (csz, bkv), 1)
                mask = sched.mask(q_pos, k_pos)
                if mask is not None:
                    sij = jnp.where(mask, sij, DEFAULT_MASK_VALUE)
            return sij

        def _tail(bb, sijs):
            v = v_ref[bb]
            lses = [
                jnp.expand_dims(lse_ref[bb, 0, h * csz:(h + 1) * csz], -1)
                for h in range(split)
            ]
            deltas = [
                jnp.expand_dims(delta_ref[bb, 0, h * csz:(h + 1) * csz], -1)
                for h in range(split)
            ]
            dos = [do_ref[bb, h * csz:(h + 1) * csz] for h in range(split)]
            if _BWD_ISOLATE == "noexp":
                ps = [(sijs[h] - lses[h]) * (1.0 / 4096.0)
                      for h in range(split)]
            else:
                ps = [jnp.exp2(sijs[h] - lses[h] * LOG2E)
                      for h in range(split)]
            if _BWD_ISOLATE != "nodv":
                dv_new = dv_acc[bb]
                for h in range(split):
                    dv_new = dv_new + lax.dot_general(
                        ps[h].astype(dos[h].dtype), dos[h], _TN,
                        preferred_element_type=jnp.float32)
                dv_acc[bb] = dv_new
            if dp_quant:
                dps = [
                    lax.dot_general(
                        do8_ref[bb, h * csz:(h + 1) * csz], v, _NT,
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32)
                    for h in range(split)
                ]
            else:
                dps = [
                    lax.dot_general(
                        dos[h].astype(v.dtype), v, _NT,
                        preferred_element_type=jnp.float32)
                    for h in range(split)
                ]
            if _BWD_ISOLATE != "nodk":
                dkq_ref = qs_ref if dp_quant else q_ref
                dk_new = dk_acc[bb]
                for h in range(split):
                    if _BWD_ISOLATE == "nods":
                        ds = dps[h]  # skip the p·(dp − Δ) multiply
                    else:
                        ds = ps[h] * (dps[h] - deltas[h])
                    dk_new = dk_new + lax.dot_general(
                        ds.astype(dkq_ref.dtype),
                        dkq_ref[bb, h * csz:(h + 1) * csz],
                        _TN, preferred_element_type=jnp.float32)
                dk_acc[bb] = dk_new

        sijs_next = [_sij(0, h) for h in range(split)]
        for bb in range(bh_block):
            sijs = sijs_next
            if bb + 1 < bh_block:
                sijs_next = [_sij(bb + 1, h) for h in range(split)]
            _tail(bb, sijs)

    @pl.when(s == num_steps - 1)
    def _finish():
        # dk = dSᵀ q_natural = dSᵀ (q_b2 · ln2)
        for bb in range(bh_block):
            dk_ref[bb] = (dk_acc[bb] * LN2).astype(dk_ref.dtype)
            dv_ref[bb] = dv_acc[bb].astype(dv_ref.dtype)


def _dq_kernel_t(
    q_ref, k_ref, kt_ref, v_ref, do_ref, lse_ref, delta_ref, dqt_ref,
    dqt_acc, *, sched: Schedule, num_steps: int,
):
    """Transposed dQ kernel for small head dims (d ≤ 64): score tiles stay
    K-major ``(bkv, bq)`` so dQ accumulates as ``dQ^T = K^T @ dS^T`` — a
    full-128-lane NN dot (the standard orientation's ``dS @ K`` writes only
    d ≤ 64 output lanes). Bonus: lse/delta arrive as (1, bq) lane vectors
    and need no lane→sublane relayout. See docs/DESIGN.md §10."""
    i = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv

    @pl.when(s == 0)
    def _init():
        dqt_acc[...] = jnp.zeros_like(dqt_acc)

    @pl.when(sched.step_needed(i, s))
    def _step():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        lse = lse_ref[0]      # (1, bq) lane vector
        delta = delta_ref[0]
        do = do_ref[0]

        sijt = lax.dot_general(k, q, _NT, preferred_element_type=jnp.float32)
        if sched.has_mask:
            kv_idx = sched.kv_block_index(i, s)
            q_pos = i * bq + lax.broadcasted_iota(jnp.int32, (bkv, bq), 1)
            k_pos = kv_idx * bkv + lax.broadcasted_iota(jnp.int32, (bkv, bq), 0)
            mask = sched.mask(q_pos, k_pos)
            if mask is not None:
                sijt = jnp.where(mask, sijt, DEFAULT_MASK_VALUE)
        pt = jnp.exp2(sijt - lse * LOG2E)
        dpt = lax.dot_general(
            v, do.astype(v.dtype), _NT, preferred_element_type=jnp.float32
        )  # (bkv, bq)
        dst = pt * (dpt - delta)
        dqt_acc[...] += lax.dot_general(
            kt_ref[0], dst.astype(k.dtype), _NN,
            preferred_element_type=jnp.float32,
        )  # (d, bq)

    @pl.when(s == num_steps - 1)
    def _finish():
        dqt_ref[0] = (dqt_acc[...] * LN2).astype(dqt_ref.dtype)


def _dkv_kernel_t(
    q_ref, qt_ref, k_ref, v_ref, do_ref, dot_ref, lse_ref, delta_ref,
    dkt_ref, dvt_ref, dkt_acc, dvt_acc, *, sched: Schedule, num_steps: int,
):
    """Transposed dK/dV kernel for d ≤ 64: ``dV^T = dO^T ·NT· P^T`` and
    ``dK^T = Q^T ·NT· dS^T`` keep the contraction over bq (full MXU depth)
    and the output lanes at bkv (full width); the standard orientation's
    TN dots write only d ≤ 64 lanes."""
    j = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv

    @pl.when(s == 0)
    def _init():
        dkt_acc[...] = jnp.zeros_like(dkt_acc)
        dvt_acc[...] = jnp.zeros_like(dvt_acc)

    @pl.when(sched.q_step_needed(j, s))
    def _step():
        q_idx = sched.q_block_index(j, s)
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        lse = lse_ref[0]      # (1, bq) lane vector
        delta = delta_ref[0]
        do = do_ref[0]

        sijt = lax.dot_general(k, q, _NT, preferred_element_type=jnp.float32)
        if sched.has_mask:
            q_pos = q_idx * bq + lax.broadcasted_iota(jnp.int32, (bkv, bq), 1)
            k_pos = j * bkv + lax.broadcasted_iota(jnp.int32, (bkv, bq), 0)
            mask = sched.mask(q_pos, k_pos)
            if mask is not None:
                sijt = jnp.where(mask, sijt, DEFAULT_MASK_VALUE)
        pt = jnp.exp2(sijt - lse * LOG2E)  # (bkv, bq)
        dvt_acc[...] += lax.dot_general(
            dot_ref[0], pt.astype(do.dtype), _NT,
            preferred_element_type=jnp.float32,
        )  # (dv, bkv)
        dpt = lax.dot_general(
            v, do.astype(v.dtype), _NT, preferred_element_type=jnp.float32
        )
        dst = pt * (dpt - delta)
        dkt_acc[...] += lax.dot_general(
            qt_ref[0], dst.astype(q.dtype), _NT,
            preferred_element_type=jnp.float32,
        )  # (d, bkv)

    @pl.when(s == num_steps - 1)
    def _finish():
        dkt_ref[0] = (dkt_acc[...] * LN2).astype(dkt_ref.dtype)
        dvt_ref[0] = dvt_acc[...].astype(dvt_ref.dtype)


def _flash_backward_t(
    q, k, v, lse3, delta3, sched: Schedule, *, interpret: bool, do
):
    """Transposed-layout backward dispatch for d ≤ 64 (X^T inputs/outputs
    produced/consumed by XLA outside the kernels)."""
    bh, nq_pad, d = q.shape
    nkv_pad = k.shape[1]
    dv_dim = v.shape[-1]
    bq, bkv = sched.block_q, sched.block_kv
    qt = q.transpose(0, 2, 1)
    kt = k.transpose(0, 2, 1)
    dot_ = do.transpose(0, 2, 1)
    # s and dp score tiles are live together (plus p) — past the 16 MB
    # scoped default at 1024×2048 blocks (measured 16.36M OOM)
    mb = _auto_vmem_mb(sched, None, extra_tiles=1)
    vmem_bytes = (mb << 20) if mb else None

    dqt = pl.pallas_call(
        functools.partial(_dq_kernel_t, sched=sched,
                          num_steps=sched.max_kv_steps),
        grid=(bh, sched.num_q_blocks, sched.max_kv_steps),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i, s: (b, i, 0)),
            pl.BlockSpec(
                (1, bkv, d),
                lambda b, i, s, _s=sched: (b, _s.kv_block_index(i, s), 0),
            ),
            pl.BlockSpec(
                (1, d, bkv),
                lambda b, i, s, _s=sched: (b, 0, _s.kv_block_index(i, s)),
            ),
            pl.BlockSpec(
                (1, bkv, dv_dim),
                lambda b, i, s, _s=sched: (b, _s.kv_block_index(i, s), 0),
            ),
            pl.BlockSpec((1, bq, dv_dim), lambda b, i, s: (b, i, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, i, s: (b, 0, i)),
            pl.BlockSpec((1, 1, bq), lambda b, i, s: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, d, bq), lambda b, i, s: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((bh, d, nq_pad), q.dtype),
        scratch_shapes=[pltpu.VMEM((d, bq), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_bytes,
        ),
        interpret=interpret,
    )(q, k, kt, v, do, lse3, delta3)

    dkt, dvt = pl.pallas_call(
        functools.partial(_dkv_kernel_t, sched=sched,
                          num_steps=sched.max_q_steps),
        grid=(bh, sched.num_kv_blocks, sched.max_q_steps),
        in_specs=[
            pl.BlockSpec(
                (1, bq, d),
                lambda b, j, s, _s=sched: (b, _s.q_block_index(j, s), 0),
            ),
            pl.BlockSpec(
                (1, d, bq),
                lambda b, j, s, _s=sched: (b, 0, _s.q_block_index(j, s)),
            ),
            pl.BlockSpec((1, bkv, d), lambda b, j, s: (b, j, 0)),
            pl.BlockSpec((1, bkv, dv_dim), lambda b, j, s: (b, j, 0)),
            pl.BlockSpec(
                (1, bq, dv_dim),
                lambda b, j, s, _s=sched: (b, _s.q_block_index(j, s), 0),
            ),
            pl.BlockSpec(
                (1, dv_dim, bq),
                lambda b, j, s, _s=sched: (b, 0, _s.q_block_index(j, s)),
            ),
            pl.BlockSpec(
                (1, 1, bq),
                lambda b, j, s, _s=sched: (b, 0, _s.q_block_index(j, s)),
            ),
            pl.BlockSpec(
                (1, 1, bq),
                lambda b, j, s, _s=sched: (b, 0, _s.q_block_index(j, s)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, d, bkv), lambda b, j, s: (b, 0, j)),
            pl.BlockSpec((1, dv_dim, bkv), lambda b, j, s: (b, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, d, nkv_pad), k.dtype),
            jax.ShapeDtypeStruct((bh, dv_dim, nkv_pad), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, bkv), jnp.float32),
            pltpu.VMEM((dv_dim, bkv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_bytes,
        ),
        interpret=interpret,
    )(q, qt, k, v, do, dot_, lse3, delta3)

    return (
        dqt.transpose(0, 2, 1),
        dkt.transpose(0, 2, 1),
        dvt.transpose(0, 2, 1),
    )


def flash_backward(
    q, k, v, o, lse, do, dlse, sched: Schedule, *, interpret: bool,
    split: int | None = None, quant: str | None = None,
):
    """Compute (dq, dk, dv) on padded (BH, n_pad, d) arrays.

    ``q`` is the pre-scaled query (the forward folded the 1/√d scale into
    it), so no scale appears here — the outer autodiff of the scaling op
    restores it. ``dlse`` (cotangent of the returned lse) folds into the
    delta term: ds_ij = p_ij·(dp_ij − (Δ_i − dlse_i)).

    ``quant="dp"`` runs both dp = dO·Vᵀ dots on the 2× int8 MXU (the
    only route past the ~151 TFLOP/s 5-dot structural bound, DESIGN §23):
    V is quantized per channel and dO per token (with V's channel scales
    pre-folded), all scale algebra folds into the delta operand, the dq
    epilogue, and a prescaled q operand — the hot loops gain only the
    int32→f32 convert. dv and the s-recompute stay exact; dq/dk carry
    ~0.5%-relative dp rounding, inside the ≤2.5e-2 grad gate
    (tests/test_grad.py::test_bwd_quant_*). d ≤ 64 (transposed kernels)
    ignores the flag.
    """
    bh, nq_pad, d = q.shape
    nkv_pad = k.shape[1]
    dv_dim = v.shape[-1]
    bq, bkv = sched.block_q, sched.block_kv

    # Band backward retiles to 512×512 regardless of the forward's blocks:
    # at the forward's large tiles most of a band tile is masked waste and
    # the bh packing below can't engage (VMEM); measured r3_exp2 D:
    # 512/512/bhb4 = 59.5 TFLOP/s covered vs 33 at the forward defaults.
    # Only when the forward's padding stays block-aligned (fwd blocks are
    # multiples of 512, so it does unless the caller forced odd blocks).
    band = isinstance(sched, (LocalSchedule, CirculantSchedule))
    if band:
        import dataclasses as _dc

        if _BWD_BAND_TILE is not None:
            nb_q, nb_kv = _BWD_BAND_TILE
        else:
            nb_q, nb_kv = min(bq, 512), min(bkv, 512)
        cand = _dc.replace(sched, block_q=nb_q, block_kv=nb_kv)
        if cand.n_q_pad == nq_pad and cand.n_kv_pad == nkv_pad:
            sched, bq, bkv = cand, nb_q, nb_kv

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)

    dp_quant = quant == "dp" and not (d <= 64 and dv_dim <= 64)
    if quant not in (None, "dp"):
        raise ValueError(f"unknown bwd quant mode {quant!r}")
    sdo3 = qs_arr = v8 = do8 = None
    if dp_quant:
        # Quantize ONCE outside the kernels (one pass over (bh, n, d)
        # operands — amortized over every block):
        #   v8 per channel; dO prescaled by V's channel scales then
        #   quantized per token, so dp = σdo_i · (do8 · v8ᵀ) exactly.
        # The scale algebra then folds AWAY from the hot loops:
        #   ds = p(dp − Δ) = σdo ⊙ (p(raw − Δ/σdo))  → delta := Δ/σdo,
        #   dq = σdo ⊙ Σ ds_raw·K                    → dq epilogue row,
        #   dk = Σ ds_rawᵀ·(q ⊙ σdo)                 → prescaled q operand.
        v32 = v.astype(jnp.float32)
        sv = jnp.maximum(
            jnp.max(jnp.abs(v32), axis=1, keepdims=True), 1e-12) / 127.0
        v8 = jnp.clip(jnp.round(v32 / sv), -127, 127).astype(jnp.int8)
        do_eff = do.astype(jnp.float32) * sv  # (bh, n, dv)
        sdo = jnp.maximum(
            jnp.max(jnp.abs(do_eff), axis=-1, keepdims=True), 1e-30) / 127.0
        do8 = jnp.clip(jnp.round(do_eff / sdo), -127, 127).astype(jnp.int8)
        sdo_row = sdo[..., 0]                  # (bh, nq_pad)
        delta = delta / sdo_row
        qs_arr = (q.astype(jnp.float32) * sdo).astype(q.dtype)
        sdo3 = sdo_row[:, None, :]

    # Padded / fully-masked rows have lse = −inf ⇒ p would be exp(+inf).
    # Clamp those rows to +big so p underflows to 0 instead.
    lse_safe = jnp.where(jnp.isfinite(lse), lse, 3e38).astype(jnp.float32)
    lse3 = lse_safe[:, None, :]  # (BH, 1, nq_pad) → (1,1,bq) lane blocks
    delta3 = delta[:, None, :]

    if split is None:
        split = DEFAULT_SPLIT
    if split < 1 or (split > 1 and (
            bkv % split or bq % split
            or (bkv // split) % 128 or (bq // split) % 128)):
        raise ValueError(
            f"split={split} must divide block_q={bq} and block_kv={bkv} "
            "into 128-aligned sub-tiles")

    if d <= 64 and dv_dim <= 64 and not (band and _BWD_SMALL_D_STANDARD):
        # the transposed kernels have no sub-tile staging; split is ignored
        # (but still validated above so a bad value errors on every path).
        # Band schedules skip the transposed layout: they are
        # step-latency-bound, so the standard kernels' bh packing beats
        # full output lanes (the forward's r4_exp8 dispatch, mirrored).
        return _flash_backward_t(
            q, k, v, lse3, delta3, sched, interpret=interpret, do=do
        )

    num_q_blocks = sched.num_q_blocks
    num_kv_blocks = sched.num_kv_blocks

    # Batch-head packing (the forward's band remedy applied to both
    # backward grids): band backward was step-overhead-bound at 33 TFLOP/s
    # covered (VERDICT r2 item 3). Rows are 1:1 here (k/v already at q-head
    # rows), so packing needs no GQA restriction. Honors force_bh_block.
    from tpu_flash.ops import flash as _flash

    bhb = 1
    if _flash._BH_BLOCK_OVERRIDE is not None:
        # experiment override: honored for every schedule (dense included —
        # the r4 backward sweep probes dense packing the way r4_exp3 did
        # for the forward)
        if bh % _flash._BH_BLOCK_OVERRIDE == 0:
            bhb = _flash._BH_BLOCK_OVERRIDE
    elif sched.has_mask:  # band/causal schedules; dense auto stays unpacked
        # 8 MB cap: the r5 frontier (logs/r5_exp2.jsonl B rows) measured
        # bhb8 at 512x512 as the band-backward argmax (71.5 vs 69.4
        # covered TFLOP/s at the old bhb4/4 MB cap — that cap dated from
        # the fixed-grant era, where 8 MB of live score tiles failed to
        # compile; demand-sized grants lifted it).
        while (bhb < 8 and bh % (bhb * 2) == 0
               and bq * bkv * 4 * (bhb * 2) <= (8 << 20)):
            bhb *= 2
    if bhb > 1:
        split = 1  # bh staging subsumes the sub-tile staging

    # Demand-sized scoped grant + pre-lowering pruning (ops/vmem.py):
    # round 4's backward sweep showed every HTTP-500 row was an UNDER-
    # grant (1024²/bhb2 died at the 16 MB default while 2048²/bhb1
    # compiled at 32 MB), not a hardware limit — same fix as the forward.
    from tpu_flash.ops.vmem import estimate_bwd_vmem

    est = estimate_bwd_vmem(
        block_q=bq, block_kv=bkv, d=d, dv=dv_dim, bh_block=bhb,
    ).check()
    vmem_bytes = est.grant_bytes

    # ---- dQ: Q-major grid, forward schedule.
    dq_steps = sched.max_kv_steps
    row_spec = pl.BlockSpec((bhb, 1, bq), lambda b, i, s: (b, 0, i))
    if _BWD_PARTS in ("dkv", "none"):
        dq = jnp.zeros((bh, nq_pad, d), q.dtype)
    else:
        dq = pl.pallas_call(
        functools.partial(_dq_kernel, sched=sched, num_steps=dq_steps,
                          split=split, bh_block=bhb, dp_quant=dp_quant),
        grid=(bh // bhb, num_q_blocks, dq_steps),
        in_specs=[
            pl.BlockSpec((bhb, bq, d), lambda b, i, s: (b, i, 0)),
            pl.BlockSpec(
                (bhb, bkv, d),
                lambda b, i, s, _s=sched: (b, _s.kv_block_index(i, s), 0)
            ),
            pl.BlockSpec(
                (bhb, bkv, dv_dim),
                lambda b, i, s, _s=sched: (b, _s.kv_block_index(i, s), 0),
            ),
            pl.BlockSpec((bhb, bq, dv_dim), lambda b, i, s: (b, i, 0)),
            row_spec,
            row_spec,
        ] + ([row_spec] if dp_quant else []),
        out_specs=pl.BlockSpec((bhb, bq, d), lambda b, i, s: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((bhb, bq, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_bytes,
        ),
        interpret=interpret,
    )(q, k,
      *((v8, do8) if dp_quant else (v, do)),
      lse3, delta3, *((sdo3,) if dp_quant else ()))

    # ---- dK/dV: KV-major grid, transposed schedule.
    dkv_steps = sched.max_q_steps
    if _BWD_PARTS in ("dq", "none"):
        dk = jnp.zeros((bh, nkv_pad, d), k.dtype)
        dv = jnp.zeros((bh, nkv_pad, dv_dim), v.dtype)
    else:
        q_spec = pl.BlockSpec(
            (bhb, bq, d),
            lambda b, j, s, _s=sched: (b, _s.q_block_index(j, s), 0))
        do_spec = pl.BlockSpec(
            (bhb, bq, dv_dim),
            lambda b, j, s, _s=sched: (b, _s.q_block_index(j, s), 0))
        qrow_spec = pl.BlockSpec(
            (bhb, 1, bq),
            lambda b, j, s, _s=sched: (b, 0, _s.q_block_index(j, s)))
        dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, sched=sched, num_steps=dkv_steps,
                          split=split, bh_block=bhb, dp_quant=dp_quant),
        grid=(bh // bhb, num_kv_blocks, dkv_steps),
        in_specs=[q_spec]
        + ([q_spec] if dp_quant else [])  # qs_arr = q ⊙ σdo
        + [
            pl.BlockSpec((bhb, bkv, d), lambda b, j, s: (b, j, 0)),
            pl.BlockSpec((bhb, bkv, dv_dim), lambda b, j, s: (b, j, 0)),
            do_spec,
        ]
        + ([do_spec] if dp_quant else [])  # do8
        + [
            qrow_spec,
            qrow_spec,
        ],
        out_specs=[
            pl.BlockSpec((bhb, bkv, d), lambda b, j, s: (b, j, 0)),
            pl.BlockSpec((bhb, bkv, dv_dim), lambda b, j, s: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nkv_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nkv_pad, dv_dim), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bhb, bkv, d), jnp.float32),
            pltpu.VMEM((bhb, bkv, dv_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_bytes,
        ),
        interpret=interpret,
    )(q, *((qs_arr,) if dp_quant else ()), k,
      *((v8, do, do8) if dp_quant else (v, do)),
      lse3, delta3)

    return dq, dk, dv
