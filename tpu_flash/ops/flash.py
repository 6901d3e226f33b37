"""Fused flash-attention kernels (Pallas/TPU) — the framework's hot path.

A single schedule-parameterized kernel family replaces the reference's four
CPU kernel variants (src/dense.jl, src/windowed.jl, src/circulant.jl) and its
unshipped CUDA kernel (src/cuda/flash.jl): blockwise QKᵀ on the MXU, online
softmax in VMEM scratch, V-accumulate — FA-2 style (deferred normalization,
log-sum-exp statistic) rather than the reference's FA-1 per-iteration rescale
(src/dense.jl:82-91); the ``(l, m)`` observable contract survives as
``lse = m + log l``, which carries the identical merge algebra used later by
ring attention (parallel/ring.py).

Grid: ``(batch·heads, q_blocks, kv_steps)`` — the first two dimensions are
embarrassingly parallel (the role of the reference's ``@threads`` over
(batch, row-block), src/dense.jl:45) and are marked ``parallel`` so Mosaic
can split them over TPU megacores; the kv-step dimension is the sequential
online-softmax scan (``arbitrary``). Block sizes are VMEM-budget knobs, the
TPU analog of the reference's cache-derived ``Bc/Br`` (src/dense.jl:34-35)
whose mis-sizing cost it 4–30× (BASELINE.md cache sweep).
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.ops import schedule as sched_lib
from tpu_flash.ops.vmem import estimate_fwd_vmem
from tpu_flash.ops.schedule import (
    BlockDiagonalSchedule,
    CausalSchedule,
    CirculantSchedule,
    LocalSchedule,
    Schedule,
    ShiftedMaskSchedule,
    cdiv,
)
from tpu_flash.utils.layout import (
    flatten_spatial,
    unflatten_spatial,
    window,
    unwindow,
    window_counts,
)

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)
_LANES = 128
# base-2 softmax: log2(e) folds into the q prescale so the kernel's hot
# exp over the score matrix is a bare exp2 (saves the per-element
# x*log2e multiply the VPU's exp lowering would do; +3% fwd on v5e).
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)

# NT contraction: (m, d) x (n, d) -> (m, n)
_NT_DIMS = (((1,), (1,)), ((), ()))


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# Experiment knob: override the auto batch-head packing factor (the number
# of batch·head rows fused into one grid step to amortize the fixed ~2 µs
# per-step cost at small tiles). None = auto (VMEM-budget heuristic below).
_BH_BLOCK_OVERRIDE: Optional[int] = None


# Experiment knobs for the in-step pipelined band forward (VERDICT r2
# item 3): None = off (BlockSpec pipeline), True/False = force. Sub-tile
# width is the DMA slab the kernel streams per fori_loop iteration.
_BAND_PIPELINE: Optional[bool] = None
_BAND_SUB: int = 512


_BAND_ELEM: bool = False


@contextlib.contextmanager
def band_pipeline(on: Optional[bool], sub: Optional[int] = None,
                  elem: Optional[bool] = None):
    """Force the Local/Circulant forward through the in-step pipelined
    kernel (:func:`_fwd_kernel_band`). For A/B experiments.

    ``elem=True`` additionally starts each q block's kv slab at its exact
    band start via an ELEMENT-granular ``pl.ds`` DMA offset instead of an
    aligned tile index — the capability r3's Mosaic could not compile
    (DESIGN §22) and the round-5 probe showed the current libtpu can
    (logs/r5_band_probe.jsonl). Cuts the aligned-tile coverage inflation
    (~2.5× at the shipped sliding default) to ~1×.

    Jit-cache hazard (like the other trace-time diagnostic globals here):
    the flags are captured at trace time, so a function jitted inside the
    context keeps its setting after exit.
    """
    global _BAND_PIPELINE, _BAND_SUB, _BAND_ELEM
    prev, prev_sub, prev_e = _BAND_PIPELINE, _BAND_SUB, _BAND_ELEM
    _BAND_PIPELINE = on
    if sub is not None:
        _BAND_SUB = sub
    if elem is not None:
        _BAND_ELEM = elem
    try:
        yield
    finally:
        _BAND_PIPELINE, _BAND_SUB, _BAND_ELEM = prev, prev_sub, prev_e


_ISOLATE = ""

# Route band schedules at d ≤ 64 through the STANDARD kernel (bh packing
# + constant bound-max) instead of the transposed layout. Measured
# (logs/r4_exp8.jsonl): sliding w=1025 d=64 @8k 2.77 → 2.24 ms at the
# band default tiles — bands are step-latency-bound, so packing beats
# the transposed kernel's full PV lanes.
_SMALL_D_STANDARD = True

# None = schedule-based auto (see _flash_fwd); True/False = forced.
_BOUND_MAX_OVERRIDE: Optional[bool] = None


@contextlib.contextmanager
def force_standard_small_d(on: bool):
    """A/B override: run d ≤ 64 band schedules through the standard
    (non-transposed) forward kernel. Measurement only until the dispatch
    rule is frozen from logs/r4_exp8.jsonl."""
    global _SMALL_D_STANDARD
    prev = _SMALL_D_STANDARD
    _SMALL_D_STANDARD = on
    try:
        yield
    finally:
        _SMALL_D_STANDARD = prev


@contextlib.contextmanager
def force_bound_max(on: Optional[bool]):
    """Force the bf16 forward's norm-bound running max on/off (None =
    auto). The bound replaces the per-step score max with the constant
    Cauchy-Schwarz bound |q_i|·max_j|k_j| computed once per q block —
    exact online softmax under ANY upper bound (exponent shift), and with
    a CONSTANT m the alpha-rescale chain vanishes too. Measured for the
    band kernel in scripts/r4_exp4.py (the serving kernel's bound_max
    measured int8 148→167 TFLOP/s, DESIGN §10)."""
    global _BOUND_MAX_OVERRIDE
    prev = _BOUND_MAX_OVERRIDE
    _BOUND_MAX_OVERRIDE = on
    try:
        yield
    finally:
        _BOUND_MAX_OVERRIDE = prev


@contextlib.contextmanager
def force_isolate(mode: str):
    """Run the standard forward kernel with one pass deleted — outputs are
    WRONG; measurement only (scripts/r4_exp4.py band floor decomposition).
    ``mode`` ∈ {"", "noexp", "nosum", "dots", "nomask"}.

    JIT-CACHE HAZARD: the mode is a module global read at TRACE time, not
    part of any jit cache key. A function first traced inside this context
    keeps the deleted-pass kernel FOREVER — wrong results persist after the
    context exits. Measurement scripts must build a fresh (un-jitted or
    freshly-wrapped) callable per mode and never reuse it outside."""
    global _ISOLATE
    prev = _ISOLATE
    _ISOLATE = mode
    try:
        yield
    finally:
        _ISOLATE = prev


@contextlib.contextmanager
def force_bh_block(n: Optional[int]):
    """Force the forward kernels' batch-head packing to ``n`` (MHA only;
    ignored where unsupported). For block-size experiments — production
    callers rely on the auto heuristic."""
    global _BH_BLOCK_OVERRIDE
    prev = _BH_BLOCK_OVERRIDE
    _BH_BLOCK_OVERRIDE = n
    try:
        yield
    finally:
        _BH_BLOCK_OVERRIDE = prev


def _round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def _pick_block(n: int, preferred: int) -> int:
    """Largest tile-aligned block ≤ preferred that keeps the grid tight."""
    return min(preferred, _round_up(max(n, 1), _LANES))


def _fwd_kernel(
    *refs,
    sched: Schedule,
    num_steps: int,
    need_lse: bool = True,
    use_bias: bool = False,
    bh_block: int = 1,
    isolate: str = "",
    bound_max: bool = False,
):
    # ``isolate`` is a DIAGNOSTIC knob (scripts/r4_exp4.py): it deletes one
    # pass so its serial cost can be measured against the rest — outputs
    # are WRONG under it. Values: "noexp" (per-element exp2 becomes a
    # subtract), "nosum" (the l reduction is skipped), "dots" (bare dot
    # chain, no softmax state), "nomask" (edge-tile mask/bias work
    # skipped — scores used as if interior). The band-kernel floor
    # decomposition the r3 verdict asked for (VERDICT r3 item 3), matching
    # quant/serving_attn.py's dense-kernel isolate (DESIGN §20).
    #
    # ``bound_max``: the running max is replaced by the CONSTANT bound
    # |q_i|·(max_j |k_j|) set at init — exact online softmax under any
    # upper bound; with m constant, alpha ≡ 1 and the per-step max pass
    # AND the acc-rescale chain both vanish (the band kernel's two
    # largest VPU terms after the dot floor — r4_exp4 decomposition).
    if use_bias:
        bias_ref, *refs = refs
    else:
        bias_ref = None
    if bound_max:
        kmx_ref, *refs = refs  # (bhb, 1, 1) per-row global ‖k‖ max
    else:
        kmx_ref = None
    q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr = refs
    i = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv

    @pl.when(s == 0)
    def _init():
        if bound_max:
            for bb in range(bh_block):
                q = q_ref[bb].astype(jnp.float32)
                qb = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
                m_scr[bb] = jnp.broadcast_to(
                    qb * (kmx_ref[bb, 0, 0] * 1.0001), m_scr.shape[1:])
        else:
            m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _apply_mask(sij):
        kv_idx = sched.kv_block_index(i, s)
        q_pos = i * bq + lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
        k_pos = kv_idx * bkv + lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
        mask = sched.mask(q_pos, k_pos)
        if mask is not None:
            sij = jnp.where(mask, sij, DEFAULT_MASK_VALUE)
        return sij

    def _update(sij, bb):
        if isolate == "dots":
            pv = lax.dot_general(
                (sij * (1.0 / 4096.0)).astype(v_ref.dtype), v_ref[bb],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[bb] = acc_scr[bb] + pv
            l_scr[bb] = jnp.ones_like(l_scr[bb])
            return
        m_prev = m_scr[bb, :, :1]
        l_prev = l_scr[bb, :, :1]
        if bound_max:
            # constant bound: no per-step max, alpha ≡ 1, no rescale
            m_next = m_prev
            alpha = None
        else:
            m_curr = jnp.max(sij, axis=-1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            # scores are in base-2 units (q pre-scaled by scale*log2e), so
            # the hot exp is a bare exp2; l equals the natural-units value.
            alpha = jnp.exp2(m_prev - m_next)
        if isolate == "noexp":
            p = (sij - m_next) * (1.0 / 4096.0)
        else:
            p = jnp.exp2(sij - m_next)
        l_sum = (1.0 if isolate == "nosum"
                 else jnp.sum(p, axis=-1, keepdims=True))
        if bound_max:
            l_next = l_prev + l_sum
        else:
            l_next = alpha * l_prev + l_sum
            m_scr[bb] = jnp.broadcast_to(m_next, m_scr.shape[1:])
        l_scr[bb] = jnp.broadcast_to(l_next, l_scr.shape[1:])
        pv = lax.dot_general(
            p.astype(v_ref.dtype),
            v_ref[bb],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_scr[bb] = (pv + (acc_scr[bb] if bound_max
                             else acc_scr[bb] * alpha))

    def _masked_scores(sij):
        if use_bias:
            # one streamed additive-bias tile (0 / mask-value), selected
            # by the BlockSpec pattern index — replaces the ~5-pass
            # iota/compare/where chain on edge tiles (VERDICT r1 item 3).
            return sij + bias_ref[0].astype(jnp.float32)
        return _apply_mask(sij)

    @pl.when(sched.step_needed(i, s))
    def _step():
        # bh_block > 1 amortizes the fixed per-grid-step cost (DMA issue,
        # scalar loop, revisit checks — measured ~2 µs/step) over several
        # batch·head rows: at small blocks the per-step MXU work is ~1 µs,
        # so the step overhead, not flops or masking, dominates band
        # schedules (dense bq=bkv=512 measures 58 TFLOP/s vs 153 at
        # bkv=2048 with identical total flops).
        unm = sched.block_unmasked(i, s) if sched.has_mask else None

        def _qk(bb):
            return lax.dot_general(
                q_ref[bb], k_ref[bb], _NT_DIMS,
                preferred_element_type=jnp.float32,
            )

        def _run(masked):
            # Software-pipelined over the bh rows: row bb+1's QKᵀ is issued
            # before row bb's softmax/PV chain, so the MXU dot of the next
            # independent tile can overlap the VPU online-softmax of the
            # current one (the dot → softmax → dot chain is what pins small
            # tiles at the ~2 µs latency floor, DESIGN §12).
            s_next = _qk(0)
            for bb in range(bh_block):
                sij = s_next
                if bb + 1 < bh_block:
                    s_next = _qk(bb + 1)
                _update(_masked_scores(sij) if masked else sij, bb)

        if not sched.has_mask or unm is True or isolate == "nomask":
            # statically mask-free (dense / full-section block-diag) — or
            # the mask/bias pass deleted for floor measurement ("nomask")
            _run(False)
        elif unm is None:
            _run(True)
        else:
            # interior-block fast path: tiles fully inside the visible
            # region skip the mask work entirely. `unm` is per-step (not
            # per-row), so one predicated region covers the whole bh loop.
            pl.when(unm)(lambda: _run(False))
            pl.when(jnp.logical_not(unm))(lambda: _run(True))

    @pl.when(s == num_steps - 1)
    def _finish():
        for bb in range(bh_block):
            l = l_scr[bb, :, :1]
            m = m_scr[bb, :, :1]
            # A fully-masked row's running max equals the mask value itself
            # (every score was DEFAULT_MASK_VALUE, so p = exp2(0) = 1 and
            # l > 0 with a garbage accumulator): such rows are defined as
            # o = 0, lse = -inf, matching the oracle (ops/oracle.py).
            valid = (l > 0.0) & (m > DEFAULT_MASK_VALUE * 0.5)
            l_inv = jnp.where(valid, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
            o_ref[bb] = (acc_scr[bb] * l_inv).astype(o_ref.dtype)
            if need_lse:
                # emit lse in NATURAL log units (the cross-device/backward
                # contract). Skipped when the caller discards it: the
                # lane-broadcast f32 buffer is 2× the output's bytes (e.g.
                # 134 MB at b=4 h=8 n=8k), pure wasted HBM write bandwidth.
                lse = jnp.where(
                    valid, m * LN2 + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                    -jnp.inf,
                )
                lse_ref[bb] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _fwd_kernel_band(
    *refs,
    sched: Schedule,
    sub: int,
    num_tiles: int,
    bh_block: int,
    need_lse: bool,
    rel_lo: int,   # band in relative coords: rel_lo ≤ k − q ≤ rel_hi
    rel_hi: int,
    hq: int,
    hkv: int,
    elem: bool = False,  # element-granular kv slab start (DESIGN §22 r5)
):
    """Band forward with the kv stream hand-pipelined INSIDE one grid step.

    The BlockSpec pipeline pays a fixed ~2 µs per grid step; band schedules
    have so little per-step work that this floor, not flops, bounds them
    (DESIGN §12: sliding w=1025 @8k stuck at ~2.8× dense against 8×
    coverage). Here the grid is just (bh-groups, q-blocks): each invocation
    walks its band's kv sub-tiles in a constant-trip ``fori_loop``,
    streaming K/V slabs from HBM (ANY memory space) through double-buffered
    ``make_async_copy`` — tile t+1's DMA is in flight under tile t's
    dot/softmax, and the bh-row staging overlaps MXU and VPU exactly as in
    :func:`_fwd_kernel`. Out-of-band trailing tiles issue a clamped
    (wasted, but always-valid) DMA and skip compute — issue/wait stay
    symmetric, which is the v5e-safe pattern (a dynamic-trip loop with a
    conditional tail DMA wedges the chip — DESIGN §13).

    The band is expressed in RELATIVE coordinates ``rel_lo ≤ k − q ≤
    rel_hi``: local = (−r, r), local-causal = (−r, 0), circulant over
    halo-extended K/V = (0, 2r). One iota/compare pair covers masking for
    all three; interior tiles skip it entirely.
    """
    (q_ref, k_any, v_any, o_ref, lse_ref, kbuf, vbuf, sems,
     m_scr, l_scr, acc_scr) = refs
    g0 = pl.program_id(0)
    i = pl.program_id(1)
    bq = sched.block_q
    g = hq // hkv

    def kv_row(row):
        if g == 1:
            return row
        return (row // hq) * hkv + (row % hq) // g

    kv_len = sched.kv_len
    kvp = sched.n_kv_pad
    n_tiles_total = kvp // sub
    q_lo = i * bq
    q_hi = jnp.minimum(q_lo + bq - 1, sched.n_q - 1)
    band_lo = jnp.maximum(q_lo + rel_lo, 0)
    band_hi = jnp.minimum(q_hi + rel_hi, kv_len - 1)
    if elem:
        # Near-element slab: start at band_lo aligned DOWN to 8 rows (the
        # HBM memref is (8,128)-tiled; Mosaic must PROVE the dynamic slice
        # offset divisible by 8 — the (x//8)*8 form is what its analysis
        # accepts; a raw element offset fails to compile). Clamped so all
        # num_tiles sub-slabs stay inside [0, kvp) — no per-tile clamping,
        # so no duplicated kv rows to re-mask. The dispatcher budgets the
        # ≤7 alignment rows into num_tiles and guarantees
        # kvp >= num_tiles * sub.
        s0 = jnp.minimum((band_lo // 8) * 8, kvp - num_tiles * sub)
    else:
        t0 = band_lo // sub
        s0 = t0 * sub

    m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    def off_of(t):
        return s0 + t * sub

    def dma(t, slot, bb, which):
        # Tile mode: K/V arrive TILE-POOLED (rows, kvp//sub, sub, d) and
        # the DMA indexes the tile dim with a dynamic SCALAR — on the r3
        # libtpu a dynamic `pl.ds` offset on an ANY-space source crashed
        # Mosaic's compile (bisected r3; the paged kernels' per-page DMAs
        # are scalar-indexed for the same reason). Clamped index: always
        # legal, so issue/wait run unconditionally and stay symmetric.
        # Elem mode (r5 — the current libtpu compiles it, probe P1/P2):
        # K/V arrive FLAT (rows, kvp, d) and the slab starts at the
        # element-granular s0 + t*sub, in-range by construction.
        src, dst = ((k_any, kbuf) if which == 0 else (v_any, vbuf))
        row = kv_row(g0 * bh_block + bb)
        if elem:
            # s0 % 8 == 0 by construction and sub % 8 == 0; Mosaic cannot
            # derive that through the (x//8)*8 arithmetic, so assert it
            # with the multiple_of hint (the (8,128)-tiled HBM memref
            # requires a provably 8-divisible slice offset).
            off8 = pl.multiple_of(s0 + t * sub, 8)
            src_slab = src.at[row, pl.ds(off8, sub)]
        else:
            tidx = jnp.minimum(t0 + t, n_tiles_total - 1)
            src_slab = src.at[row, tidx]
        return pltpu.make_async_copy(
            src_slab,
            dst.at[slot, bb],
            sems.at[slot, which, bb],
        )

    def issue(t, slot):
        for bb in range(bh_block):
            dma(t, slot, bb, 0).start()
            dma(t, slot, bb, 1).start()

    def wait(t, slot):
        for bb in range(bh_block):
            dma(t, slot, bb, 0).wait()
            dma(t, slot, bb, 1).wait()

    issue(0, 0)

    def loop_body(t, _):
        slot = t % 2

        @pl.when(t + 1 < num_tiles)
        def _prefetch():
            issue(t + 1, (t + 1) % 2)

        wait(t, slot)
        off = off_of(t)

        # Elem mode's end-of-sequence clamp can park EARLY slabs fully
        # below band_lo; skip those too (tile mode: s0 ≤ band_lo always,
        # the first slab always intersects).
        live = (off <= band_hi)
        if elem:
            live &= off + sub - 1 >= band_lo

        @pl.when(live)
        def _compute():
            def _qk(bb):
                return lax.dot_general(
                    q_ref[bb], kbuf[slot, bb], _NT_DIMS,
                    preferred_element_type=jnp.float32,
                )

            def _update(sij, bb, masked):
                if masked:
                    q_pos = q_lo + lax.broadcasted_iota(
                        jnp.int32, (bq, sub), 0)
                    k_pos = off + lax.broadcasted_iota(
                        jnp.int32, (bq, sub), 1)
                    rel = k_pos - q_pos
                    keep = (rel >= rel_lo) & (rel <= rel_hi)
                    if kv_len % sub or kvp != kv_len:
                        keep &= k_pos < kv_len
                    sij = jnp.where(keep, sij, DEFAULT_MASK_VALUE)
                m_prev = m_scr[bb, :, :1]
                l_prev = l_scr[bb, :, :1]
                m_curr = jnp.max(sij, axis=-1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp2(m_prev - m_next)
                p = jnp.exp2(sij - m_next)
                l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
                m_scr[bb] = jnp.broadcast_to(m_next, m_scr.shape[1:])
                l_scr[bb] = jnp.broadcast_to(l_next, l_scr.shape[1:])
                pv = lax.dot_general(
                    p.astype(vbuf.dtype), vbuf[slot, bb],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc_scr[bb] = acc_scr[bb] * alpha + pv

            def _run(masked):
                s_next = _qk(0)
                for bb in range(bh_block):
                    sij = s_next
                    if bb + 1 < bh_block:
                        s_next = _qk(bb + 1)
                    _update(sij, bb, masked)

            # interior fast path: every (q, k) pair of the tile in-band
            unm = ((off - q_hi >= rel_lo)
                   & (off + sub - 1 - q_lo <= rel_hi)
                   & (off + sub <= kv_len))
            pl.when(unm)(lambda: _run(False))
            pl.when(jnp.logical_not(unm))(lambda: _run(True))

        return _

    # num_tiles is STATIC and small (≤ ~(bq+2r)/sub + 2): unroll in Python —
    # no loop-carried DMA state for Mosaic to reason about, and the
    # scheduler can overlap across tile iterations.
    for t in range(num_tiles):
        loop_body(t, None)

    for bb in range(bh_block):
        l = l_scr[bb, :, :1]
        m = m_scr[bb, :, :1]
        valid = (l > 0.0) & (m > DEFAULT_MASK_VALUE * 0.5)
        l_inv = jnp.where(valid, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[bb] = (acc_scr[bb] * l_inv).astype(o_ref.dtype)
        if need_lse:
            lse = jnp.where(
                valid, m * LN2 + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                -jnp.inf,
            )
            lse_ref[bb] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _band_tiles(sched: Schedule, sub: int, rel_lo: int, rel_hi: int) -> int:
    """Static max sub-tile count over q blocks (the constant trip count)."""
    best = 1
    bq = sched.block_q
    for i in range(sched.num_q_blocks):
        q_lo = i * bq
        q_hi = min(q_lo + bq - 1, sched.n_q - 1)
        lo = max(q_lo + rel_lo, 0)
        hi = min(q_hi + rel_hi, sched.kv_len - 1)
        if hi >= lo:
            best = max(best, hi // sub - lo // sub + 1)
    return best


def _flash_fwd_band(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    sched: Schedule,
    *,
    interpret: bool,
    out_dtype,
    hq: int = 1,
    hkv: int = 1,
    need_lse: bool = True,
    sub: Optional[int] = None,
):
    """Dispatch of :func:`_fwd_kernel_band` for Local/Circulant schedules."""
    bh, nq_pad, d = q.shape
    dv = v.shape[-1]
    bq = sched.block_q
    if isinstance(sched, CirculantSchedule):
        rel_lo, rel_hi = 0, 2 * sched.radius
    elif isinstance(sched, LocalSchedule):
        rel_lo = -sched.radius
        rel_hi = 0 if sched.causal else sched.radius
    else:
        raise ValueError("band pipeline requires a Local/Circulant schedule")
    if sub is None:
        sub = _BAND_SUB
    sub = min(sub, sched.n_kv_pad)
    if sched.n_kv_pad % sub:
        raise ValueError(f"band sub-tile {sub} must divide n_kv_pad "
                         f"{sched.n_kv_pad}")
    num_tiles = _band_tiles(sched, sub, rel_lo, rel_hi)
    elem = _BAND_ELEM
    if elem and (d % _LANES or dv % _LANES):
        # A flat ANY-space source at d < 128 lane-pads its memref; Mosaic
        # rejects sub-lane-tile slices of it ("slice shape along dim 2
        # must be aligned to tiling (128)"). d ≤ 64 bands take the
        # standard packed kernel anyway (_SMALL_D_STANDARD, r4).
        elem = False
    if elem:
        # Near-exact slab count: the widest per-block band is
        # bq + rel_hi - rel_lo rows, plus ≤7 rows of sublane alignment
        # (the slab start rounds down to 8 — see _fwd_kernel_band). The
        # packing win appears when bq is chosen so this lands just under
        # a sub multiple (e.g. bq=496, r=512, sub=512 → 3 slabs vs the
        # aligned-tile worst case of 4).
        nt_elem = -(-(bq + rel_hi - rel_lo + 7) // sub)
        if nt_elem * sub <= sched.n_kv_pad:
            num_tiles = min(nt_elem, num_tiles)
        else:
            elem = False  # short kv: slab window would overrun; tile mode

    g = hq // hkv
    bhb = 1
    if g == 1:
        if _BH_BLOCK_OVERRIDE is not None:
            if bh % _BH_BLOCK_OVERRIDE == 0:
                bhb = _BH_BLOCK_OVERRIDE
        else:
            while (bhb < 8 and bh % (bhb * 2) == 0
                   and bq * sub * 4 * (bhb * 2) <= (2 << 20)):
                bhb *= 2
    grid = (bh // bhb, sched.num_q_blocks)

    kernel = functools.partial(
        _fwd_kernel_band, sched=sched, sub=sub, num_tiles=num_tiles,
        bh_block=bhb, need_lse=need_lse, rel_lo=rel_lo, rel_hi=rel_hi,
        hq=hq, hkv=hkv, elem=elem,
    )
    if need_lse:
        lse_spec = pl.BlockSpec((bhb, bq, _LANES), lambda b, i: (b, i, 0))
        lse_shape = jax.ShapeDtypeStruct((bh, nq_pad, _LANES), jnp.float32)
    else:
        lse_spec = pl.BlockSpec((bhb, 1, _LANES), lambda b, i: (b, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((bh, 1, _LANES), jnp.float32)

    bhkv = k.shape[0]
    if elem:
        kt, vt = k, v  # flat (rows, kvp, d): the DMA slices element spans
    else:
        kt = k.reshape(bhkv, sched.n_kv_pad // sub, sub, d)
        vt = v.reshape(bhkv, sched.n_kv_pad // sub, sub, dv)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bhb, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((bhb, bq, dv), lambda b, i: (b, i, 0)),
            lse_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, dv), out_dtype),
            lse_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, bhb, sub, d), k.dtype),
            pltpu.VMEM((2, bhb, sub, dv), v.dtype),
            pltpu.SemaphoreType.DMA((2, 2, bhb)),
            pltpu.VMEM((bhb, bq, _LANES), jnp.float32),
            pltpu.VMEM((bhb, bq, _LANES), jnp.float32),
            pltpu.VMEM((bhb, bq, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, kt, vt)
    if not need_lse:
        return o, jnp.zeros((bh, nq_pad), jnp.float32)
    return o, lse[..., 0]


def _fwd_kernel_t(
    *refs,
    sched: Schedule,
    num_steps: int,
    need_lse: bool = True,
    use_bias: bool = False,
):
    """Transposed-layout forward for small head dims (d ≤ 64).

    The standard kernel's PV dot writes dv ≤ 64 output lanes — half the
    128-lane MXU. Here scores stay K-major: ``s_t (bkv, bq) = K ·NT· Q``
    (native), and PV is ``V^T_ext (dv+1, bkv) @ p (bkv, bq)`` — full
    output lanes, with a ones row appended to V^T so the softmax
    denominator rides the same dot (row dv of the accumulator is l).

    The score max is the CONSTANT Cauchy-Schwarz bound
    ``m̂_i = ‖q̂_i‖ · max_ALL_j ‖k_j‖`` (q norms streamed as lane vectors,
    the global k-norm max as one scalar), set once at Q-block init: any
    upper bound keeps online softmax exact — m is only an exponent
    shift, s − m̂ ≤ 0 never overflows, and relative precision is
    unchanged — and a constant m makes alpha ≡ 1, deleting the per-step
    max pass AND the acc-rescale chain (82 → 102 TFLOP/s at d=64 from
    the per-step bound, logs/r2_exp2.jsonl T2/T3; constant upgrade in
    r4, DESIGN §24). Underflow needs the bound to be ≳120 doublings
    above the true max (adversarial norm-aligned inputs), in which case
    rows degrade to o = 0 via the l > 0 guard.
    """
    if use_bias:
        (bias_ref, qn_ref, gk_ref, q_ref, k_ref, vte_ref, ot_ref, lse_ref,
         m_scr, acc_scr) = refs
    else:
        (qn_ref, gk_ref, q_ref, k_ref, vte_ref, ot_ref, lse_ref, m_scr,
         acc_scr) = refs
        bias_ref = None
    i = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv

    @pl.when(s == 0)
    def _init():
        # constant bound: m set once, alpha ≡ 1 for the whole q sweep
        m_scr[...] = jnp.broadcast_to(
            qn_ref[0][:1] * (gk_ref[0, 0, 0] * 1.0001), m_scr.shape)
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
        p = jnp.exp2(st - m_scr[:1]).astype(vte_ref.dtype)
        pv = lax.dot_general(
            vte_ref[0], p, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (dv+1, bq); row dv accumulates l
        acc_scr[...] = acc_scr[...] + pv

    def _masked_scores(st):
        if use_bias:
            return st + bias_ref[0].astype(jnp.float32)
        return _apply_mask(st)

    @pl.when(sched.step_needed(i, s))
    def _step():
        st = lax.dot_general(
            k_ref[0], q_ref[0], _NT_DIMS, preferred_element_type=jnp.float32
        )  # (bkv, bq)
        unm = sched.block_unmasked(i, s) if sched.has_mask else None
        if not sched.has_mask or unm is True:
            _update(st)
        elif unm is None:
            _update(_masked_scores(st))
        else:
            @pl.when(unm)
            def _unmasked():
                _update(st)

            @pl.when(jnp.logical_not(unm))
            def _masked():
                _update(_masked_scores(st))

    @pl.when(s == num_steps - 1)
    def _finish():
        dv = acc_scr.shape[0] - 1
        l = acc_scr[dv:, :]
        # fully-masked (or catastrophically underflowed) rows: o=0, lse=-inf
        valid = l > 0.0
        l_inv = jnp.where(valid, 1.0 / jnp.where(valid, l, 1.0), 0.0)
        ot_ref[0] = (acc_scr[:dv] * l_inv).astype(ot_ref.dtype)
        if need_lse:
            lse = jnp.where(
                valid,
                m_scr[:1] * LN2 + jnp.log(jnp.where(valid, l, 1.0)),
                -jnp.inf,
            )
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _auto_vmem_mb(sched: Schedule, explicit: Optional[int],
                  extra_tiles: int = 0) -> Optional[int]:
    """Raise the scoped-VMEM limit for kernels whose live f32 score-tile
    temporaries exceed the 16 MB default — the masked two-branch forward
    keeps a second (bq, bkv) copy live, and the backward holds s and dp
    simultaneously. The hardware has 128 MB of VMEM; 32–64 MB scoped
    limits measured identical throughput (logs/r2_exp1.jsonl H rows)."""
    if explicit is not None:
        return explicit
    live = sched.block_q * sched.block_kv * 4 * (2 + extra_tiles)
    if live > (14 << 20):
        return 32
    return None


def _bias_operand(sched: Schedule, transposed: bool):
    """Build the precomputed additive-mask operand: ``(bias, spec)`` or
    ``(None, None)``. Gated to tiles ≤ 2 MB so the streamed (double-
    buffered) bias never pressures VMEM — big-block dense/causal keeps
    the in-kernel mask; band schedules (small blocks, mostly edge tiles)
    are the winners."""
    if not sched.has_mask:
        return None, None
    bq, bkv = sched.block_q, sched.block_kv
    # ≤1 MB per tile: the streamed bias costs 2 VMEM buffers on top of the
    # f32 score tile — 1024×1024 blocks measured 20.6 MB scoped (> the
    # 16 MB limit) with a 2 MB bias.
    if bq * bkv * 2 > (1 << 20):
        return None, None
    info = sched.bias_pattern_info()
    if info is None:
        return None, None
    pats, pid = info
    vals = np.where(pats, 0.0, DEFAULT_MASK_VALUE).astype(np.float32)
    if transposed:
        vals = vals.transpose(0, 2, 1)
    bias = jnp.asarray(vals, jnp.bfloat16)
    shape = (1, bkv, bq) if transposed else (1, bq, bkv)
    spec = pl.BlockSpec(shape, lambda b, i, s, _pid=pid: (_pid(i, s), 0, 0))
    return bias, spec


def _flash_fwd_t(
    q: jnp.ndarray,  # (B·HQ, nq_pad, d), pre-scaled (base-2 units)
    k: jnp.ndarray,  # (B·HKV, nkv_pad, d)
    v: jnp.ndarray,  # (B·HKV, nkv_pad, dv)
    sched: Schedule,
    *,
    interpret: bool,
    out_dtype,
    hq: int = 1,
    hkv: int = 1,
    need_lse: bool = True,
    vmem_limit_mb: Optional[int] = None,
):
    """Transposed-layout dispatch of :func:`_fwd_kernel_t` — V^T/O^T and
    the norm lane-vectors are produced/consumed by XLA outside the kernel
    (cheap d×n transposes; ~2% of the attention time at d=64)."""
    bh, nq_pad, d = q.shape
    bhkv, nkv_pad, dv = v.shape
    bq, bkv = sched.block_q, sched.block_kv
    grid = (bh, sched.num_q_blocks, sched.max_kv_steps)
    num_steps = sched.max_kv_steps
    g = hq // hkv

    def kv_row(b):
        if g == 1:
            return b
        return (b // hq) * hkv + (b % hq) // g

    qn = jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=-1))
    qn = jnp.broadcast_to(qn[:, None, :], (bh, 8, nq_pad))
    # global k-norm max per kv row: the CONSTANT per-q-block bound
    kn2 = jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)
    gk = jnp.sqrt(jnp.max(kn2, axis=-1)).reshape(bhkv, 1, 1)
    vte = jnp.concatenate(
        [v.transpose(0, 2, 1), jnp.ones((bhkv, 1, nkv_pad), v.dtype)], axis=1
    )  # (bhkv, dv+1, nkv_pad)

    bias, bias_spec = _bias_operand(sched, transposed=True)
    if sched.has_mask:
        vmem_limit_mb = _auto_vmem_mb(sched, vmem_limit_mb)
    kernel = functools.partial(
        _fwd_kernel_t, sched=sched, num_steps=num_steps, need_lse=need_lse,
        use_bias=bias is not None,
    )
    if need_lse:
        lse_spec = pl.BlockSpec((1, 8, bq), lambda b, i, s: (b, 0, i))
        lse_shape = jax.ShapeDtypeStruct((bh, 8, nq_pad), jnp.float32)
    else:
        lse_spec = pl.BlockSpec((1, 8, bq), lambda b, i, s: (b, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((bh, 8, bq), jnp.float32)

    elem = {jnp.dtype(jnp.float32): 4}.get(jnp.dtype(q.dtype), 2)
    flops = 4 * sched.n_q * sched.kv_len * (d + dv) // 2 * bh
    ot, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([bias_spec] if bias is not None else []) + [
            pl.BlockSpec((1, 8, bq), lambda b, i, s: (b, 0, i)),
            pl.BlockSpec((1, 1, 1), lambda b, i, s: (kv_row(b), 0, 0)),
            pl.BlockSpec((1, bq, d), lambda b, i, s: (b, i, 0)),
            pl.BlockSpec(
                (1, bkv, d),
                lambda b, i, s, _s=sched: (kv_row(b), _s.kv_block_index(i, s), 0),
            ),
            pl.BlockSpec(
                (1, dv + 1, bkv),
                lambda b, i, s, _s=sched: (kv_row(b), 0, _s.kv_block_index(i, s)),
            ),
        ],
        out_specs=[
            pl.BlockSpec((1, dv, bq), lambda b, i, s: (b, 0, i)),
            lse_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, dv, nq_pad), out_dtype),
            lse_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((8, bq), jnp.float32),
            pltpu.VMEM((dv + 1, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(vmem_limit_mb << 20) if vmem_limit_mb else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * elem,
            transcendentals=sched.n_q * sched.kv_len,
        ),
        interpret=interpret,
    )(*(() if bias is None else (bias,)), qn, gk, q, k, vte)
    o = ot.transpose(0, 2, 1)
    if not need_lse:
        return o, jnp.zeros((bh, nq_pad), jnp.float32)
    return o, lse[:, 0, :]


def _flash_fwd(
    q: jnp.ndarray,  # (B·HQ, nq_pad, d), pre-scaled
    k: jnp.ndarray,  # (B·HKV, nkv_pad, d)
    v: jnp.ndarray,  # (B·HKV, nkv_pad, dv)
    sched: Schedule,
    *,
    interpret: bool,
    out_dtype,
    hq: int = 1,
    hkv: int = 1,
    need_lse: bool = True,
    vmem_limit_mb: Optional[int] = None,
    bound_max: Optional[bool] = None,
):
    if (_BAND_PIPELINE and isinstance(sched, (LocalSchedule,
                                              CirculantSchedule))
            and sched.n_kv_pad % _BAND_SUB == 0):
        return _flash_fwd_band(
            q, k, v, sched, interpret=interpret, out_dtype=out_dtype,
            hq=hq, hkv=hkv, need_lse=need_lse,
        )
    band = isinstance(sched, (LocalSchedule, CirculantSchedule))
    if _BOUND_MAX_OVERRIDE is not None:  # experiment override wins
        bound_max = _BOUND_MAX_OVERRIDE
    if bound_max is None:
        # Measured auto-default (logs/r4_exp8.jsonl, r4_exp9.jsonl): the
        # constant-bound max deletes the max+rescale VPU chain — band
        # sliding w=1025 @8k 2.32 → 1.92 ms, circulant 3.15 → 2.68,
        # mask-free dense 166.9 → 174.0 TFLOP/s, causal 105.5 → 120.0,
        # causal-band 4.07 → 3.57 ms. The shifted (ring-hop) and
        # block-diagonal schedules keep the exact max: unmeasured, and
        # ring exactness guarantees compare against whole-sequence runs.
        # NOTE the bound depends on the kv span a call sees — callers
        # needing bit-identical results across kv partitionings pass
        # bound_max=False (the serving engine does, for its chunked-vs-
        # unchunked prefill contract; tests/test_engine.py).
        # Underflow caveat (same contract the d≤64 transposed kernel has
        # carried since r2): rows whose bound exceeds their true max by
        # ≳126 base-2 units (adversarially norm-aligned yet orthogonal
        # q/k) underflow every p to 0 and return o=0/lse=−inf via the
        # valid-row guard instead of the exact value.
        # CAUSAL schedules measured a +14% forward (105.5 → 120.0
        # TFLOP/s, r4_exp9) but a 2-6× GRADIENT-error amplification at
        # small n (causal's early rows have true logsumexp far below the
        # global-|k| bound; suite data: rel 0.0056 → 0.036 at n=1024
        # d=128) — causal therefore keeps the exact max by default and
        # the bound stays a measured opt-in for inference callers.
        # Block-diagonal is excluded explicitly: ALIGNED sections make
        # has_mask False, but the global bound spans heterogeneous
        # sections and measured SLOWER (66.0 exact vs 63.8 covered
        # TFLOP/s, logs/r4_exp10.jsonl).
        bound_max = ((not sched.has_mask
                      and not isinstance(sched, BlockDiagonalSchedule))
                     or (band and not getattr(sched, "causal", False)))
    # The transposed d ≤ 64 kernel's running max IS the norm bound (it has
    # no exact-max variant), so it is eligible only when the resolved
    # bound_max policy is True — masked/causal schedules under the auto
    # default (exact max) and explicit bound_max=False callers (e.g. the
    # engine's span-independence pin) take the standard kernel even at
    # d ≤ 64: the correctness/gradient contract outranks the ~25%
    # small-head speedup (advisor r4; the causal grad-amplification data
    # applies to the transposed kernel's global bound identically).
    use_transposed = q.shape[-1] <= 64 and v.shape[-1] <= 64 and bound_max
    if use_transposed and band and _SMALL_D_STANDARD:
        # band schedules at d ≤ 64 are step-latency bound, not MXU-bound:
        # the standard kernel's bh packing + constant bound-max beat the
        # transposed kernel's full PV lanes there (logs/r4_exp8.jsonl)
        use_transposed = False
    if use_transposed:
        # small head dims: the transposed kernel keeps the MXU's output
        # lanes full (VERDICT r1 item 2; 74.9 → 101.9 TFLOP/s at d=64).
        return _flash_fwd_t(
            q, k, v, sched, interpret=interpret, out_dtype=out_dtype,
            hq=hq, hkv=hkv, need_lse=need_lse, vmem_limit_mb=vmem_limit_mb,
        )
    bh, nq_pad, d = q.shape
    dv = v.shape[-1]
    bq, bkv = sched.block_q, sched.block_kv
    num_steps = sched.max_kv_steps
    g = hq // hkv

    def kv_row(b):
        # GQA: q row b (over B·HQ) reads kv row of its group (over B·HKV) —
        # an index map instead of the jnp.repeat that would g× the K/V HBM
        # traffic and footprint.
        if g == 1:
            return b
        return (b // hq) * hkv + (b % hq) // g

    bias, bias_spec = _bias_operand(sched, transposed=False)
    # masked paths take demand-model grants below like everything else —
    # the old fixed 32 MB _auto_vmem_mb ignored bh packing and OOM'd
    # sliding-causal d=128 at auto bhb=2 by 186 KB (caught by the r4
    # verify drive); grants above need are perf-neutral (DESIGN §12's
    # 32-vs-64 MB measurement).

    # Small tiles leave the fixed ~2 µs per-grid-step cost dominant; pack
    # several batch·head rows into one step (MHA only: the GQA kv_row map
    # would need per-sub-row kv blocks). Budget: the f32 score tile is the
    # VMEM driver — keep bh_block · tile ≤ ~2 MB.
    bhb = 1
    if g == 1:
        # band schedules carry little work per tile and are step-latency
        # bound: allow deep packing (measured best: bq512/bkv1024/bhb8 =
        # 2.24 ms sliding w=1025 @8k, logs/r2_exp5.jsonl E; the manual
        # in-step DMA pipeline measured WORSE — r3_exp2 B). Mask-free
        # dense also wins with deep packing at square tiles (bhb4 at
        # 1024x1024 = 169.3 vs 159.0 TFLOP/s, logs/r4_exp3.jsonl) — the
        # VMEM model prunes over-packed combinations. Masked causal keeps
        # the conservative 2 MB cap (unmeasured at deep packing).
        # mask-free dense allows 32 MB of live score tiles so the 2048×
        # 1024 default packs to bhb4 (its r5 argmax); bands keep 16 MB,
        # masked causal the conservative 2 MB (unmeasured at deep packing)
        cap = ((32 << 20) if not sched.has_mask else
               (16 << 20) if isinstance(
                   sched, (LocalSchedule, CirculantSchedule)) else (2 << 20))
        if _BH_BLOCK_OVERRIDE is not None:
            if bh % _BH_BLOCK_OVERRIDE == 0:
                bhb = _BH_BLOCK_OVERRIDE
        else:
            while (bhb < 8 and bh % (bhb * 2) == 0
                   and bq * bkv * 4 * (bhb * 2) <= cap):
                bhb *= 2
    # Size the scoped grant to the modeled demand and refuse configs past
    # the VMEM envelope before lowering (VERDICT r3 item 2; ops/vmem.py).
    est = estimate_fwd_vmem(
        block_q=bq, block_kv=bkv, d=d, dv=dv, bh_block=bhb,
        kv_bytes=jnp.dtype(k.dtype).itemsize, masked=sched.has_mask,
        has_bias_operand=bias is not None, need_lse=need_lse,
        q_bytes=jnp.dtype(q.dtype).itemsize,
        out_bytes=jnp.dtype(out_dtype).itemsize,
    ).check()
    if vmem_limit_mb is None and est.grant_bytes is not None:
        vmem_limit_mb = est.grant_bytes >> 20
    grid = (bh // bhb, sched.num_q_blocks, num_steps)

    kmx = None
    if bound_max:
        kn2 = jnp.sum(jnp.square(k.astype(jnp.float32)), axis=-1)
        kmx = jnp.sqrt(jnp.max(kn2, axis=-1)).reshape(k.shape[0], 1, 1)

    kernel = functools.partial(
        _fwd_kernel, sched=sched, num_steps=num_steps, need_lse=need_lse,
        use_bias=bias is not None, bh_block=bhb, isolate=_ISOLATE,
        bound_max=bound_max,
    )

    if need_lse:
        lse_spec = pl.BlockSpec((bhb, bq, _LANES), lambda b, i, s: (b, i, 0))
        lse_shape = jax.ShapeDtypeStruct((bh, nq_pad, _LANES), jnp.float32)
    else:
        # never written by the kernel; a single dummy block per batch row
        lse_spec = pl.BlockSpec((bhb, 1, _LANES), lambda b, i, s: (b, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((bh, 1, _LANES), jnp.float32)

    elem = {jnp.dtype(jnp.float32): 4}.get(jnp.dtype(q.dtype), 2)
    flops = 4 * sched.n_q * sched.kv_len * (d + dv) // 2 * bh
    # block-unit index: bhb == 1 goes through the GQA row map; bhb > 1
    # implies MHA (kv rows ≡ q rows), where block b covers rows
    # [b·bhb, (b+1)·bhb)
    kmx_specs = [] if kmx is None else [pl.BlockSpec(
        (bhb, 1, 1),
        lambda b, i, s: ((kv_row(b) if bhb == 1 else b), 0, 0),
    )]
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=([bias_spec] if bias is not None else []) + kmx_specs + [
            pl.BlockSpec((bhb, bq, d), lambda b, i, s: (b, i, 0)),
            pl.BlockSpec(
                (bhb, bkv, d),
                lambda b, i, s, _s=sched: (kv_row(b), _s.kv_block_index(i, s), 0),
            ),
            pl.BlockSpec(
                (bhb, bkv, dv),
                lambda b, i, s, _s=sched: (kv_row(b), _s.kv_block_index(i, s), 0),
            ),
        ],
        out_specs=[
            pl.BlockSpec((bhb, bq, dv), lambda b, i, s: (b, i, 0)),
            lse_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, dv), out_dtype),
            lse_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((bhb, bq, _LANES), jnp.float32),
            pltpu.VMEM((bhb, bq, _LANES), jnp.float32),
            pltpu.VMEM((bhb, bq, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=(vmem_limit_mb << 20) if vmem_limit_mb else None,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(q.size + k.size + v.size) * elem,
            transcendentals=sched.n_q * sched.kv_len,
        ),
        interpret=interpret,
    )(*(() if bias is None else (bias,)),
      *(() if kmx is None else (kmx,)), q, k, v)
    if not need_lse:
        return o, jnp.zeros((bh, nq_pad), jnp.float32)
    return o, lse[..., 0]


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12))
def _fa(q, k, v, sched, interpret, out_dtype, hq=1, hkv=1, need_lse=True,
        vmem_limit_mb=None, bwd_split=None, bound_max=None, bwd_quant=None):
    """Differentiable core on padded (B·H, n_pad, d) arrays → (o, lse).

    The surrounding scaling / padding / halo-concat ops stay outside this
    boundary, so their transposes (e.g. the circulant halo fold-back) are
    handled by XLA autodiff; only the attention itself has a custom VJP.
    GQA (hkv < hq) runs the forward with kv-row index maps (no repeated
    K/V); the backward expands K/V and group-sums dK/dV — a trade the
    training path accepts for a copy-free forward.

    ``need_lse=False`` elides the lse HBM write in the primal (inference)
    call; the vjp forward always materializes lse — it is the backward's
    residual — so gradients are unaffected.
    """
    return _flash_fwd(q, k, v, sched, interpret=interpret,
                      out_dtype=out_dtype, hq=hq, hkv=hkv, need_lse=need_lse,
                      vmem_limit_mb=vmem_limit_mb, bound_max=bound_max)


def _fa_fwd(q, k, v, sched, interpret, out_dtype, hq, hkv, need_lse,
            vmem_limit_mb, bwd_split, bound_max, bwd_quant):
    o, lse = _flash_fwd(q, k, v, sched, interpret=interpret,
                        out_dtype=out_dtype, hq=hq, hkv=hkv, need_lse=True,
                        vmem_limit_mb=vmem_limit_mb, bound_max=bound_max)
    return (o, lse), (q, k, v, o, lse)


def _fa_bwd(sched, interpret, out_dtype, hq, hkv, need_lse, vmem_limit_mb,
            bwd_split, bound_max, bwd_quant, res, cts):
    from tpu_flash.ops.flash_bwd import flash_backward

    q, k, v, o, lse = res
    do, dlse = cts
    g = hq // hkv
    if g > 1:
        bkv_rows, n_pad, d = k.shape
        b = bkv_rows // hkv
        expand = lambda x: jnp.repeat(
            x.reshape(b, hkv, n_pad, -1), g, axis=1
        ).reshape(b * hq, n_pad, -1)
        k, v = expand(k), expand(v)
    dq, dk, dv = flash_backward(q, k, v, o, lse, do, dlse, sched,
                                interpret=interpret, split=bwd_split,
                                quant=bwd_quant)
    if g > 1:
        reduce = lambda x: x.reshape(b, hkv, g, n_pad, -1).sum(axis=2).reshape(
            b * hkv, n_pad, -1)
        dk, dv = reduce(dk), reduce(dv)
    return dq, dk, dv


_fa.defvjp(_fa_fwd, _fa_bwd)


def build_schedule(
    schedule: str,
    n_q: int,
    n_kv: int,
    block_q: int,
    block_kv: int,
    *,
    radius: int = 0,
    section: int = 0,
    shift: int = 0,
    wrap_n: int = 0,
    shifted_causal: bool = False,
) -> Schedule:
    """Pick tile-aligned blocks and construct the Schedule — shared by the
    bf16/f32 path and the quantized path (quant/flash_q.py) so block
    selection and schedule dispatch can't drift apart.

    ``n_kv`` is the REAL key length; the circulant schedule's blocks are
    picked against its halo-extended physical length (kv_len property).
    """
    bq = _pick_block(n_q, block_q)
    pick_len = n_kv + 2 * radius if schedule == "circulant" else n_kv
    bkv = _pick_block(pick_len, block_kv)
    if schedule == "block":
        if section <= 0:
            raise ValueError("block schedule requires section > 0")
        bq = min(bq, section)
        bkv = min(bkv, section)
        while section % bq:
            bq -= 1
        while section % bkv:
            bkv -= 1
    common = dict(n_q=n_q, n_kv=n_kv, block_q=bq, block_kv=bkv)
    if schedule == "dense":
        return Schedule(**common)
    if schedule == "causal":
        return CausalSchedule(**common)
    if schedule == "local":
        return LocalSchedule(**common, radius=radius)
    if schedule == "local_causal":
        return LocalSchedule(**common, radius=radius, causal=True)
    if schedule == "block":
        return BlockDiagonalSchedule(**common, section=section)
    if schedule == "circulant":
        return CirculantSchedule(**common, radius=radius)
    if schedule == "shifted":
        return ShiftedMaskSchedule(
            **common, shift=shift, radius=radius, wrap_n=wrap_n,
            causal=shifted_causal,
        )
    raise ValueError(f"unknown schedule {schedule!r}")


def _pad_seq(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    n = x.shape[1]
    if n == n_pad:
        return x
    return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    schedule: str = "dense",
    scale: Optional[float] = None,
    radius: int = 0,
    section: int = 0,
    shift: int = 0,
    wrap_n: int = 0,
    shifted_causal: bool = False,
    block_q: Optional[int] = None,
    block_kv: Optional[int] = None,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    q_dtype=None,
    kv_dtype=None,
    vmem_limit_mb: Optional[int] = None,
    bwd_split: Optional[int] = None,
    bwd_quant: Optional[str] = None,
    bound_max: Optional[bool] = None,
    kv_scale: str = "token",
):
    """Schedule-parameterized fused attention on ``(batch, heads, n, d)``.

    ``schedule`` ∈ {"dense", "causal", "local", "local_causal", "block",
    "circulant", "shifted"}. ``radius`` configures local/circulant bands;
    ``section`` the block-diagonal chunk; ``shift``/``wrap_n``/
    ``shifted_causal`` parameterize the ring-hop "shifted" schedule
    (ShiftedMaskSchedule, with ``radius=-1`` meaning no band — pass
    radius≥0 to band it). Sequence lengths are padded to block multiples
    internally; outputs are sliced back.

    ``bound_max``: None = measured auto-default (quantized route: on;
    bf16 route: on for mask-free dense and non-causal band schedules —
    off for causal (+14% fwd but 2-6× grad-error amplification at small
    n, DESIGN §22) and for the unmeasured shifted/block-diagonal
    schedules).
    True / False force the Cauchy-Schwarz norm-bound vs the exact
    score-tile running max — both are exact online softmax, but the
    BOUND depends on the kv span the kernel sees, so callers that need
    bit-identical results across different kv partitionings (e.g. the
    engine's chunked-vs-unchunked prefill contract) pass False. The
    d ≤ 64 transposed kernel's running max is structurally the bound,
    so it is used only when the resolved policy is True — masked/causal
    schedules under the auto default and explicit-False callers take
    the standard exact-max kernel at every head dim. ``kv_scale``
    (quantized route only) picks the K-scale granularity ("token" or
    "tensor").
    """
    if q.ndim != 4:
        raise ValueError(f"expected (batch, heads, n, d), got {q.shape}")
    hq, hkv = q.shape[1], k.shape[1]
    if hq % hkv:
        raise ValueError(f"q heads {hq} not a multiple of kv heads {hkv}")
    # Measured defaults (v5e): mask-free bf16 dense runs best at
    # 2048×1024 tiles with bh packing 4 — 177.1 @8k / 181.1 @16k /
    # 189.8 @32k d=128 vs 175.4/187.7 at the r4 square-1024 default
    # (logs/r5_exp4.jsonl A + A32 rows; r4 history: logs/r4_exp3.jsonl).
    # Every other schedule keeps the r2/r3-measured 1024/2048.
    bf16_dense = (schedule == "dense" and q_dtype is None
                  and kv_dtype is None)
    if block_q is None:
        block_q = 2048 if bf16_dense else 1024
    if block_kv is None:
        block_kv = 1024 if bf16_dense else 2048
    if q_dtype is not None or kv_dtype is not None:
        # Quantized route: every schedule and N-d wrapper gains FP8/INT8
        # through this one dispatch (kv_dtype alone = weight-only mode).
        from tpu_flash.quant.flash_q import quantized_flash_attention

        if bwd_split is not None or bwd_quant is not None:
            raise ValueError(
                "bwd_split/bwd_quant apply to the bf16 backward kernels "
                "only; the quantized path has no custom backward (train "
                "in bf16, quantize for serving)")
        return quantized_flash_attention(
            q, k, v,
            q_dtype=q_dtype,
            kv_dtype=kv_dtype if kv_dtype is not None else q_dtype,
            schedule=schedule, scale=scale, radius=radius, section=section,
            shift=shift, wrap_n=wrap_n, shifted_causal=shifted_causal,
            block_q=block_q, block_kv=min(block_kv, 2048),
            return_lse=return_lse, interpret=interpret,
            bound_max=bound_max if bound_max is not None else True,
            kv_scale=kv_scale,
        )
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    dv = v.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()

    qf = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    qf = qf.reshape(b * h, n_q, d)
    kf = k.reshape(b * hkv, n_kv, d)
    vf = v.reshape(b * hkv, n_kv, dv)

    if schedule == "circulant":
        if radius > 0:
            halo_lo = kf[:, -radius:]
            halo_hi = kf[:, :radius]
            kf = jnp.concatenate([halo_lo, kf, halo_hi], axis=1)
            vf = jnp.concatenate([vf[:, -radius:], vf, vf[:, :radius]], axis=1)

    sched = build_schedule(
        schedule, n_q, n_kv, block_q, block_kv, radius=radius,
        section=section, shift=shift, wrap_n=wrap_n,
        shifted_causal=shifted_causal,
    )

    qf = _pad_seq(qf, sched.n_q_pad)
    kf = _pad_seq(kf, sched.n_kv_pad)
    vf = _pad_seq(vf, sched.n_kv_pad)

    o, lse = _fa(qf, kf, vf, sched, interpret, q.dtype, h, hkv, return_lse,
                 vmem_limit_mb, bwd_split, bound_max, bwd_quant)
    o = o[:, :n_q].reshape(b, h, n_q, dv)
    if return_lse:
        return o, lse[:, :n_q].reshape(b, h, n_q)
    return o


# ---------------------------------------------------------------------------
# Reference-parity public API (dense_fa / windowed_fa / block_fa / circulant_fa)
# ---------------------------------------------------------------------------


def _flatten_nd(q, k, v):
    """Accept (b, h, n, d) or (b, *spatial, h, d); return cores + spatial."""
    if q.ndim == 4:
        return q, k, v, None
    q2, spatial = flatten_spatial(q)
    k2, _ = flatten_spatial(k)
    v2, _ = flatten_spatial(v)
    return q2, k2, v2, spatial


def dense_fa(q, k, v, *, scale=None, causal=False, return_lse=False, **kw):
    """Dense fused attention — reference ``dense_fa`` (src/dense.jl:1-102),
    1D core plus N-d spatial flattening (src/dense.jl:6-8)."""
    q, k, v, spatial = _flatten_nd(q, k, v)
    out = flash_attention(
        q, k, v, schedule="causal" if causal else "dense", scale=scale,
        return_lse=return_lse, **kw,
    )
    if spatial is not None:
        if return_lse:
            return unflatten_spatial(out[0], spatial), out[1]
        return unflatten_spatial(out, spatial)
    return out


def sliding_fa(q, k, v, window_size: int, *, scale=None, causal=False,
               return_lse=False, **kw):
    """Sliding-window (local band) fused attention; block-skipping schedule."""
    if window_size % 2 != 1:
        raise ValueError("sliding window must be odd")
    # band-optimal default tiles (measured r2 exp5 E / r3 exp2): dense's
    # big defaults waste most of each band tile on masked keys
    kw.setdefault("block_q", 512)
    kw.setdefault("block_kv", 1024)
    q, k, v, spatial = _flatten_nd(q, k, v)
    out = flash_attention(
        q, k, v, schedule="local_causal" if causal else "local",
        radius=(window_size - 1) // 2, scale=scale, return_lse=return_lse, **kw,
    )
    if spatial is not None:
        if return_lse:
            return unflatten_spatial(out[0], spatial), out[1]
        return unflatten_spatial(out, spatial)
    return out


def circulant_fa(q, k, v, window_size: int, *, scale=None, return_lse=False, **kw):
    """Circulant-band fused attention — reference ``circulant_fa``
    (src/circulant.jl:9-118) re-done as a halo-extended contiguous band
    (no per-element gathers). 1D over the flattened sequence."""
    if window_size % 2 != 1:
        raise ValueError("circulant window must be odd")
    kw.setdefault("block_q", 512)   # band-optimal tiles (see sliding_fa)
    kw.setdefault("block_kv", 1024)
    q, k, v, spatial = _flatten_nd(q, k, v)
    out = flash_attention(
        q, k, v, schedule="circulant", radius=(window_size - 1) // 2,
        scale=scale, return_lse=return_lse, **kw,
    )
    if spatial is not None:
        if return_lse:
            return unflatten_spatial(out[0], spatial), out[1]
        return unflatten_spatial(out, spatial)
    return out


def _block_major(x, sections):
    """(b, *spatial, h, d) → (b, h, N, d) with each N-d section contiguous."""
    b, *spatial, h, d = x.shape
    nd = len(spatial)
    # reshape each spatial dim s into (s // sec, sec)
    new_shape = [b]
    for s, sec in zip(spatial, sections):
        new_shape += [s // sec, sec]
    new_shape += [h, d]
    xr = x.reshape(new_shape)
    # order: outer indices first, then inner indices
    outer = [1 + 2 * i for i in range(nd)]
    inner = [2 + 2 * i for i in range(nd)]
    perm = [0] + outer + inner + [1 + 2 * nd, 2 + 2 * nd]
    xr = xr.transpose(perm)
    n = math.prod(spatial)
    return jnp.moveaxis(xr.reshape(b, n, h, d), 1, 2)


def _unblock_major(x, spatial, sections):
    """Inverse of :func:`_block_major` on (b, h, N, d)."""
    b, h, n, d = x.shape
    nd = len(spatial)
    x = jnp.moveaxis(x, 1, 2)  # (b, n, h, d)
    outer_dims = [s // sec for s, sec in zip(spatial, sections)]
    xr = x.reshape([b] + outer_dims + list(sections) + [h, d])
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm += [1 + 2 * nd, 2 + 2 * nd]
    xr = xr.transpose(perm)
    return xr.reshape(b, *spatial, h, d)


def block_fa(q, k, v, block_size, *, scale=None, return_lse=False, **kw):
    """Disjoint block-diagonal fused attention — reference ``block_fa``
    (src/windowed.jl:1, stride = windowsize, pad = 0).

    1D inputs use the block-diagonal schedule directly. N-d inputs are
    permuted to a block-major layout (pure reshapes/transposes — the TPU
    replacement for im2col patch copies) so each N-d tile is a contiguous
    section, then run through the same schedule.
    """
    if q.ndim == 4:
        if isinstance(block_size, (tuple, list)):
            (block_size,) = block_size
        if q.shape[2] % block_size:
            raise ValueError("block_fa requires seq divisible by block_size")
        return flash_attention(
            q, k, v, schedule="block", section=block_size, scale=scale,
            return_lse=return_lse, **kw,
        )
    b, *spatial, h, d = q.shape
    nd = len(spatial)
    sections = block_size if isinstance(block_size, (tuple, list)) else (block_size,) * nd
    if any(s % sec for s, sec in zip(spatial, sections)):
        raise ValueError(f"spatial dims {spatial} must be divisible by {sections}")
    qb = _block_major(q, sections)
    kb = _block_major(k, sections)
    vb = _block_major(v, sections)
    out = flash_attention(
        qb, kb, vb, schedule="block", section=math.prod(sections), scale=scale,
        return_lse=return_lse, **kw,
    )
    o = out[0] if return_lse else out
    o = _unblock_major(o, spatial, sections)
    if return_lse:
        return o, out[1]
    return o


def windowed_fa(q, k, v, window_size, *, stride=None, pad=0, scale=None, **kw):
    """Overlapping windowed fused attention — reference ``windowed_fa``
    (src/windowed.jl:3-23): window-extract → batched dense flash kernel →
    fold with coverage averaging. Overlap makes per-window key duplication
    inherent to the semantics, so extraction (an XLA im2col, not a kernel
    gather) is the right TPU layout move; the FLOPs still run through the
    fused kernel. Disjoint windows should use :func:`block_fa` (pure
    block-skip, no copies).
    """
    if kw.get("return_lse"):
        raise NotImplementedError(
            "windowed_fa cannot return lse: per-window statistics are not "
            "meaningful after overlap averaging (reference src/windowed.jl "
            "only reshapes them for the non-overlapping flash variant)"
        )
    nd = q.ndim - 3
    if nd not in (1, 2, 3):
        raise ValueError(f"expected (batch, *spatial(1..3), heads, d), got {q.shape}")
    b, *spatial, h, d = q.shape
    dv = v.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    def to_patches(x):
        xdim = x.shape[-1]
        flat = x.reshape(b, *spatial, h * xdim)
        pw = window(flat, window_size, stride=stride, pad=pad)
        nwin, wlen = pw.shape[1], pw.shape[2]
        pw = pw.reshape(b, nwin, wlen, h, xdim)
        return pw.transpose(0, 1, 3, 2, 4).reshape(b * nwin, h, wlen, xdim), nwin, wlen

    qw, nwin, wlen = to_patches(q)
    kw_, _, _ = to_patches(k)
    vw, _, _ = to_patches(v)
    ow = flash_attention(qw, kw_, vw, schedule="dense", scale=scale, **kw)
    ow = ow.reshape(b, nwin, h, wlen, dv).transpose(0, 1, 3, 2, 4).reshape(
        b, nwin, wlen, h * dv
    )
    folded = unwindow(ow.astype(jnp.float32), spatial, window_size, stride=stride, pad=pad)
    counts = window_counts(spatial, window_size, stride=stride, pad=pad)
    out = jnp.where(counts > 0, folded / jnp.maximum(counts, 1), 0)
    return out.reshape(b, *spatial, h, dv).astype(q.dtype)
