"""Quantized flash-attention forward kernels (FP8 / INT8, in-register dequant).

Extends the schedule-parameterized kernel (ops/flash.py) with the north-star
quantized paths:

* **activation-quant** (``q_dtype`` set): QKᵀ runs natively on the MXU in
  int8→int32 or fp8→f32; the per-token scales dequantize the score matrix
  *after* the matmul (``s_ij = (q̂·k̂)·σq_i·σk_j``) — no per-element dequant
  in the inner loop.
* **weight-only** (``q_dtype=None``): Q stays bf16; K is dequantized
  in-register (int8→bf16 convert, scale applied to the score columns), the
  KV-cache-compression mode.
* V is always per-channel quantized (``axis=-2``) so its dequant collapses
  to one per-channel multiply of the final accumulator.

The softmax scale (1/√d) is folded into Q before quantization, so the only
in-loop scalar work is the two score-scale multiplies.

Error contract (BASELINE.md): ≤1e-2 max-abs vs the f32 oracle evaluated on
the *dequantized* inputs (matched bit-width) — tested in tests/test_quant.py.
Backward is intentionally not defined (inference path); take gradients
through the unquantized kernels.
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
from tpu_flash.ops.schedule import (
    BlockDiagonalSchedule,
    CausalSchedule,
    CirculantSchedule,
    LocalSchedule,
    Schedule,
)
from tpu_flash.quant.qarray import QArray, quantize

_F8 = (jnp.dtype(jnp.float8_e4m3fn), jnp.dtype(jnp.float8_e5m2))


def _fp8_upcast_exact(x: jnp.ndarray) -> jnp.ndarray:
    """Exact fp8 → bf16 via integer bit manipulation (with the subnormal
    branch). Bit-exact against ``astype(float32)`` on all 256 byte values
    except the NaN encodings, which the quantizer never emits. Used by the
    paged-cache read path; the attention inner loops use the branch-free
    :func:`_fp8_upcast`."""
    dt = jnp.dtype(x.dtype)
    if dt == jnp.dtype(jnp.float8_e4m3fn):
        shift, bias_add, sub_lim, sub_scale = 4, 120 << 7, 8, 2.0 ** -9
    elif dt == jnp.dtype(jnp.float8_e5m2):
        shift, bias_add, sub_lim, sub_scale = 5, 112 << 7, 4, 2.0 ** -16
    else:
        raise ValueError(f"not an fp8 dtype: {dt}")
    b = lax.bitcast_convert_type(x, jnp.int8).astype(jnp.int32) & 0xFF
    em = b & 0x7F
    mag_n = lax.bitcast_convert_type(
        ((em << shift) + bias_add).astype(jnp.int16), jnp.bfloat16
    )
    mag_s = em.astype(jnp.bfloat16) * jnp.bfloat16(sub_scale)
    mag = jnp.where(em < sub_lim, mag_s, mag_n)
    return jnp.where(b >= 128, -mag, mag)


def _fp8_upcast(x: jnp.ndarray) -> jnp.ndarray:
    """Branch-free fp8 → bf16 bit map for the kernel hot loops.

    v5e has no fp8 MXU and Mosaic's fp8 dot lowering runs the QKᵀ at less
    than half the bf16 rate (measured 83 vs 160 TFLOP/s end-to-end);
    ``astype(bf16)`` lowers even slower. This builds the bf16 bits in one
    integer expression — sign bit relocated by shift, exponent/mantissa
    field shifted into place plus the exponent-bias delta (e4m3: 127−7;
    e5m2: 127−15) — with NO selects: 8 VPU int ops total vs ~13 for the
    exact version (`_fp8_upcast_exact`). fp8 *subnormals* (exponent bits
    0, magnitudes < 2⁻⁶ for e4m3) decode approximately, to
    2^(1−bias)·(1 + m/2^mbits) instead of m·2^(1−bias−mbits): an absolute
    error < 2⁻⁶, i.e. ≤ 3.5e-5 of the per-tensor amax after max-abs
    scaling — three orders of magnitude inside e4m3's ~6% grid step, and
    far inside the ≤1e-2 quantization-error contract (BASELINE.md).
    NaN encodings are never emitted by the quantizer (it clips).
    """
    dt = jnp.dtype(x.dtype)
    if dt == jnp.dtype(jnp.float8_e4m3fn):
        shift, bias_add = 4, 120 << 7
    elif dt == jnp.dtype(jnp.float8_e5m2):
        shift, bias_add = 5, 112 << 7
    else:
        raise ValueError(f"not an fp8 dtype: {dt}")
    b = lax.bitcast_convert_type(x, jnp.int8).astype(jnp.int32) & 0xFF
    bits = ((b & 0x80) << 8) | (((b & 0x7F) << shift) + bias_add)
    return lax.bitcast_convert_type(bits.astype(jnp.int16), jnp.bfloat16)


def scaled_k_norms(k_vals: jnp.ndarray, sk_row=None) -> jnp.ndarray:
    """Per-token ‖K̂‖·σ_k lane vector for the norm-bound max (DESIGN §10-11).

    fp8 is decoded with the SAME approximate upcast the kernel dots use
    (:func:`_fp8_upcast`) so the Cauchy–Schwarz bound holds for the values
    actually dotted — the exact decode yields smaller subnormal magnitudes
    and could under-bound. ``k_vals``: (bh_kv, n, d) int8/fp8/float;
    ``sk_row``: optional (bh_kv, n) per-token scales. Returns (bh_kv, n)
    f32. Shared by flash_q and serving_attn so the preamble cannot drift
    from the kernels.
    """
    kf32 = (_fp8_upcast(k_vals) if jnp.dtype(k_vals.dtype) in _F8
            else k_vals).astype(jnp.float32)
    kn = jnp.sqrt(jnp.sum(kf32 * kf32, axis=-1))
    if sk_row is not None:
        kn = kn * sk_row
    return kn


def _to_bf16(x: jnp.ndarray) -> jnp.ndarray:
    if jnp.dtype(x.dtype) in _F8:
        return _fp8_upcast(x)
    return x.astype(jnp.bfloat16)


def _q_fwd_kernel(
    *refs,
    sched: Schedule,
    num_steps: int,
    q_quant: bool,
    v_quant: bool,
    k_scaled: bool,
    need_lse: bool = True,
    bound_max: bool = False,
):
    if bound_max:
        gk_ref, *refs = refs  # (1, 1, 1) global scaled-K̂-norm max
    else:
        gk_ref = None
    if q_quant:
        (q_ref, k_ref, v_ref, sq_ref, sk_ref, *rest) = refs
    elif k_scaled:
        (q_ref, k_ref, v_ref, sk_ref, *rest) = refs
        sq_ref = None
    else:
        # per-tensor K scale, pre-folded into Q outside the kernel: the
        # score matrix needs NO dequant work at all (fp8 fast path)
        (q_ref, k_ref, v_ref, *rest) = refs
        sq_ref = sk_ref = None
    if v_quant:
        (sv_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr, *scr) = rest
    else:
        (o_ref, lse_ref, m_scr, l_scr, acc_scr, *scr) = rest
        sv_ref = None

    i = pl.program_id(1)
    s = pl.program_id(2)
    bq, bkv = sched.block_q, sched.block_kv

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, DEFAULT_MASK_VALUE)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if bound_max:
            # CONSTANT Cauchy-Schwarz bound m = ‖q̂_i‖·max_ALL_j‖k̂_j·σ‖:
            # set once per (b, i) — alpha ≡ 1, so the per-step max AND
            # rescale chains vanish (the §24 serving upgrade applied
            # here too).
            qop = q_ref[0].astype(jnp.float32)
            qb = jnp.sqrt(jnp.sum(qop * qop, axis=-1, keepdims=True))
            if q_quant:
                # int8 Q: the per-row dequant scale (log2e folded in, see
                # _step) rides the bound. fp8 Q never reaches q_quant — it
                # is dequantized host-side into q_raw (weight-only path).
                qb = qb * (jnp.expand_dims(sq_ref[0, 0], -1) * LOG2E)
            m_scr[...] = jnp.broadcast_to(
                qb * (gk_ref[0, 0, 0] * 1.0001), m_scr.shape)

    @pl.when(sched.step_needed(i, s))
    def _step():
        k = k_ref[0]
        sk_row = sk_ref[0, 0].reshape(1, bkv) if k_scaled else None
        if q_quant:
            # Low-bit dot; dequant on the score matrix. int8 runs the MXU's
            # native int8→int32 path; fp8 values are upcast to bf16 with the
            # bit-trick (`_fp8_upcast`) and dotted at the full bf16 MXU rate
            # — on v5e this beats Mosaic's fp8 lowering ~1.7× end-to-end.
            if k.dtype == jnp.int8:
                raw = lax.dot_general(
                    q_ref[0], k, _NT_DIMS, preferred_element_type=jnp.int32
                ).astype(jnp.float32)
            else:
                raw = lax.dot_general(
                    _fp8_upcast(q_ref[0]), _fp8_upcast(k), _NT_DIMS,
                    preferred_element_type=jnp.float32,
                )
            # log2(e) rides the per-row dequant scale: the hot exp below
            # becomes a bare exp2 with no extra elementwise work.
            sq_col = jnp.expand_dims(sq_ref[0, 0], -1) * LOG2E  # (bq, 1)
            sij = raw * sq_col * sk_row
        else:
            # Weight-only: dequant K to bf16 in-register, scale columns
            # (or not at all when the per-tensor K scale rides in Q).
            kf = _to_bf16(k).astype(q_ref.dtype)
            raw = lax.dot_general(
                q_ref[0], kf, _NT_DIMS, preferred_element_type=jnp.float32
            )
            sij = raw * sk_row if k_scaled else raw

        def _apply_mask(sij):
            kv_idx = sched.kv_block_index(i, s)
            q_pos = i * bq + lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
            k_pos = kv_idx * bkv + lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
            mask = sched.mask(q_pos, k_pos)
            if mask is not None:
                sij = jnp.where(mask, sij, DEFAULT_MASK_VALUE)
            return sij

        def _update(sij):
            m_prev = m_scr[:, :1]
            l_prev = l_scr[:, :1]
            if bound_max:
                # constant bound set at init: no max, alpha ≡ 1
                p = jnp.exp2(sij - m_prev)
                l_next = l_prev + jnp.sum(p, axis=-1, keepdims=True)
            else:
                m_curr = jnp.max(sij, axis=-1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp2(m_prev - m_next)
                p = jnp.exp2(sij - m_next)
                l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
                m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
            l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)

            v = v_ref[0]
            vf = _to_bf16(v) if v_quant else v
            pv = lax.dot_general(
                p.astype(jnp.bfloat16),
                vf,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_scr[...] = (acc_scr[...] + pv if bound_max
                            else acc_scr[...] * alpha + pv)

        unm = sched.block_unmasked(i, s) if sched.has_mask else None
        if not sched.has_mask or unm is True:
            _update(sij)
        elif unm is None:
            _update(_apply_mask(sij))
        else:
            # interior-block fast path — see ops/flash.py _fwd_kernel
            @pl.when(unm)
            def _unmasked():
                _update(sij)

            @pl.when(jnp.logical_not(unm))
            def _masked():
                _update(_apply_mask(sij))

    @pl.when(s == num_steps - 1)
    def _finish():
        l = l_scr[:, :1]
        m = m_scr[:, :1]
        # fully-masked rows (see ops/flash.py): o = 0, lse = -inf
        valid = (l > 0.0) & (m > DEFAULT_MASK_VALUE * 0.5)
        l_inv = jnp.where(valid, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        acc = acc_scr[...] * l_inv
        if v_quant:
            sv_row = sv_ref[0, 0].reshape(1, -1)  # per-channel (1, dv)
            acc = acc * sv_row
        o_ref[0] = acc.astype(o_ref.dtype)
        if need_lse:
            # skipped when discarded — see ops/flash.py _fwd_kernel
            lse = jnp.where(
                valid, m * LN2 + jnp.log(jnp.where(l > 0.0, l, 1.0)), -jnp.inf
            )
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _quantized_fwd(
    qq: Optional[QArray],
    q_raw: Optional[jnp.ndarray],
    kq: QArray,
    vq,  # QArray or raw array
    sched: Schedule,
    *,
    interpret: bool,
    out_dtype,
    hq: int = 1,
    hkv: int = 1,
    k_scaled: bool = True,
    need_lse: bool = True,
    bound_max: bool = True,
):
    q_quant = qq is not None
    v_quant = isinstance(vq, QArray)
    q_vals = qq.values if q_quant else q_raw
    bh, nq_pad, d = q_vals.shape
    v_vals = vq.values if v_quant else vq
    dv = v_vals.shape[-1]
    bq, bkv = sched.block_q, sched.block_kv
    grid = (bh, sched.num_q_blocks, sched.max_kv_steps)
    num_steps = sched.max_kv_steps
    g = hq // hkv

    def kv_row(b):
        # GQA as in ops/flash.py: kv rows read through an index map
        if g == 1:
            return b
        return (b // hq) * hkv + (b % hq) // g

    kv_map = lambda b, i, s, _s=sched: (kv_row(b), _s.kv_block_index(i, s), 0)
    kv_scale_map = lambda b, i, s, _s=sched: (
        kv_row(b), 0, _s.kv_block_index(i, s))
    bh_kv = kq.values.shape[0]
    nkv_pad = kq.values.shape[1]

    in_specs = []
    inputs = []
    if bound_max:
        # CONSTANT norm-bound max (DESIGN.md §10-11, §24): the global
        # max of the per-token scaled-K̂ norms per kv row, one scalar —
        # m is set once per q block and the per-step max/rescale chain
        # vanishes.
        kn = scaled_k_norms(
            kq.values,
            kq.scales.reshape(bh_kv, nkv_pad) if k_scaled else None)
        inputs.append(jnp.max(kn, axis=-1).reshape(bh_kv, 1, 1))
        in_specs.append(pl.BlockSpec(
            (1, 1, 1), lambda b, i, s: (kv_row(b), 0, 0)))
    in_specs += [
        pl.BlockSpec((1, bq, d), lambda b, i, s: (b, i, 0)),
        pl.BlockSpec((1, bkv, d), kv_map),
        pl.BlockSpec((1, bkv, dv), kv_map),
    ]
    inputs += [q_vals, kq.values, v_vals]
    if q_quant:
        in_specs.append(pl.BlockSpec((1, 1, bq), lambda b, i, s: (b, 0, i)))
        inputs.append(qq.scales.reshape(bh, 1, nq_pad))
    if k_scaled:
        in_specs.append(pl.BlockSpec((1, 1, bkv), kv_scale_map))
        inputs.append(kq.scales.reshape(bh_kv, 1, -1))
    if v_quant:
        in_specs.append(pl.BlockSpec(
            (1, 1, dv), lambda b, i, s: (kv_row(b), 0, 0)))
        inputs.append(vq.scales.reshape(bh_kv, 1, dv))

    kernel = functools.partial(
        _q_fwd_kernel,
        sched=sched,
        num_steps=num_steps,
        q_quant=q_quant,
        v_quant=v_quant,
        k_scaled=k_scaled,
        need_lse=need_lse,
        bound_max=bound_max,
    )
    if need_lse:
        lse_spec = pl.BlockSpec((1, bq, _LANES), lambda b, i, s: (b, i, 0))
        lse_shape = jax.ShapeDtypeStruct((bh, nq_pad, _LANES), jnp.float32)
    else:
        lse_spec = pl.BlockSpec((1, 1, _LANES), lambda b, i, s: (b, 0, 0))
        lse_shape = jax.ShapeDtypeStruct((bh, 1, _LANES), jnp.float32)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bq, dv), lambda b, i, s: (b, i, 0)),
            lse_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq_pad, dv), out_dtype),
            lse_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, _LANES), jnp.float32),
            pltpu.VMEM((bq, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*inputs)
    if not need_lse:
        return o, jnp.zeros((bh, nq_pad), jnp.float32)
    return o, lse[..., 0]


def _pad_scales(s: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    # (BH, n, 1) per-token scales → padded with ones (masked anyway).
    n = s.shape[1]
    if n == n_pad:
        return s
    return jnp.pad(s, ((0, 0), (0, n_pad - n), (0, 0)), constant_values=1.0)


def quantized_flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    q_dtype="int8",
    kv_dtype="int8",
    schedule: str = "dense",
    scale: Optional[float] = None,
    radius: int = 0,
    section: int = 0,
    shift: int = 0,
    wrap_n: int = 0,
    shifted_causal: bool = False,
    block_q: int = 1024,
    block_kv: int = 2048,
    kv_scale: str = "token",
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    bound_max: bool = True,
    transposed: Optional[bool] = None,
):
    """Quantize-and-attend on ``(batch, heads, n, d)`` inputs.

    ``bound_max=True`` (default) replaces the per-step score-tile max with
    the Cauchy–Schwarz norm bound (exact online softmax under any upper
    bound — DESIGN.md §10-11); False restores the measured score max.

    ``q_dtype``: int8 / float8_e4m3fn / float8_e5m2, or None for the
    weight-only mode (bf16 Q, quantized K/V). ``kv_dtype``: int8 / fp8.
    ``kv_scale``: K-scale granularity — ``"token"`` (one scale per key,
    dequantized onto the score columns in-kernel) or ``"tensor"`` (one
    scale per (batch, kv-head), the standard fp8 scaling mode, e.g.
    TransformerEngine's delayed scaling). Per-tensor folds the K scale
    into Q before the kernel, so the fp8 score path runs with ZERO
    per-element dequant work — measured ~1.2× on v5e — at slightly
    coarser quantization. fp8-family dtypes only; V stays per-channel
    either way. Remaining arguments as
    :func:`tpu_flash.ops.flash.flash_attention`.
    """
    if q.ndim != 4:
        raise ValueError(f"expected (batch, heads, n, d), got {q.shape}")
    hq, hkv = q.shape[1], k.shape[1]
    if hq % hkv:
        raise ValueError(f"q heads {hq} not a multiple of kv heads {hkv}")
    kv_dtype = jnp.dtype(kv_dtype)
    if q_dtype is not None:
        q_dtype = jnp.dtype(q_dtype)
        if (q_dtype == jnp.int8) != (kv_dtype == jnp.int8):
            raise ValueError(
                f"q_dtype {q_dtype} and kv_dtype {kv_dtype} must share the "
                "MXU input family (both int8, or both fp8)"
            )
    b, h, n_q, d = q.shape
    n_kv = k.shape[2]
    dv = v.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = _interpret_default()

    qf = (q.astype(jnp.float32) * scale).reshape(b * h, n_q, d)
    kf = k.reshape(b * hkv, n_kv, d).astype(jnp.float32)
    vf = v.reshape(b * hkv, n_kv, dv).astype(jnp.float32)

    if schedule == "circulant" and radius > 0:
        kf = jnp.concatenate([kf[:, -radius:], kf, kf[:, :radius]], axis=1)
        vf = jnp.concatenate([vf[:, -radius:], vf, vf[:, :radius]], axis=1)

    sched = build_schedule(
        schedule, n_q, n_kv, block_q, block_kv, radius=radius,
        section=section, shift=shift, wrap_n=wrap_n,
        shifted_causal=shifted_causal,
    )

    if kv_scale not in ("token", "tensor"):
        raise ValueError(f"kv_scale must be 'token' or 'tensor', got {kv_scale!r}")
    k_scaled = kv_scale == "token"
    if not k_scaled and (kv_dtype not in _F8 or
                         (q_dtype is not None and q_dtype not in _F8)):
        raise ValueError(
            "kv_scale='tensor' is the fp8 scaling mode (int8 keeps the "
            "native MXU path with per-token scales)"
        )

    # d ≤ 64: delegate to the transposed serving kernel (K-major scores,
    # ones-row l, full PV output lanes — quant/serving_attn._sv_kernel_t).
    # Identical quantization granularities, so the matched-bitwidth error
    # contract is unchanged; only circulant stays here (its halo-extension
    # handling differs) and e5m2 Q (the serving path quantizes Q to e4m3).
    if transposed is None:
        transposed = (
            d <= 64 and dv <= 64
            and schedule in ("dense", "causal", "local", "local_causal",
                             "block")
            and (q_dtype is None or q_dtype in (
                jnp.dtype(jnp.int8), jnp.dtype(jnp.float8_e4m3fn)))
        )
    if transposed:
        from tpu_flash.quant.serving_attn import serving_flash_attention

        kq4 = quantize(k, kv_dtype, axis=-1 if k_scaled else (-2, -1))
        vq4 = quantize(v, kv_dtype, axis=-2)
        return serving_flash_attention(
            q, kq4, vq4, q_dtype=q_dtype, schedule=schedule, scale=scale,
            radius=radius, section=section, shift=shift, wrap_n=wrap_n,
            shifted_causal=shifted_causal, block_q=block_q,
            block_kv=block_kv, bound_max=bound_max, transposed=True,
            return_lse=return_lse, interpret=interpret,
        )

    # Quantize after halo extension / before padding.
    if k_scaled:
        kq = quantize(kf, kv_dtype, axis=-1)  # per token
    else:
        kq = quantize(kf, kv_dtype, axis=(-2, -1))  # per (batch, kv-head)
    vq = quantize(vf, kv_dtype, axis=-2)  # per channel
    kq = QArray(
        values=_pad_seq(kq.values, sched.n_kv_pad),
        scales=(_pad_scales(kq.scales, sched.n_kv_pad) if k_scaled
                else kq.scales),
        axis=kq.axis,
    )
    v_vals = _pad_seq(vq.values, sched.n_kv_pad)
    vq = QArray(values=v_vals, scales=vq.scales, axis=-2)

    # per-tensor mode: the scalar K scale rides in Q (expanded per q-head
    # under GQA) — the kernel's score path then has no dequant work at all
    if k_scaled:
        sk_in_q = 1.0
    else:
        g = h // hkv
        sk_in_q = jnp.repeat(
            kq.scales.reshape(b, hkv, 1, 1), g, axis=1
        ).reshape(b * h, 1, 1)

    if q_dtype is not None and q_dtype == jnp.int8:
        qq = quantize(qf, q_dtype, axis=-1)
        qq = QArray(
            values=_pad_seq(qq.values, sched.n_q_pad),
            scales=_pad_scales(qq.scales, sched.n_q_pad),
            axis=-1,
        )
        q_raw = None
    elif q_dtype is not None:
        # fp8 Q: quantize onto the fp8 grid, then hand the kernel the
        # DEQUANTIZED bf16 values (scale and log2e folded in). The fp8 dot
        # runs as a bf16 MXU dot either way (no fp8 MXU on v5e, see
        # `_fp8_upcast`), so carrying q̂ into the kernel would only add a
        # per-step upcast plus a per-element score multiply; bf16 holds
        # every e4m3/e5m2 value exactly, and the one bf16 rounding of
        # (q̂·σ_q) is far inside the ≤1e-2 quantization-error contract.
        qv = quantize(qf, q_dtype, axis=-1)
        deq = qv.values.astype(jnp.float32) * qv.scales * (LOG2E * sk_in_q)
        qq = None
        q_raw = _pad_seq(deq.astype(jnp.bfloat16), sched.n_q_pad)
    else:
        qq = None
        q_raw = _pad_seq(
            (qf * (LOG2E * sk_in_q)).astype(jnp.bfloat16), sched.n_q_pad
        )

    o, lse = _quantized_fwd(
        qq, q_raw, kq, vq, sched, interpret=interpret, out_dtype=q.dtype,
        hq=h, hkv=hkv, k_scaled=k_scaled, need_lse=return_lse,
        bound_max=bound_max,
    )
    o = o[:, :n_q].reshape(b, h, n_q, dv)
    if return_lse:
        return o, lse[:, :n_q].reshape(b, h, n_q)
    return o


def quantized_dense_fa(q, k, v, **kw):
    """Dense quantized attention (see :func:`quantized_flash_attention`)."""
    return quantized_flash_attention(q, k, v, schedule="dense", **kw)


# ---------------------------------------------------------------------------
# Pre-quantized entry (ring attention / serving: quantize once, attend often)
# ---------------------------------------------------------------------------


def prepare_ring_operands(q, k, v, *, q_dtype, kv_dtype, scale=None):
    """Quantize a ring shard's operands ONCE before the hop loop.

    Returns ``(q_pre, kq, vq)`` consumable by
    :func:`quantized_flash_attention_prequant` on every hop:

    * ``kq``: per-token K ( axis=-1) — shard-local per-token scales stay
      exact under rotation (a token's scale travels with its values);
    * ``vq``: per-channel V (axis=-2) — scales are per (batch, head,
      channel) of the *shard*, rotated alongside the values;
    * ``q_pre``: int8 → token-scaled ``QArray`` (scores dequantize on the
      MXU output); fp8 → the bf16 dequantized values with softmax scale
      and log2(e) folded in (v5e has no fp8 MXU — see ``_fp8_upcast``);
      ``q_dtype=None`` → weight-only mode (bf16 Q, quantized K/V).

    The hops then rotate fp8/int8 bytes over ICI — half (fp8/int8) the
    bf16 ring traffic, the north-star "quantized ring" mode.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    kv_dtype = jnp.dtype(kv_dtype)
    kq = quantize(k, kv_dtype, axis=-1)
    vq = quantize(v, kv_dtype, axis=-2)
    if q_dtype is None:
        q_pre = (q.astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    else:
        q_dtype = jnp.dtype(q_dtype)
        if (q_dtype == jnp.int8) != (kv_dtype == jnp.int8):
            raise ValueError("q/kv dtypes must share the MXU input family")
        qf = q.astype(jnp.float32) * scale
        if q_dtype == jnp.int8:
            q_pre = quantize(qf, jnp.int8, axis=-1)
        else:
            qv = quantize(qf, q_dtype, axis=-1)
            q_pre = (
                qv.values.astype(jnp.float32) * qv.scales * LOG2E
            ).astype(jnp.bfloat16)
    return q_pre, kq, vq


def quantized_flash_attention_prequant(
    q_pre,
    kq: QArray,
    vq: QArray,
    *,
    schedule: str = "dense",
    radius: int = 0,
    section: int = 0,
    shift: int = 0,
    wrap_n: int = 0,
    shifted_causal: bool = False,
    block_q: int = 1024,
    block_kv: int = 2048,
    out_dtype=jnp.bfloat16,
    return_lse: bool = False,
    interpret: Optional[bool] = None,
    bound_max: bool = True,
):
    """Attend with operands already quantized by
    :func:`prepare_ring_operands` — no per-call quantize preamble.

    ``q_pre``/``kq.values``/``vq.values`` are ``(batch, heads, n, d)``;
    per-token K scales dequantize the score columns in-kernel, per-channel
    V scales the final accumulator. The softmax scale and log2(e) are
    already folded into ``q_pre`` (bf16 modes) or applied via the q-scale
    column (int8 mode). GQA supported (kv heads divide q heads).
    """
    q_vals = q_pre.values if isinstance(q_pre, QArray) else q_pre
    b, h, n_q, d = q_vals.shape
    hkv = kq.values.shape[1]
    if h % hkv:
        raise ValueError(f"q heads {h} not a multiple of kv heads {hkv}")
    n_kv = kq.values.shape[2]
    dv = vq.values.shape[-1]
    if interpret is None:
        interpret = _interpret_default()
    sched = build_schedule(
        schedule, n_q, n_kv, block_q, block_kv, radius=radius,
        section=section, shift=shift, wrap_n=wrap_n,
        shifted_causal=shifted_causal,
    )

    kqp = QArray(
        values=_pad_seq(kq.values.reshape(b * hkv, n_kv, d), sched.n_kv_pad),
        scales=_pad_scales(
            kq.scales.reshape(b * hkv, n_kv, 1), sched.n_kv_pad
        ),
        axis=-1,
    )
    vqp = QArray(
        values=_pad_seq(vq.values.reshape(b * hkv, n_kv, dv), sched.n_kv_pad),
        scales=vq.scales.reshape(b * hkv, 1, dv),
        axis=-2,
    )
    if isinstance(q_pre, QArray):
        qq = QArray(
            values=_pad_seq(
                q_pre.values.reshape(b * h, n_q, d), sched.n_q_pad
            ),
            scales=_pad_scales(
                q_pre.scales.reshape(b * h, n_q, 1), sched.n_q_pad
            ),
            axis=-1,
        )
        q_raw = None
    else:
        qq = None
        q_raw = _pad_seq(q_vals.reshape(b * h, n_q, d), sched.n_q_pad)

    o, lse = _quantized_fwd(
        qq, q_raw, kqp, vqp, sched, interpret=interpret, out_dtype=out_dtype,
        hq=h, hkv=hkv, k_scaled=True, need_lse=return_lse,
        bound_max=bound_max,
    )
    o = o[:, :n_q].reshape(b, h, n_q, dv)
    if return_lse:
        return o, lse[:, :n_q].reshape(b, h, n_q)
    return o
