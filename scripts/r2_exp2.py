"""Round-2 experiment 2: transposed flash kernel for d=64 (VERDICT item 2).

The standard kernel's PV dot (bq,bkv)@(bkv,dv) writes dv=64 output lanes —
half the MXU. The transposed variant keeps scores K-major:

    s_t (bkv, bq) = K (bkv,d) ·NT· Q (bq,d)      — native NT dot
    softmax over the SUBLANE axis (per-q stats are lane vectors)
    acc_t (dv, bq) += V^T (dv,bkv) @ p_t (bkv,bq) — plain NN dot, full lanes

V^T / O^T conversions happen outside the kernel (two cheap XLA transposes
over d*n arrays). QK^T keeps its k=d=64 contraction either way (hard 50%
MXU floor); PV goes from half lanes to full, lifting the ceiling from
~1/2 to ~2/3 of peak.

Usage: python scripts/r2_exp2.py [T|all]
"""

import functools
import json
import math
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import dense_fa, LOG2E
from tpu_flash.ops.oracle import dense_dpa

LOG = open("/root/repo/logs/r2_exp2.jsonl", "a")
NEG = -0.7 * float(np.finfo(np.float32).max)
_NT = (((1,), (1,)), ((), ()))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


def _t_kernel(q_ref, k_ref, vt_ref, ot_ref, m_scr, l_scr, acc_scr, *,
              num_steps):
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    st = lax.dot_general(
        k_ref[0], q_ref[0], _NT, preferred_element_type=jnp.float32
    )  # (bkv, bq)
    m_prev = m_scr[:1]
    l_prev = l_scr[:1]
    m_curr = jnp.max(st, axis=0, keepdims=True)  # (1, bq)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(st - m_next)
    l_scr[:1] = alpha * l_prev + jnp.sum(p, axis=0, keepdims=True)
    m_scr[:1] = m_next
    pv = lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (dv, bq)
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(s == num_steps - 1)
    def _fin():
        l = l_scr[:1]
        ot_ref[0] = (
            acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
        ).astype(ot_ref.dtype)


def dense_fa_t(q, k, v, *, block_q=1024, block_kv=1024):
    """Transposed-layout dense flash fwd for small head dims."""
    b, h, n, d = q.shape
    dv = v.shape[-1]
    scale = (1.0 / math.sqrt(d)) * LOG2E
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vt = v.reshape(b * h, n, dv).transpose(0, 2, 1)  # (bh, dv, n)
    grid = (b * h, n // block_q, n // block_kv)
    ot = pl.pallas_call(
        functools.partial(_t_kernel, num_steps=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, i, s: (bb, s, 0)),
            pl.BlockSpec((1, dv, block_kv), lambda bb, i, s: (bb, 0, s)),
        ],
        out_specs=pl.BlockSpec((1, dv, block_q), lambda bb, i, s: (bb, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, dv, n), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((dv, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vt)
    return ot.transpose(0, 2, 1).reshape(b, h, n, dv)


def mk(b, h, n, d, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    return tuple(
        jnp.asarray(rng.standard_normal((b, h, n, d)), dtype)
        for _ in range(3)
    )


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    b, h, n = 4, 8, 8192

    if which in ("all", "T"):
        log("=== T: transposed kernel d=64 @8k ===")
        for d in (64, 128):
            q, k, v = mk(b, h, n, d)
            fl = attention_flops(b, h, n, n, d)

            # correctness gate on a small slice first
            qs, ks, vs = q[:1, :1, :2048], k[:1, :1, :2048], v[:1, :1, :2048]
            got = dense_fa_t(qs, ks, vs, block_q=512, block_kv=512)
            want, _ = dense_dpa(qs, ks, vs)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32))))
            row(tag=f"T.check.d{d}", err=round(err, 5))
            assert err < 2e-2, err

            for bq, bkv in [(1024, 1024), (1024, 2048), (2048, 1024),
                            (2048, 512), (512, 2048)]:
                fn = jax.jit(functools.partial(
                    dense_fa_t, block_q=bq, block_kv=bkv))
                try:
                    t = time_fn(fn, q, k, v, iters=10)
                except Exception as e:  # noqa: BLE001
                    row(tag=f"T.d{d}.bq{bq}.bkv{bkv}", error=str(e)[:100])
                    continue
                row(tag=f"T.d{d}.bq{bq}.bkv{bkv}", ms=round(t * 1e3, 3),
                    tflops=round(fl / t / 1e12, 2))

            # control: current kernel
            fn = jax.jit(functools.partial(
                dense_fa, block_q=1024, block_kv=2048))
            t = time_fn(fn, q, k, v, iters=10)
            row(tag=f"T.control.d{d}.bq1024.bkv2048", ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2))


if __name__ == "__main__":
    main()


# ---------------------------------------------------------------- T2: decompose
def _qk_only_kernel(q_ref, k_ref, o_ref, acc_scr, *, num_steps):
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    st = lax.dot_general(
        k_ref[0], q_ref[0], _NT, preferred_element_type=jnp.float32
    )
    acc_scr[...] += st[:8, :]

    @pl.when(s == num_steps - 1)
    def _fin():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def qk_only(q, k, *, block_q=2048, block_kv=1024):
    b, h, n, d = q.shape
    qf = q.reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    grid = (b * h, n // block_q, n // block_kv)
    out = pl.pallas_call(
        functools.partial(_qk_only_kernel, num_steps=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, i, s: (bb, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, 8, block_q), lambda bb, i, s: (bb, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, 8, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, block_q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf)
    return out


def _pv_only_kernel(p_ref, vt_ref, o_ref, acc_scr, *, num_steps):
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    pv = lax.dot_general(
        vt_ref[0], p_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] += pv

    @pl.when(s == num_steps - 1)
    def _fin():
        o_ref[0] = acc_scr[...].astype(o_ref.dtype)


def pv_only_t(p, vt, *, block_q=2048, block_kv=1024):
    bh, n, nq = p.shape[0], p.shape[1], p.shape[2]
    dv = vt.shape[1]
    grid = (bh, nq // block_q, n // block_kv)
    out = pl.pallas_call(
        functools.partial(_pv_only_kernel, num_steps=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_kv, block_q), lambda bb, i, s: (bb, s, i)),
            pl.BlockSpec((1, dv, block_kv), lambda bb, i, s: (bb, 0, s)),
        ],
        out_specs=pl.BlockSpec((1, dv, block_q), lambda bb, i, s: (bb, 0, i)),
        out_shape=jax.ShapeDtypeStruct((bh, dv, nq), jnp.float32),
        scratch_shapes=[pltpu.VMEM((dv, block_q), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(p, vt)
    return out


def _t_kernel_mxusum(q_ref, k_ref, vt_ref, ot_ref, m_scr, l_scr, acc_scr, *,
                     num_steps):
    """Transposed kernel, l-sum via an MXU ones-row dot instead of a VPU
    sublane reduction."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    st = lax.dot_general(
        k_ref[0], q_ref[0], _NT, preferred_element_type=jnp.float32
    )
    m_prev = m_scr[:1]
    l_prev = l_scr[:1]
    m_curr = jnp.max(st, axis=0, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(st - m_next).astype(vt_ref.dtype)
    # fused PV + l-sum: append a ones row to V^T so the MXU computes
    # [acc; l] in one dot — the sublane sum rides the same pass.
    pv = lax.dot_general(
        vt_ref[0], p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ones = jnp.ones((1, p.shape[0]), vt_ref.dtype)
    lsum = lax.dot_general(
        ones, p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    l_scr[:1] = alpha * l_prev + lsum
    m_scr[:1] = m_next
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(s == num_steps - 1)
    def _fin():
        l = l_scr[:1]
        ot_ref[0] = (
            acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
        ).astype(ot_ref.dtype)


def _t_kernel_nomax(q_ref, k_ref, vt_ref, ot_ref, l_scr, acc_scr, *,
                    num_steps):
    """UNSAFE variant: fixed m=0 — isolates the running-max cost."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    st = lax.dot_general(
        k_ref[0], q_ref[0], _NT, preferred_element_type=jnp.float32
    )
    p = jnp.exp2(st)
    l_scr[:1] = l_scr[:1] + jnp.sum(p, axis=0, keepdims=True)
    pv = lax.dot_general(
        vt_ref[0], p.astype(vt_ref.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] + pv

    @pl.when(s == num_steps - 1)
    def _fin():
        l = l_scr[:1]
        ot_ref[0] = (
            acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
        ).astype(ot_ref.dtype)


def dense_fa_t_var(q, k, v, kernel, nscr, *, block_q=2048, block_kv=1024):
    b, h, n, d = q.shape
    dv = v.shape[-1]
    scale = (1.0 / math.sqrt(d)) * LOG2E
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype).reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vt = v.reshape(b * h, n, dv).transpose(0, 2, 1)
    grid = (b * h, n // block_q, n // block_kv)
    scr = [pltpu.VMEM((8, block_q), jnp.float32) for _ in range(nscr)]
    scr.append(pltpu.VMEM((dv, block_q), jnp.float32))
    ot = pl.pallas_call(
        functools.partial(kernel, num_steps=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, i, s: (bb, s, 0)),
            pl.BlockSpec((1, dv, block_kv), lambda bb, i, s: (bb, 0, s)),
        ],
        out_specs=pl.BlockSpec((1, dv, block_q), lambda bb, i, s: (bb, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, dv, n), q.dtype),
        scratch_shapes=scr,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qf, kf, vt)
    return ot.transpose(0, 2, 1).reshape(b, h, n, dv)


def t2():
    b, h, n, d = 4, 8, 8192, 64
    q, k, v = mk(b, h, n, d)
    fl = attention_flops(b, h, n, n, d)
    half = fl // 2
    log("=== T2: decomposition d=64 @8k ===")

    fn = jax.jit(qk_only)
    t = time_fn(fn, q, k, iters=10)
    row(tag="T2.qk_only.d64", ms=round(t * 1e3, 3),
        tflops=round(half / t / 1e12, 2))

    for dd in (128,):
        q2, k2, _ = mk(b, h, n, dd)
        fl2 = attention_flops(b, h, n, n, dd) // 2
        t = time_fn(jax.jit(qk_only), q2, k2, iters=10)
        row(tag=f"T2.qk_only.d{dd}", ms=round(t * 1e3, 3),
            tflops=round(fl2 / t / 1e12, 2))

    rngl = np.random.default_rng(3)
    p = jnp.asarray(rngl.standard_normal((b * h, n, n // 4)), jnp.bfloat16)
    vt = jnp.asarray(rngl.standard_normal((b * h, d, n)), jnp.bfloat16)
    flpv = 2 * b * h * n * (n // 4) * d
    t = time_fn(jax.jit(pv_only_t), p, vt, iters=10)
    row(tag="T2.pv_only_t.d64", ms=round(t * 1e3, 3),
        tflops=round(flpv / t / 1e12, 2))

    got = dense_fa_t_var(q[:1, :1, :2048], k[:1, :1, :2048], v[:1, :1, :2048],
                         _t_kernel_mxusum, 2, block_q=512, block_kv=512)
    want, _ = dense_dpa(q[:1, :1, :2048], k[:1, :1, :2048], v[:1, :1, :2048])
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    row(tag="T2.check.mxusum", err=round(err, 5))

    for bq, bkv in [(2048, 1024), (1024, 2048), (2048, 512)]:
        fn = jax.jit(functools.partial(
            dense_fa_t_var, kernel=_t_kernel_mxusum, nscr=2,
            block_q=bq, block_kv=bkv))
        t = time_fn(fn, q, k, v, iters=10)
        row(tag=f"T2.mxusum.bq{bq}.bkv{bkv}", ms=round(t * 1e3, 3),
            tflops=round(fl / t / 1e12, 2))

    fn = jax.jit(functools.partial(
        dense_fa_t_var, kernel=_t_kernel_nomax, nscr=1,
        block_q=2048, block_kv=1024))
    t = time_fn(fn, q, k, v, iters=10)
    row(tag="T2.nomax.bq2048.bkv1024", ms=round(t * 1e3, 3),
        tflops=round(fl / t / 1e12, 2))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "T2":
    t2()


# ------------------------------------------------- T3: bound-max + fused-l
def _t3_kernel(qn_ref, kn_ref, q_ref, k_ref, vte_ref, ot_ref, m_scr,
               acc_scr, *, num_steps):
    """Transposed kernel, norm-bound max (no score-tile max pass) and the
    l-sum fused into the PV dot as a ones row of V^T."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    st = lax.dot_general(
        k_ref[0], q_ref[0], _NT, preferred_element_type=jnp.float32
    )  # (bkv, bq)
    kmax = jnp.max(kn_ref[0][:1])          # scalar: max ||k|| in this block
    mhat = qn_ref[0][:1] * kmax            # (1, bq) upper bound on scores
    m_prev = m_scr[:1]
    m_next = jnp.maximum(m_prev, mhat)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(st - m_next).astype(vte_ref.dtype)
    pv = lax.dot_general(
        vte_ref[0], p, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (dv+1, bq): last row is the l-sum
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[:1] = m_next

    @pl.when(s == num_steps - 1)
    def _fin():
        dv = acc_scr.shape[0] - 1
        l = acc_scr[dv:, :]
        ot_ref[0] = (
            acc_scr[:dv] / jnp.where(l > 0.0, l, 1.0)
        ).astype(ot_ref.dtype)


def dense_fa_t3(q, k, v, *, block_q=2048, block_kv=1024):
    b, h, n, d = q.shape
    dv = v.shape[-1]
    scale = (1.0 / math.sqrt(d)) * LOG2E
    qs = q.astype(jnp.float32) * scale
    qn = jnp.sqrt(jnp.sum(qs * qs, axis=-1))            # (b,h,n) base-2 norms
    qn = jnp.broadcast_to(
        qn.reshape(b * h, 1, n), (b * h, 8, n))
    kn = jnp.sqrt(jnp.sum(
        k.astype(jnp.float32) ** 2, axis=-1)).reshape(b * h, 1, n)
    kn = jnp.broadcast_to(kn, (b * h, 8, n))
    qf = qs.astype(q.dtype).reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vt = v.reshape(b * h, n, dv).transpose(0, 2, 1)
    vte = jnp.concatenate(
        [vt, jnp.ones((b * h, 1, n), v.dtype)], axis=1)  # (bh, dv+1, n)
    grid = (b * h, n // block_q, n // block_kv)
    ot = pl.pallas_call(
        functools.partial(_t3_kernel, num_steps=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 8, block_q), lambda bb, i, s: (bb, 0, i)),
            pl.BlockSpec((1, 8, block_kv), lambda bb, i, s: (bb, 0, s)),
            pl.BlockSpec((1, block_q, d), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, i, s: (bb, s, 0)),
            pl.BlockSpec((1, dv + 1, block_kv), lambda bb, i, s: (bb, 0, s)),
        ],
        out_specs=pl.BlockSpec((1, dv, block_q), lambda bb, i, s: (bb, 0, i)),
        out_shape=jax.ShapeDtypeStruct((b * h, dv, n), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((dv + 1, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qn, kn, qf, kf, vte)
    return ot.transpose(0, 2, 1).reshape(b, h, n, dv)


def _std_boundmax_kernel(qn_ref, kn_ref, q_ref, k_ref, v_ref, o_ref,
                         m_scr, l_scr, acc_scr, *, num_steps):
    """Standard-orientation kernel with the norm-bound max (no score max
    pass); l stays a VPU lane reduction."""
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    sij = lax.dot_general(
        q_ref[0], k_ref[0], _NT, preferred_element_type=jnp.float32
    )  # (bq, bkv)
    kmax = jnp.max(kn_ref[0][:1])
    mhat = qn_ref[0][:, :1] * kmax         # (bq, 1)
    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_next = jnp.maximum(m_prev, mhat)
    alpha = jnp.exp2(m_prev - m_next)
    p = jnp.exp2(sij - m_next)
    l_scr[:, :1] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:, :1] = m_next
    pv = lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(s == num_steps - 1)
    def _fin():
        l = l_scr[:, :1]
        o_ref[0] = (
            acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
        ).astype(o_ref.dtype)


def dense_fa_std_bm(q, k, v, *, block_q=1024, block_kv=2048):
    b, h, n, d = q.shape
    dv = v.shape[-1]
    scale = (1.0 / math.sqrt(d)) * LOG2E
    qs = q.astype(jnp.float32) * scale
    qn = jnp.sqrt(jnp.sum(qs * qs, axis=-1))
    qn = jnp.broadcast_to(
        qn.reshape(b * h, n, 1), (b * h, n, _128_))
    kn = jnp.sqrt(jnp.sum(
        k.astype(jnp.float32) ** 2, axis=-1)).reshape(b * h, 1, n)
    kn = jnp.broadcast_to(kn, (b * h, 8, n))
    qf = qs.astype(q.dtype).reshape(b * h, n, d)
    kf = k.reshape(b * h, n, d)
    vf = v.reshape(b * h, n, dv)
    grid = (b * h, n // block_q, n // block_kv)
    o = pl.pallas_call(
        functools.partial(_std_boundmax_kernel, num_steps=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, _128_), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, 8, block_kv), lambda bb, i, s: (bb, 0, s)),
            pl.BlockSpec((1, block_q, d), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, i, s: (bb, s, 0)),
            pl.BlockSpec((1, block_kv, dv), lambda bb, i, s: (bb, s, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda bb, i, s: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, _128_), jnp.float32),
            pltpu.VMEM((block_q, _128_), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qn, kn, qf, kf, vf)
    return o.reshape(b, h, n, dv)


_128_ = 128


def t3():
    b, h, n = 4, 8, 8192
    log("=== T3: bound-max variants ===")

    # transposed fused-l bound-max, d=64
    d = 64
    q, k, v = mk(b, h, n, d)
    fl = attention_flops(b, h, n, n, d)
    qs, ks, vs = q[:1, :1, :2048], k[:1, :1, :2048], v[:1, :1, :2048]
    got = dense_fa_t3(qs, ks, vs, block_q=512, block_kv=512)
    want, _ = dense_dpa(qs, ks, vs)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    row(tag="T3.check.t3.d64", err=round(err, 5))
    for bq, bkv in [(2048, 1024), (2048, 512), (1024, 1024), (1024, 2048)]:
        fn = jax.jit(functools.partial(dense_fa_t3, block_q=bq, block_kv=bkv))
        try:
            t = time_fn(fn, q, k, v, iters=10)
        except Exception as e:  # noqa: BLE001
            row(tag=f"T3.t.d64.bq{bq}.bkv{bkv}", error=str(e)[:100])
            continue
        row(tag=f"T3.t.d64.bq{bq}.bkv{bkv}", ms=round(t * 1e3, 3),
            tflops=round(fl / t / 1e12, 2))

    # standard bound-max, d=128 and d=64
    for d in (128, 64):
        q, k, v = mk(b, h, n, d)
        fl = attention_flops(b, h, n, n, d)
        qs, ks, vs = q[:1, :1, :2048], k[:1, :1, :2048], v[:1, :1, :2048]
        got = dense_fa_std_bm(qs, ks, vs, block_q=512, block_kv=512)
        want, _ = dense_dpa(qs, ks, vs)
        err = float(jnp.max(jnp.abs(
            got.astype(jnp.float32) - want.astype(jnp.float32))))
        row(tag=f"T3.check.std.d{d}", err=round(err, 5))
        for bq, bkv in [(1024, 2048), (2048, 1024)]:
            fn = jax.jit(functools.partial(
                dense_fa_std_bm, block_q=bq, block_kv=bkv))
            try:
                t = time_fn(fn, q, k, v, iters=10)
            except Exception as e:  # noqa: BLE001
                row(tag=f"T3.std.d{d}.bq{bq}.bkv{bkv}", error=str(e)[:100])
                continue
            row(tag=f"T3.std.d{d}.bq{bq}.bkv{bkv}", ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2))


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "T3":
    t3()
