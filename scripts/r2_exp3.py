"""Round-2 experiment 3: VPU-pass surgery on the int8 serving kernel.

At d=128 the int8 MXU path needs ~2.9 ms of the 7.4 ms wall — the rest is
full-score-tile VPU passes: int32→f32 convert, ·qs, ·sk, max, exp2,
(pv_quant: ·127, round, clip, cast), sum. Variants measured here:

  A. fold-127: p8 = round(exp2(sij - m + log2 127)) — the ×127 becomes an
     exponent shift and CANCELS in acc/l (both carry it), deleting the
     ·127 and ·1/127 passes and the clip (exp2 ≤ 127.0 by construction).
  B. A + f32-preferred QK output (skip the explicit int32→f32 pass if
     Mosaic converts on the MXU copy-out).
  C. A + norm-bound max: m̂ = qs·‖q8‖ · max_j(sk_j·‖k8_j‖), score-tile
     max pass deleted (kn precomputed outside over the int8 cache).

Usage: python scripts/r2_exp3.py
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
from tpu_flash.ops.flash import LOG2E, _NT_DIMS
from tpu_flash.ops.oracle import dense_dpa
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache, serving_flash_attention)

LOG = open("/root/repo/logs/r2_exp3.jsonl", "a")
NEG = -0.7 * float(np.finfo(np.float32).max)
_NN = (((1,), (0,)), ((), ()))
L127 = math.log2(127.0)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


def _proto_kernel(qn_ref, kn_ref, q_ref, k_ref, v_ref, sk_ref, sv_ref,
                  o_ref, m_scr, l_scr, acc_scr, q_scr, qs_scr, *,
                  num_steps, scale, fold127, f32qk, boundmax):
    s = pl.program_id(2)

    @pl.when(s == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, NEG)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        q = q_ref[0].astype(jnp.float32)
        amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
        sq = jnp.maximum(amax, 1e-12) / 127.0
        q_scr[...] = jnp.clip(jnp.round(q / sq), -127, 127).astype(jnp.int8)
        qs_scr[...] = jnp.broadcast_to(
            sq * (scale * LOG2E), qs_scr.shape)

    if f32qk:
        raw = lax.dot_general(
            q_scr[...], k_ref[0], _NT_DIMS,
            preferred_element_type=jnp.float32)
    else:
        raw = lax.dot_general(
            q_scr[...], k_ref[0], _NT_DIMS,
            preferred_element_type=jnp.int32).astype(jnp.float32)
    sij = raw * qs_scr[:, :1] * sk_ref[0, 0].reshape(1, -1)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    if boundmax:
        # qn holds ||q8||2 per row (computed at init would need q8 — pass
        # precomputed bf16-q norms instead; kn = max over block of
        # sk_j * ||k8_j|| precomputed outside, streamed as lane vector)
        kmax = jnp.max(kn_ref[0][:1]) * 1.0001
        m_curr = qs_scr[:, :1] * qn_ref[0][:, :1] * kmax
    else:
        m_curr = jnp.max(sij, axis=-1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev - m_next)
    if fold127:
        ps = jnp.exp2(sij - m_next + L127)  # scaled ×127; cancels in o=acc/l
        p8 = jnp.round(ps).astype(jnp.int8)
        l_next = alpha * l_prev + jnp.sum(ps, axis=-1, keepdims=True)
        pv = lax.dot_general(
            p8, v_ref[0], _NN, preferred_element_type=jnp.int32
        ).astype(jnp.float32)
    else:
        p = jnp.exp2(sij - m_next)
        l_next = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        pv = lax.dot_general(
            p.astype(jnp.bfloat16), v_ref[0].astype(jnp.bfloat16), _NN,
            preferred_element_type=jnp.float32,
        )
    m_scr[...] = jnp.broadcast_to(m_next, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
    acc_scr[...] = acc_scr[...] * alpha + pv

    @pl.when(s == num_steps - 1)
    def _fin():
        l = l_scr[:, :1]
        valid = l > 0.0
        l_inv = jnp.where(valid, 1.0 / jnp.where(valid, l, 1.0), 0.0)
        o_ref[0] = (
            acc_scr[...] * l_inv * sv_ref[0, 0].reshape(1, -1)
        ).astype(o_ref.dtype)


def proto(q, kq, vq, *, block_q=1024, block_kv=2048, fold127=False,
          f32qk=False, boundmax=False):
    b, h, n, d = q.shape
    dv = vq.values.shape[-1]
    bh = b * h
    scale = 1.0 / math.sqrt(d)
    qf = q.reshape(bh, n, d)
    kv = kq.values.reshape(bh, n, d)
    vv = vq.values.reshape(bh, n, dv)
    sk = kq.scales.reshape(bh, 1, n)
    sv = vq.scales.reshape(bh, 1, dv)
    # norms for the bound (outside): q8 norms approximated by
    # 127·||q||/amax ≥ ||q8|| (round ≤ +0.5/127 rel) — use exact int path:
    qf32 = q.astype(jnp.float32)
    amax = jnp.max(jnp.abs(qf32), axis=-1, keepdims=True)
    q8 = jnp.clip(jnp.round(qf32 / (jnp.maximum(amax, 1e-12) / 127.0)),
                  -127, 127)
    qn = jnp.sqrt(jnp.sum(q8 * q8, axis=-1)).reshape(bh, n, 1)
    qn = jnp.broadcast_to(qn, (bh, n, 128))
    k8 = kq.values.astype(jnp.float32)
    kn = jnp.sqrt(jnp.sum(k8 * k8, axis=-1)).reshape(bh, n) * \
        kq.scales.reshape(bh, n)
    kn = jnp.broadcast_to(kn[:, None, :], (bh, 8, n))
    grid = (bh, n // block_q, n // block_kv)
    o = pl.pallas_call(
        functools.partial(
            _proto_kernel, num_steps=grid[2], scale=scale,
            fold127=fold127, f32qk=f32qk, boundmax=boundmax),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, 128), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, 8, block_kv), lambda bb, i, s: (bb, 0, s)),
            pl.BlockSpec((1, block_q, d), lambda bb, i, s: (bb, i, 0)),
            pl.BlockSpec((1, block_kv, d), lambda bb, i, s: (bb, s, 0)),
            pl.BlockSpec((1, block_kv, dv), lambda bb, i, s: (bb, s, 0)),
            pl.BlockSpec((1, 1, block_kv), lambda bb, i, s: (bb, 0, s)),
            pl.BlockSpec((1, 1, dv), lambda bb, i, s: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, dv), lambda bb, i, s: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n, dv), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, dv), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.int8),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(qn, kn, qf, kv, vv, sk, sv)
    return o.reshape(b, h, n, dv)


def main():
    b, h, n, d = 4, 8, 8192, 128
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    fl = attention_flops(b, h, n, n, d)
    kq, vq = jax.jit(functools.partial(
        quantize_kv_cache, kv_dtype="int8", kv_scale="token"))(k, v)
    kq = jax.block_until_ready(kq)

    # controls
    import os as _os
    if not _os.environ.get("E3_ONLY"):
        for pvq in (False, True):
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype="int8", pv_quant=pvq))
            t = time_fn(fn, q, kq, vq, iters=10)
            row(tag=f"E3.control.pvq{pvq}", ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2))

    # correctness gate for variants (vs f32 oracle, quant tolerance)
    qs_, ks_, vs_ = q[:1, :1, :2048], k[:1, :1, :2048], v[:1, :1, :2048]
    kqs, vqs = quantize_kv_cache(ks_, vs_, "int8", kv_scale="token")
    want, _ = dense_dpa(qs_, ks_, vs_)
    import os
    only = os.environ.get("E3_ONLY", "")
    variants = [
        ("A.fold127", dict(fold127=True)),
        ("C.boundmax", dict(fold127=True, boundmax=True)),
        ("Cnb.boundmax_bf16pv", dict(boundmax=True)),
        ("base", dict()),
    ]
    if only:
        variants = [vv for vv in variants if vv[0] in only.split(",")]
    for name, kw in variants:
        try:
            got = proto(qs_, kqs, vqs, block_q=512, block_kv=512, **kw)
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32))))
            row(tag=f"E3.check.{name}", err=round(err, 5))
        except Exception as e:  # noqa: BLE001
            row(tag=f"E3.check.{name}", error=str(e)[:100])
            continue
        fn = jax.jit(functools.partial(proto, **kw))
        try:
            t = time_fn(fn, q, kq, vq, iters=10)
        except Exception as e:  # noqa: BLE001
            row(tag=f"E3.{name}", error=str(e)[:100])
            continue
        row(tag=f"E3.{name}", ms=round(t * 1e3, 3),
            tflops=round(fl / t / 1e12, 2))


if __name__ == "__main__":
    main()
