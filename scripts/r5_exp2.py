"""Round-5 experiment 2: backward — past the 151 TFLOP/s bound + band floor.

A. dense fwd+bwd @8k/16k d=128 b1h8: bwd_quant None vs "dp" (int8 dp dots
   on the 2× MXU — DESIGN §23 named low-bit backward operands as the only
   route past the 5-dot structural bound; r4 measured 137.7 = 91% of it).
   Gate: rel grad err ≤ 2.5e-2 vs the checkpointed oracle grads.
B. band backward frontier (VERDICT r4 item 4): sliding/circulant w=1025
   @8k d=128 b4h8 — retile (bq,bkv) × bh packing, incl. the deeper
   packing the old fixed grants could not compile (bhb8 at 512×512 now
   gets a demand-sized grant), and bwd_quant on the best config.
C. d=64 band backward routing A/B: transposed kernels vs standard+packing
   (the forward's r4_exp8 dispatch, mirrored by _BWD_SMALL_D_STANDARD).
D. dq-vs-dkv split at the best band config (floor decomposition).

Writes logs/r5_exp2.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import tpu_flash as tf
from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops import flash_bwd
from tpu_flash.ops.oracle import blockwise_dpa

LOG = open("/root/repo/logs/r5_exp2.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def mkqkv(b, h, n, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
                 for _ in range(3))


def fwdbwd_fn(attn):
    @jax.jit
    def f(q, k, v):
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    return f


def oracle_grads(q, k, v, **mask_kw):
    @jax.jit
    def f(q, k, v):
        def loss(q, k, v):
            o, _ = blockwise_dpa(q, k, v, **mask_kw)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    return jax.block_until_ready(f(q, k, v))


def rel_err(got, want):
    return max(
        float(jnp.max(jnp.abs(g.astype(jnp.float32)
                              - w.astype(jnp.float32)))
              / jnp.maximum(jnp.max(jnp.abs(w)), 1.0))
        for g, w in zip(got, want))


def measure(tag, attn, q, k, v, fl, want, tol=2.5e-2, gate=True):
    fn = fwdbwd_fn(attn)
    try:
        got = jax.block_until_ready(fn(q, k, v))
    except Exception as e:  # noqa: BLE001
        row(tag=tag, error=str(e)[:200])
        return None
    err = rel_err(got, want) if gate else None
    if gate and not err <= tol:
        row(tag=tag, error=f"grad gate {err:.4f}")
        return None
    t = time_fn(fn, q, k, v, iters=5)
    row(tag=tag, ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2),
        rel_err=None if err is None else round(err, 5))
    return t


def part_a():
    b, h, d = 1, 8, 128
    for n in (8192, 16384):
        q, k, v = mkqkv(b, h, n, d)
        fl = attention_flops(b, h, n, n, d, backward=True)
        want = oracle_grads(q, k, v)
        for mode in (None, "dp"):
            measure(f"A.dense.n{n}.{mode}.default",
                    functools.partial(tf.dense_fa, bwd_quant=mode),
                    q, k, v, fl, want)
            for bq, bkv in ((1024, 1024), (2048, 2048)):
                measure(f"A.dense.n{n}.{mode}.bq{bq}",
                        functools.partial(tf.dense_fa, bwd_quant=mode,
                                          block_q=bq, block_kv=bkv),
                        q, k, v, fl, want)
        # causal with dp on the best dense tile
        wantc = oracle_grads(q, k, v, causal=True)
        flc = attention_flops(b, h, n, n, d, backward=True, coverage=0.5)
        for mode in (None, "dp"):
            measure(f"A.causal.n{n}.{mode}",
                    functools.partial(tf.dense_fa, causal=True,
                                      bwd_quant=mode),
                    q, k, v, flc, wantc)


def part_b():
    # canonical backward shape (b=1 h=8 — suite_backward's): the band
    # grad oracle at b=4 blocked the tunnel for 30 min (r5 log 00:02).
    # Gate the DEFAULT config against the oracle; sweep configs gate
    # against the default backward's grads (cheap, still catches a
    # wrong-tiling kernel).
    b, h, n, d, win = 1, 8, 8192, 128, 1025
    cov = win / n
    q, k, v = mkqkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d, backward=True, coverage=cov)
    for name, attn_f, kw in [
            ("sliding", tf.sliding_fa, {"window_size": win}),
            ("circulant", tf.circulant_fa, {"window_size": win,
                                            "wrap": True})]:
        want = oracle_grads(q, k, v, **kw)
        base = functools.partial(attn_f, window_size=win)
        t0 = measure(f"B.{name}.default", base, q, k, v, fl, want)
        if t0 is None:
            continue
        ref = jax.block_until_ready(fwdbwd_fn(base)(q, k, v))
        for bq, bkv in ((512, 512), (512, 1024), (256, 512)):
            for bhb in (None, 4, 8):
                tag = f"B.{name}.bq{bq}.bkv{bkv}.bhb{bhb or 'auto'}"
                from tpu_flash.ops import flash as flash_mod
                with flash_bwd.force_bwd_band_tile(bq, bkv), \
                        flash_mod.force_bh_block(bhb):
                    measure(tag, base, q, k, v, fl, ref, tol=5e-3)
        # dp quant at the default band config
        measure(f"B.{name}.dp",
                functools.partial(attn_f, window_size=win, bwd_quant="dp"),
                q, k, v, fl, want)


def part_c():
    b, h, n, d, win = 1, 8, 8192, 64, 1025
    cov = win / n
    q, k, v = mkqkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d, backward=True, coverage=cov)
    want = oracle_grads(q, k, v, window_size=win)
    for std in (True, False):
        with flash_bwd.force_bwd_small_d_standard(std):
            measure(f"C.sliding.d64.{'standard' if std else 'transposed'}",
                    functools.partial(tf.sliding_fa, window_size=win),
                    q, k, v, fl, want)


def part_d(best_bq=512, best_bkv=1024, best_bhb=8):
    b, h, n, d, win = 1, 8, 8192, 128, 1025
    cov = win / n
    q, k, v = mkqkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d, backward=True, coverage=cov)
    from tpu_flash.ops import flash as flash_mod
    for parts in ("both", "dq", "dkv", "none"):
        with flash_bwd.force_bwd_parts(parts), \
                flash_bwd.force_bwd_band_tile(best_bq, best_bkv), \
                flash_mod.force_bh_block(best_bhb):
            measure(f"D.sliding.parts_{parts}",
                    functools.partial(tf.sliding_fa, window_size=win),
                    q, k, v, fl, None, gate=False)


if __name__ == "__main__":
    import jax.numpy as _jnp
    x = _jnp.ones((256, 256), _jnp.bfloat16)
    print("warmup:", float((x @ x).sum()), file=sys.stderr, flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        part_a()
    if which in ("all", "b"):
        part_b()
    if which in ("all", "c"):
        part_c()
    if which in ("all", "d"):
        args = [int(x) for x in sys.argv[2:5]] or []
        part_d(*args)
