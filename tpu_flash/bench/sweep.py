"""Benchmark sweep CLI — the reference's bench layer rebuilt as one tool.

Reference parity: `bench/compare.jl` (dense/windowed/circulant sweeps with
embedded correctness `@test`s), `bench/softmax.jl` + `scripts/sm_*.jl`
(softmax vs library baseline), and the C++ CSV harness
(src_cpp/FlashAttention.cpp:358-471, N∈{1k..32k} × d∈{64,128} sweep).
Differences by design: JSONL+CSV artifacts under `logs/` (consumed verbatim
by `figures.py`, the pgfplots role), roofline fractions from real device
peaks instead of the int32-overflowing FLOP model, and decode tokens/s for
the serving engine (no reference analog).

Usage:
    python -m tpu_flash.bench.sweep attention [--quick]
    python -m tpu_flash.bench.sweep backward [--quick]
    python -m tpu_flash.bench.sweep softmax
    python -m tpu_flash.bench.sweep decode [--cache-dtype int8]
    python -m tpu_flash.bench.sweep all --quick
"""

from __future__ import annotations

import argparse
import csv
import functools
import json
import math
import os
import sys
import time

import jax

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_REPO_ROOT, ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import (
    attention_bytes,
    attention_flops,
    device_peaks,
    measure,
    schedule_coverage,
    time_fn,
)

LOG_DIR = os.path.join(_REPO_ROOT, "logs")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def stream_row(row: dict, name: str) -> None:
    """Append one finished row to the suite's JSONL immediately.

    The long suites (attention/backward with oracle gates at every shape)
    can outlive a queue timeout; emit() at suite end would then write
    NOTHING. Suites truncate the file once up front, then append."""
    os.makedirs(LOG_DIR, exist_ok=True)
    with open(os.path.join(LOG_DIR, f"{name}.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")


def emit(rows: list[dict], name: str, merge: bool = False) -> None:
    os.makedirs(LOG_DIR, exist_ok=True)
    jpath = os.path.join(LOG_DIR, f"{name}.jsonl")
    if merge and os.path.exists(jpath):
        # variant-named rows (decode suite): replace same-name rows, keep
        # the rest — a single-variant rerun must not truncate the log
        # (ADVICE r2: a --quick run once clobbered the full-size headline)
        new_names = {r.get("name") for r in rows}
        with open(jpath) as f:
            old = [json.loads(line) for line in f if line.strip()]
        rows = [r for r in old if r.get("name") not in new_names] + rows
    with open(jpath, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if rows:
        cpath = os.path.join(LOG_DIR, f"{name}.csv")
        keys = sorted({k for r in rows for k in r})
        with open(cpath, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys)
            w.writeheader()
            w.writerows(rows)
    log(f"wrote {len(rows)} rows → {jpath}")


def _rand(rng, *shape, dtype=jnp.bfloat16):
    return jnp.asarray(rng.standard_normal(shape), dtype)


# ---------------------------------------------------------------------------
# attention forward sweep
# ---------------------------------------------------------------------------
def suite_attention(quick: bool, stream: "str | None" = None) -> list[dict]:
    import tpu_flash as tf
    from tpu_flash.quant.flash_q import quantized_flash_attention

    rng = np.random.default_rng(0)
    rows = []
    if stream:  # truncate the streamed file once up front
        open(os.path.join(LOG_DIR, f"{stream}.jsonl"), "w").close()
    b, h = 1, 8
    seqlens = (1024, 4096) if quick else (1024, 4096, 8192, 16384, 32768)
    dims = (64,) if quick else (64, 128)
    # (name, builder(n,d) -> (fn, coverage)); radius/section scale with n.
    cases = []

    def dense(n, d):
        return jax.jit(tf.dense_fa), 1.0

    def causal(n, d):
        return jax.jit(functools.partial(tf.dense_fa, causal=True)), 0.5

    def sliding(n, d):
        w = min(n // 4 + 1, 1025)
        return jax.jit(functools.partial(tf.sliding_fa, window_size=w)), w / n

    def circulant(n, d):
        w = min(n // 4 + 1, 1025)
        return jax.jit(functools.partial(tf.circulant_fa, window_size=w)), w / n

    def block(n, d):
        sec = max(n // 16, 256)
        return jax.jit(functools.partial(tf.block_fa, block_size=sec)), sec / n

    def q_int8(n, d):
        return jax.jit(functools.partial(
            quantized_flash_attention, q_dtype="int8", kv_dtype="int8")), 1.0

    def q_fp8(n, d):
        # per-tensor K scale — the shipped fp8 fast path (see flash_q)
        return jax.jit(functools.partial(
            quantized_flash_attention, q_dtype="float8_e4m3fn",
            kv_dtype="float8_e4m3fn", kv_scale="tensor")), 1.0

    def xla_naive(n, d):
        # On-device naive baseline: materialized-P XLA attention, the
        # apples-to-apples "naive vs flash" column the reference prints
        # (bench/compare.jl:86-129). O(N²) memory — capped at n ≤ 8192
        # by the caller.
        scale = 1.0 / math.sqrt(d)

        def f(q, k, v):
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
            p = jax.nn.softmax(s * scale, axis=-1).astype(q.dtype)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        return jax.jit(f), 1.0

    cases = [("dense", dense, "bf16"), ("causal", causal, "bf16"),
             ("sliding", sliding, "bf16"), ("circulant", circulant, "bf16"),
             ("block", block, "bf16"),
             ("dense_int8", q_int8, "int8"), ("dense_fp8", q_fp8, "bf16"),
             ("xla_naive", xla_naive, "bf16")]

    def gate_for(name, q, k, v, n, d):
        """(err_fn, tol) for the correctness gate, at EVERY bench shape.

        Uses the blockwise O(N)-memory f32 oracle (ops/oracle.blockwise_dpa):
        full-row at n ≤ 8192; at 16k–32k on three 1024-row query bands
        (start / middle / end — query rows are independent, so band rows are
        exact and cover edge + interior tiles). Quantized rows gate against
        the MATCHED-BITWIDTH oracle at the north-star ≤1e-2 bound
        (BASELINE.md), not a loose total-error tolerance.
        """
        from tpu_flash.ops.oracle import blockwise_dpa
        from tpu_flash.quant import qarray

        w = min(n // 4 + 1, 1025)
        sec = max(n // 16, 256)
        mask_kw = {
            "dense": {}, "causal": {"causal": True}, "xla_naive": {},
            "sliding": {"window_size": w},
            "circulant": {"window_size": w, "wrap": True},
            "block": {"block_size": sec},
            "dense_int8": {}, "dense_fp8": {},
        }[name]
        sm_scale = 1.0 / math.sqrt(d)
        # The matched-bitwidth oracle must feed the quantizer EXACTLY what
        # the kernel's preamble feeds it: q is scaled in f32 BEFORE
        # quantization (flash_q: `q.astype(f32) * scale`). Scaling in bf16
        # (`q * sm_scale` on a bf16 q) rounds the quantizer input, flips
        # grid-boundary fp8/int8 codes, and mis-measures the kernel by up
        # to ~1e-2 — the r3/r4 "dense_fp8 n=1024 d=128" failure row
        # (err 0.0155) was THIS gate artifact: against the correctly
        # matched oracle the shipped kernel (scale-folded bf16 Q operand)
        # measures 0.0026 at the same config. A per-row-score-scale/FMA
        # kernel variant that removes the fold's ~1e-3 rounding entirely
        # was built and measured SLOWER (int8 @8k 186.6 → 179.6 TFLOP/s —
        # the fused fma breaks Mosaic's staged dot/exp2 overlap), so the
        # fold stays (r5 bisection, logs/r5_exp1.jsonl A rows).
        if name == "dense_int8":
            deq = lambda x, dt, ax: qarray.dequantize(
                qarray.quantize(x.astype(jnp.float32), dt, axis=ax))
            qf = deq(q.astype(jnp.float32) * sm_scale, "int8", -1)
            kf, vf = deq(k, "int8", -1), deq(v, "int8", -2)
            scale, tol = 1.0, 1e-2
        elif name == "dense_fp8":
            dt = "float8_e4m3fn"
            deq = lambda x, ax: qarray.dequantize(
                qarray.quantize(x.astype(jnp.float32), dt, axis=ax))
            qf = deq(q.astype(jnp.float32) * sm_scale, -1)
            kf, vf = deq(k, (-2, -1)), deq(v, -2)
            scale, tol = 1.0, 1e-2
        else:
            qf, kf, vf = q, k, v
            scale, tol = None, 2.5e-2
        bands = ([(0, n)] if n <= 8192 else
                 [(0, 1024), (n // 2 - 512, 1024), (n - 1024, 1024)])

        def err_fn(got):
            if isinstance(got, tuple):
                got = got[0]
            err = 0.0
            for a, nb in bands:
                want, _ = jax.jit(functools.partial(
                    blockwise_dpa, scale=scale, q_start=a, **mask_kw
                ))(qf[:, :, a:a + nb], kf, vf)
                e = jnp.max(jnp.abs(
                    got[:, :, a:a + nb].astype(jnp.float32)
                    - want.astype(jnp.float32)))
                err = max(err, float(e))
            return err

        return err_fn, tol

    for n in seqlens:
        for d in dims:
            q = _rand(rng, b, h, n, d)
            k = _rand(rng, b, h, n, d)
            v = _rand(rng, b, h, n, d)
            for name, builder, roof_dtype in cases:
                if name == "xla_naive" and n > 8192:
                    continue  # O(N²) P matrix exceeds HBM past 8k
                fn, cov = builder(n, d)
                flops = attention_flops(b, h, n, n, d, coverage=cov)
                nbytes = attention_bytes(b, h, n, n, d)
                err_fn, tol = gate_for(name, q, k, v, n, d)
                try:
                    res = measure(
                        name, fn, (q, k, v), flops=flops, bytes_moved=nbytes,
                        err_fn=err_fn, tol=tol,
                        iters=5 if quick else 10,
                        config={"n": n, "d": d, "b": b, "h": h,
                                "coverage": round(cov, 4)},
                    )
                except Exception as e:  # noqa: BLE001 — record, keep sweeping
                    log(f"  {name} n={n} d={d} FAILED: {type(e).__name__}")
                    # a SILENTLY absent row reads as "covered" — emit a
                    # structured failure row so the log carries the gap
                    # (the dense_fp8 n=1024 d=128 gate failure went
                    # unnoticed from r3 to r4 because the row was dropped)
                    fail = {"name": name, "n": n, "d": d, "b": b, "h": h,
                            "error": str(e)[:200]}
                    rows.append(fail)
                    if stream:
                        stream_row(fail, stream)
                    continue
                row = res.row(roof_dtype)
                rows.append(row)
                if stream:
                    stream_row(row, stream)
                log(f"  {name:12s} n={n:6d} d={d:4d}  {res.seconds*1e3:8.2f} ms"
                    f"  {res.tflops:7.2f} TFLOP/s  roof {row['roofline_frac']:.1%}")
    return rows


# ---------------------------------------------------------------------------
# N-d (image/video) attention — BASELINE config "dense_fa 2D/3D
# (64x64x16 grid) FP8"; the reference's 1D/2D/3D surface (src/windowed.jl)
# ---------------------------------------------------------------------------
def suite_ndim(quick: bool) -> list[dict]:
    import tpu_flash as tf

    rng = np.random.default_rng(0)
    rows = []
    b, d = 1, 64
    s2 = 64 if quick else 128

    # per-case head counts keep full-size dense N-d calls under ~15 s
    # (dense attention over a 64x64x16 grid is 1.1 PFLOP/head/batch)
    cases = [
        # (name, spatial, heads, fn(q,k,v), coverage)
        ("dense2d", (s2, s2), 8,
         lambda q, k, v: tf.dense_fa(q, k, v), 1.0),
        ("dense2d_fp8", (s2, s2), 8,
         lambda q, k, v: tf.dense_fa(q, k, v, q_dtype="float8_e4m3fn",
                                     kv_dtype="float8_e4m3fn"), 1.0),
        ("dense3d", (4, 32, 32) if quick else (16, 64, 64), 1,
         lambda q, k, v: tf.dense_fa(q, k, v), 1.0),
        ("block2d", (64, 64) if quick else (256, 256), 8,
         lambda q, k, v: tf.block_fa(q, k, v, (16, 16)),
         lambda n: 256 / n),
        ("windowed2d_fp8", (64, 64), 8,
         lambda q, k, v: tf.windowed_fa(
             q, k, v, (16, 16), stride=8, q_dtype="float8_e4m3fn",
             kv_dtype="float8_e4m3fn"),
         None),  # overlap duplicates work; report seconds only
    ]
    for name, spatial, h, fn, cov in cases:
        n = math.prod(spatial)
        if callable(cov):
            cov = cov(n)
        q = _rand(rng, b, *spatial, h, d)
        k = _rand(rng, b, *spatial, h, d)
        v = _rand(rng, b, *spatial, h, d)
        jfn = jax.jit(fn)
        try:
            sec = time_fn(jfn, q, k, v, iters=2 if not quick else 3)
        except Exception as e:  # noqa: BLE001
            log(f"  {name} {spatial} FAILED: {type(e).__name__}")
            continue
        row = {"name": name, "spatial": "x".join(map(str, spatial)),
               "n": n, "d": d, "h": h, "seconds": round(sec, 6)}
        if cov is not None:
            flops = attention_flops(b, h, n, n, d, coverage=cov)
            row["tflops"] = round(flops / sec / 1e12, 3)
        rows.append(row)
        log(f"  {name:16s} {row['spatial']:12s} {sec*1e3:9.2f} ms"
            + (f"  {row['tflops']:8.2f} TFLOP/s" if cov is not None else ""))
    return rows


# ---------------------------------------------------------------------------
# backward sweep (fwd+bwd via jax.grad — the reference never shipped a
# working backward; ours must be both correct and fast)
# ---------------------------------------------------------------------------
def suite_backward(quick: bool, stream: "str | None" = None) -> list[dict]:
    import tpu_flash as tf

    rng = np.random.default_rng(0)
    rows = []
    if stream:
        open(os.path.join(LOG_DIR, f"{stream}.jsonl"), "w").close()
    b, h = 1, 8
    seqlens = (1024, 4096) if quick else (1024, 4096, 8192, 16384)
    dims = (64,) if quick else (64, 128)
    # The schedule family a trainer would actually use (VERDICT r1 item 7:
    # dense-only backward rows said nothing about the sparse paths).
    win = 1025

    def _variants(n, d):
        yield "dense_fwd_bwd", (lambda q, k, v: tf.dense_fa(q, k, v)), 1.0
        if d > 64:
            # int8 dp-dot backward (bwd_quant='dp') — the route past the
            # 5-dot structural bound (DESIGN §23); d ≤ 64 ignores the flag
            yield "dense_fwd_bwd_dpq", (
                lambda q, k, v: tf.dense_fa(q, k, v, bwd_quant="dp")), 1.0
        yield "causal_fwd_bwd", (
            lambda q, k, v: tf.dense_fa(q, k, v, causal=True)), 0.5
        if n > win:
            cov = win / n
            yield "sliding_fwd_bwd", (
                lambda q, k, v: tf.sliding_fa(q, k, v, win)), cov
            yield "circulant_fwd_bwd", (
                lambda q, k, v: tf.circulant_fa(q, k, v, win)), cov

    for n in seqlens:
      for d in dims:
        q = _rand(rng, b, h, n, d)
        k = _rand(rng, b, h, n, d)
        v = _rand(rng, b, h, n, d)

        for name, attn, cov in _variants(n, d):
            @jax.jit
            def fwdbwd(q, k, v, _attn=attn):
                def loss(q, k, v):
                    return jnp.sum(_attn(q, k, v).astype(jnp.float32) ** 2)
                return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

            # Gate the grads against ∇(blockwise f32 oracle) — the oracle's
            # scan body is checkpointed, so its backward stays O(n·chunk)
            # and runs at every bench shape (VERDICT r2 item 6: every
            # backward.jsonl row used to carry max_abs_err = NaN).
            mask_kw = ({} if name.startswith("dense") else
                       {"causal": True} if name.startswith("causal") else
                       {"window_size": win} if name.startswith("sliding") else
                       {"window_size": win, "wrap": True})

            def err_fn(got, _mask_kw=mask_kw):
                from tpu_flash.ops.oracle import blockwise_dpa

                @jax.jit
                def oracle_grads(q, k, v):
                    def loss(q, k, v):
                        o, _ = blockwise_dpa(q, k, v, **_mask_kw)
                        return jnp.sum(o.astype(jnp.float32) ** 2)
                    return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

                want = jax.block_until_ready(oracle_grads(q, k, v))
                # grad magnitudes grow with n (dK/dV sum over all queries);
                # report error RELATIVE to the oracle grad's max magnitude
                # so one flat tolerance holds across the sweep.
                return max(
                    float(jnp.max(jnp.abs(g.astype(jnp.float32)
                                          - w.astype(jnp.float32)))
                          / jnp.maximum(jnp.max(jnp.abs(w)), 1.0))
                    for g, w in zip(got, want))

            flops = attention_flops(b, h, n, n, d, backward=True,
                                    coverage=cov)
            nbytes = attention_bytes(b, h, n, n, d) * 3
            res = measure(
                name, fwdbwd, (q, k, v), flops=flops,
                bytes_moved=nbytes, iters=5,
                err_fn=err_fn, tol=2.5e-2,
                config={"n": n, "d": d, "b": b, "h": h, "coverage": cov},
            )
            rows.append(res.row("bf16"))
            if stream:
                stream_row(res.row("bf16"), stream)
            log(f"  {name:18s} n={n:6d} d={d:4d}  {res.seconds*1e3:8.2f} ms"
                f"  {res.tflops:7.2f} TFLOP/s (covered)")
    return rows


# ---------------------------------------------------------------------------
# softmax (reference bench/softmax.jl: naive vs fused vs NNlib)
# ---------------------------------------------------------------------------
def suite_softmax(quick: bool) -> list[dict]:
    from tpu_flash.ops.softmax import fused_softmax

    rng = np.random.default_rng(0)
    rows = []
    # (m, n, axis): row one-pass, row many-fiber, row chunked two-pass
    # (fiber > VMEM), col one-pass, col chunked two-pass. The col shapes
    # mirror the reference's col-softmax bench (logs/sm_cuda.txt: fiber
    # 8192 x 131072 fibers).
    shapes = [
        (8192, 16384, -1),
        (131072, 2048, -1),
        (2048, 131072, -1),
        (4096, 16384, -2),
        # reference col-softmax fiber length (8192) at half the fiber
        # count: the full 131072 needs >12 GB HBM with the gate arrays
        (8192, 65536, -2),
    ]
    for m, n, axis in shapes:
        x = _rand(rng, m, n, dtype=jnp.float32)
        nbytes = x.size * 4 * 2
        for name, fn in (
            ("fused_softmax", jax.jit(
                functools.partial(fused_softmax, axis=axis))),
            ("xla_softmax", jax.jit(
                functools.partial(jax.nn.softmax, axis=axis))),
        ):
            got = fn(x)
            want = jax.nn.softmax(x, axis=axis)
            err = float(jnp.max(jnp.abs(got - want)))
            # 2e-6: the chunked two-pass online merge rounds differently
            # from XLA's reduce on ≥8k-long fibers (measured 1.04e-6)
            assert err <= 2e-6, f"softmax gate: {err}"
            del want
            sec = time_fn(fn, x, iters=10)
            gbps = nbytes / sec / 1e9
            rows.append({"name": name, "m": m, "n": n, "axis": axis,
                         "seconds": round(sec, 6), "gbps": round(gbps, 2),
                         "hbm_frac": round(
                             gbps * 1e9 / device_peaks()["hbm_bytes"], 4),
                         "max_abs_err": err})
            log(f"  {name:14s} {m}x{n} ax{axis}  {sec*1e3:7.3f} ms  "
                f"{gbps:7.1f} GB/s")
    return rows


# ---------------------------------------------------------------------------
# decode (continuous batching; tokens/s; no reference analog — north star)
# ---------------------------------------------------------------------------
def suite_decode(cache_dtype: str, quick: bool, weight_dtype: str = "bf16",
                 pipelined: bool = False, decode_steps: int = 1) -> list[dict]:
    from tpu_flash.cache.paged_cache import CacheConfig
    from tpu_flash.models import transformer as tfm
    from tpu_flash.serving.engine import Engine, EngineConfig, Request

    mcfg = tfm.ModelConfig(
        vocab_size=32000,
        dim=1024 if quick else 2048,
        num_layers=4 if quick else 16,
        num_q_heads=8 if quick else 16,
        num_kv_heads=8,
        head_dim=128,
    )
    ccfg = CacheConfig(
        num_kv_heads=mcfg.num_kv_heads, head_dim=mcfg.head_dim,
        page_size=64, total_pages=1024, max_seqs=32,
        max_pages_per_seq=64, dtype=cache_dtype,
    )
    log(f"  building model dim={mcfg.dim} layers={mcfg.num_layers} "
        f"cache={cache_dtype}")
    if weight_dtype not in ("bf16", "int8"):
        raise ValueError(f"unsupported weight_dtype {weight_dtype!r}")
    params = tfm.init_params(jax.random.PRNGKey(0), mcfg)
    if weight_dtype == "int8":
        params = tfm.quantize_weights(params)
    eng = Engine(params, mcfg, ccfg,
                 EngineConfig(max_batch=16, pipelined_decode=pipelined,
                              decode_steps=decode_steps))

    rng = np.random.default_rng(0)
    n_req, gen = (8, 32) if quick else (24, 96)
    prompt_len = 128 if quick else 512

    # Warm every engine graph (prefill chunk, K-step decode round, sampling
    # pack) on THIS engine instance before the timed region: the jitted
    # closures live on the instance, and a cold run spends tens of seconds
    # in tracing + remote compile — which measured LARGER than the entire
    # steady-state host loop and inverted the r5 async-vs-sync comparison
    # (cold: 27.2 tok/s async vs r4's 33.2 sync; see ROUND5.md item 6).
    # A deployed engine compiles once per shape; e2e tokens/s claims the
    # steady-state host-loop rate, so the one-time cost stays out of t0.
    wrng = np.random.default_rng(1)
    eng.submit(Request(rid=10_000,
                       prompt=list(wrng.integers(1, 31999, prompt_len)),
                       max_new_tokens=max(2 * decode_steps, 4)))
    tw = time.perf_counter()
    eng.run()
    n_warm = len(eng.finished)
    log(f"  warmup (trace+compile+1 request): {time.perf_counter()-tw:.2f} s")

    for rid in range(n_req):
        eng.submit(Request(
            rid=rid,
            prompt=list(rng.integers(1, 31999, prompt_len)),
            max_new_tokens=gen,
        ))
    t0 = time.perf_counter()
    done = eng.run()
    wall = time.perf_counter() - t0
    new_tokens = sum(len(f.new_tokens) for f in done[n_warm:])
    tps = new_tokens / wall
    log(f"  engine end-to-end (warm): {new_tokens} tokens in {wall:.2f} s "
        f"→ {tps:.1f} tok/s (host loop includes tunnel latency)")

    # Parity gate (VERDICT r4 item 9): the engine's reported per-token
    # logprobs vs a teacher-forced full-forward recomputation of the same
    # stream — bounds the whole serving stack's numeric drift (paged
    # kernels + quantized cache) with one number per run.
    f0 = next(f for f in done if f.rid == 0)
    toks_arr = jnp.asarray([f0.tokens], jnp.int32)
    lp_all = jax.nn.log_softmax(
        tfm.forward(params, toks_arr, mcfg).astype(jnp.float32), axis=-1)
    gen_ids = np.asarray(f0.tokens[prompt_len:], np.int64)
    pos_idx = np.arange(len(gen_ids)) + prompt_len - 1
    want_lp = np.asarray(lp_all[0])[pos_idx, gen_ids]
    lp_err = float(np.max(np.abs(want_lp - np.asarray(f0.logprobs))))
    lp_tol = {"bfloat16": 0.05, "float32": 0.02, "int8": 1.0, "fp8": 1.0,
              "float8_e4m3fn": 1.0, "int4": 2.5}[cache_dtype]
    log(f"  parity gate: max |Δlogprob| teacher-forced = {lp_err:.4f} "
        f"(tol {lp_tol})")
    if not lp_err <= lp_tol:
        raise AssertionError(
            f"decode parity gate: logprob drift {lp_err} > {lp_tol}")

    # Device-only decode step time (the number that scales): fixed token ids,
    # full batch, timed with the enqueue-K harness.
    slots = jnp.arange(16, dtype=jnp.int32)
    toks = jnp.ones((16,), jnp.int32)
    pos = jnp.full((16,), prompt_len, jnp.int32)

    # params/caches must be jit ARGUMENTS: closed-over they become baked-in
    # constants and the compile payload carries the whole model. The page
    # bound is the tight power-of-4 bucket the engine itself would pick.
    # Caches are DONATED and chained call-to-call exactly like the engine's
    # decode loop — without donation XLA copies the page pools every call
    # (~0.3 ms/layer of pure copy that the real engine never pays).
    bound = eng._pages_bound() if eng.running else 16

    step = jax.jit(
        lambda params, caches, tokens, positions: tfm.decode_step(
            params, tokens, positions, caches, slots, mcfg,
            pages_bound=bound, pipelined=pipelined),
        donate_argnums=(1,),
    )

    def _chain(k, caches):
        t0 = time.perf_counter()
        logits = None
        for _ in range(k):
            logits, caches = step(eng.params, caches, toks, pos)
        jax.block_until_ready(logits)
        float(jnp.asarray(logits).sum())  # host fetch = the real sync
        return time.perf_counter() - t0, caches

    import dataclasses as _dc

    # realistic state: 16 live slots at prompt_len (run() freed the slots,
    # which would zero num_pages and skip the kernel's compute steps)
    start_caches = [
        _dc.replace(c, lengths=c.lengths.at[:16].set(prompt_len))
        for c in eng.caches
    ]
    _, caches = _chain(2, start_caches)  # warmup
    lat, caches = _chain(1, caches)
    total, caches = _chain(21, caches)
    sec = max((total - lat) / 20, 1e-9)
    dev_tps = 16 / sec
    log(f"  device decode step: {sec*1e3:.2f} ms for batch 16 "
        f"→ {dev_tps:.0f} tok/s/chip")
    return [{
        "name": f"decode_{cache_dtype}_w{weight_dtype}"
                + ("_pipelined" if pipelined else "")
                + (f"_k{decode_steps}" if decode_steps > 1 else ""),
        "logprob_err": round(lp_err, 4),
        "decode_steps": decode_steps,
        "warm_e2e": True,
        "tokens_per_s_e2e": round(tps, 1),
        "tokens_per_s_device": round(dev_tps, 1),
        "decode_step_ms": round(sec * 1e3, 3),
        "batch": 16, "prompt_len": prompt_len, "gen": gen,
        "dim": mcfg.dim, "layers": mcfg.num_layers,
        "cache_dtype": cache_dtype, "weight_dtype": weight_dtype,
    }]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("suite", choices=["attention", "ndim", "backward",
                                      "softmax", "decode", "all"])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cache-dtype", default="int8")
    ap.add_argument("--weight-dtype", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--pipelined", action="store_true",
                    help="decode suite: use the hand-pipelined decode kernel")
    ap.add_argument("--decode-steps", type=int, default=1,
                    help="decode suite: K decode iterations per device call")
    args = ap.parse_args()

    log(f"device: {device_peaks()['kind']}")
    # --quick runs use toy configs; write them to *_quick logs so they never
    # clobber the canonical full-size rows (a quick decode run once silently
    # replaced the dim-2048/16-layer headline with a dim-1024/4-layer row).
    sfx = "_quick" if args.quick else ""
    if args.suite in ("attention", "all"):
        emit(suite_attention(args.quick, stream="attention" + sfx),
             "attention" + sfx)
    if args.suite in ("ndim", "all"):
        emit(suite_ndim(args.quick), "ndim" + sfx)
    if args.suite in ("backward", "all"):
        emit(suite_backward(args.quick, stream="backward" + sfx),
             "backward" + sfx)
    if args.suite in ("softmax", "all"):
        emit(suite_softmax(args.quick), "softmax" + sfx)
    if args.suite in ("decode", "all"):
        emit(suite_decode(args.cache_dtype, args.quick,
                          weight_dtype=args.weight_dtype,
                          pipelined=args.pipelined,
                          decode_steps=args.decode_steps), "decode" + sfx,
             merge=True)


if __name__ == "__main__":
    main()
