"""Headline benchmark — prints ONE JSON line for the driver.

Metric (BASELINE.json north star): dense flash-attention TFLOP/s on one chip
at seqlen 8k with FP8 Q/K/V. ``vs_baseline`` is measured throughput over the
reference's best logged number, 473.16 GFLOP/s (C++ OpenMP flash, N=2048,
d=64, 2×Xeon 8268 — src_cpp/FlashAttantionCPPl2.out; see BASELINE.md).

The quantized headline times the SERVING configuration: K/V already
quantized (they are cache residents, written once at prefill/append —
quant/serving_attn.py), Q quantized in-kernel on first touch. That is the
steady-state work a deployed engine does per call; the end-to-end variant
(bf16 in, quantize everything inside the timed region) is reported to
stderr alongside for transparency.

Embeds a correctness gate (kernel vs f32 oracle) before timing, the
reference's bench/compare.jl:21 pattern. Detail rows go to stderr; stdout
carries exactly one JSON line.

Usage: python bench.py [--seqlen 8192] [--dtype float8_e4m3fn|int8|bf16]
       [--mode serving|e2e]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

REFERENCE_BEST_TFLOPS = 0.47316


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def _device_ready(probe_timeout: int = 120, retries: int = 8,
                  wait_s: int = 60) -> bool:
    """The device tunnel sporadically goes down for tens of minutes, and a
    hung in-process ``jax.devices()`` cannot be cancelled — probe device
    init in a subprocess and retry before giving up, so the driver gets a
    structured failure line instead of a wedged benchmark."""
    import subprocess
    import time

    for i in range(retries):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        log(f"device init unresponsive (attempt {i + 1}/{retries}); "
            f"retrying in {wait_s}s")
        time.sleep(wait_s)
    return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seqlen", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--head-dim", type=int, default=128)
    ap.add_argument("--dtype", default="float8_e4m3fn",
                    choices=["float8_e4m3fn", "float8_e5m2", "int8", "bf16"])
    ap.add_argument("--mode", default="serving", choices=["serving", "e2e"])
    ap.add_argument("--kv-split", type=int, default=None,
                    help="serving-kernel kv sub-tiling (MXU/VPU overlap); "
                         "default: the kernel's tuned default")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if not _device_ready():
        # honest structured failure: the driver records a line either way
        print(json.dumps({
            "metric": f"dense_fa {args.dtype} TFLOP/s, seqlen "
                      f"{args.seqlen}, 1 chip",
            "value": 0.0,
            "unit": "TFLOP/s",
            "vs_baseline": 0.0,
            "error": "TPU device tunnel unreachable after retries",
        }), flush=True)
        sys.exit(1)

    import functools

    from tpu_flash.bench.harness import (
        attention_bytes,
        attention_flops,
        device_peaks,
        measure,
        time_fn,
    )
    from tpu_flash.ops.oracle import blockwise_dpa
    from tpu_flash.quant.flash_q import quantized_dense_fa
    from tpu_flash.quant import qarray
    from tpu_flash.ops.flash import dense_fa

    b, h, n, d = args.batch, args.heads, args.seqlen, args.head_dim
    dev = jax.devices()[0]
    log(f"device: {dev.device_kind}  config: b={b} h={h} n={n} d={d} "
        f"dtype={args.dtype} mode={args.mode}")

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)

    if args.dtype == "bf16":
        fn = jax.jit(dense_fa)
        bench_args = (q, k, v)
        tol = 2.5e-2  # bf16 accumulate/rounding vs f32 oracle
        metric = "dense_fa bf16 TFLOP/s, seqlen 8k, 1 chip"
    else:
        dt = args.dtype
        # fp8 benches the per-tensor K-scale mode (the standard fp8
        # scaling granularity, cf. TransformerEngine delayed scaling):
        # the scalar scale folds into Q, so the score path carries no
        # per-element dequant work. int8 keeps per-token scales on the
        # native int8 MXU path.
        kv_scale = "token" if dt == "int8" else "tensor"

        @jax.jit
        def e2e_fn(q, k, v):
            return quantized_dense_fa(
                q, k, v, q_dtype=dt, kv_dtype=dt, kv_scale=kv_scale
            )

        if args.mode == "serving":
            from tpu_flash.quant.serving_attn import (
                quantize_kv_cache,
                serving_flash_attention,
            )

            kq, vq = jax.block_until_ready(jax.jit(functools.partial(
                quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
            sv_kw = {} if args.kv_split is None else {
                "kv_split": args.kv_split}
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt, **sv_kw))
            bench_args = (q, kq, vq)
        else:
            fn = e2e_fn
            bench_args = (q, k, v)

        # matched-bitwidth contract (BASELINE.md): the kernel must sit
        # within 1e-2 of the f32 oracle run on inputs quantized at the SAME
        # granularity — kernel numerics, not quantization loss, is what the
        # gate checks. e5m2 carries one fewer mantissa bit.
        tol = 2.5e-2 if dt == "float8_e5m2" else 1e-2
        metric = f"dense_fa {args.dtype} TFLOP/s, seqlen {n}, 1 chip"

    flops = attention_flops(b, h, n, n, d)
    nbytes = attention_bytes(
        b, h, n, n, d,
        q_bytes=1 if args.dtype != "bf16" else 2,
        kv_bytes=1 if args.dtype != "bf16" else 2,
    )

    # Correctness gate at the FULL bench shape via the blockwise
    # O(N)-memory f32 oracle (the dense one would need b·h·n² ≈ 8.6 GB).
    sm_scale = 1.0 / float(np.sqrt(d))
    if args.dtype != "bf16":
        if args.mode == "serving":
            # matched inputs = dequantized ACTUAL cache contents
            kf, vf = qarray.dequantize(kq), qarray.dequantize(vq)
        else:
            kf = qarray.dequantize(qarray.quantize(
                k.astype(jnp.float32), dt,
                axis=-1 if kv_scale == "token" else (-2, -1)))
            vf = qarray.dequantize(qarray.quantize(
                v.astype(jnp.float32), dt, axis=-2))
        qf = qarray.dequantize(qarray.quantize(
            q.astype(jnp.float32) * sm_scale, dt, axis=-1))
        o_scale = 1.0
    else:
        qf, kf, vf = q, k, v
        o_scale = None
    got = jax.block_until_ready(fn(*bench_args))
    want, _ = jax.block_until_ready(jax.jit(functools.partial(
        blockwise_dpa, scale=o_scale, chunk=1024))(qf, kf, vf))
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    if not err <= tol:
        raise AssertionError(f"bench gate failed: max_abs_err={err} > {tol}")
    del qf, kf, vf, want

    res = measure(
        metric, fn, bench_args,
        flops=flops, bytes_moved=nbytes,
        oracle=None, iters=args.iters,
        config={"b": b, "h": h, "n": n, "d": d, "dtype": args.dtype},
    )
    res.max_abs_err = err
    roof_dtype = "int8" if args.dtype == "int8" else "bf16"
    log(f"gate: max_abs_err={res.max_abs_err:.4f} (tol {tol})")
    log(f"median {res.seconds*1e3:.3f} ms  {res.tflops:.2f} TFLOP/s  "
        f"{res.gbps:.1f} GB/s  roofline {res.roofline_fraction(roof_dtype):.1%} "
        f"on {device_peaks()['kind']}")
    if args.dtype != "bf16" and args.mode == "serving":
        t_e2e = time_fn(e2e_fn, q, k, v, iters=args.iters)
        log(f"e2e (quantize inside timed region): {t_e2e*1e3:.3f} ms  "
            f"{flops / t_e2e / 1e12:.2f} TFLOP/s")

    print(json.dumps({
        "metric": metric,
        "value": round(res.tflops, 3),
        "unit": "TFLOP/s",
        "vs_baseline": round(res.tflops / REFERENCE_BEST_TFLOPS, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
