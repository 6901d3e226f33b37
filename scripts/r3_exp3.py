"""Round-3 experiment 3: amortize the fp8 upcast — big-tile serving sweep.

Decomposition (r3_exp2 A, logs/r3_exp2.jsonl) showed the fp8 serving
kernel's floor is its DOT CHAIN at 6.65 ms (165 TFLOP/s), not softmax
(0.41 ms): the fp8→bf16 upcast of each K/V tile reruns once per Q BLOCK
(n/bq = 8 repeats at bq=1024), ~1.07 ms of VPU work over the bf16 dot
floor (5.58 ms). Doubling/quadrupling block_q halves/quarters the
repeats. This sweeps block_q ∈ {1024, 2048, 4096} × block_kv ∈ {2048,
4096} for fp8-tensor / int8 serving and bf16 dense, with a correctness
gate per config.

Writes logs/r3_exp3.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import dense_fa
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

LOG = open("/root/repo/logs/r3_exp3.jsonl", "a")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    log("  " + json.dumps(kw))


def main():
    b, h, n, d = 4, 8, 8192, 128
    fl = attention_flops(b, h, n, n, d)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))

    cases = []
    for dt, kv_scale in [("float8_e4m3fn", "tensor"), ("int8", "token")]:
        kq, vq = jax.block_until_ready(jax.jit(functools.partial(
            quantize_kv_cache, kv_dtype=dt, kv_scale=kv_scale))(k, v))
        cases.append((dt, kq, vq))

    grids = [(1024, 2048), (2048, 2048), (2048, 4096), (4096, 4096),
             (4096, 2048)]
    for dt, kq, vq in cases:
        for bq, bkv in grids:
            fn = jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt,
                block_q=bq, block_kv=bkv))
            try:
                got = jax.block_until_ready(fn(q, kq, vq))
            except Exception as e:  # noqa: BLE001
                row(tag=f"{dt}.bq{bq}.bkv{bkv}", error=str(e)[:160])
                continue
            # gate vs the shipped config's output (same numerics contract)
            ref = jax.block_until_ready(jax.jit(functools.partial(
                serving_flash_attention, q_dtype=dt))(q, kq, vq))
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - ref.astype(jnp.float32))))
            if not err <= 2.5e-2:
                row(tag=f"{dt}.bq{bq}.bkv{bkv}", error=f"gate {err}")
                continue
            t = time_fn(fn, q, kq, vq, iters=10)
            row(tag=f"{dt}.bq{bq}.bkv{bkv}", ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2), err=round(err, 5))

    for bq, bkv in grids:
        fn = jax.jit(functools.partial(dense_fa, block_q=bq, block_kv=bkv))
        try:
            t = time_fn(fn, q, k, v, iters=10)
        except Exception as e:  # noqa: BLE001
            row(tag=f"bf16.bq{bq}.bkv{bkv}", error=str(e)[:160])
            continue
        row(tag=f"bf16.bq{bq}.bkv{bkv}", ms=round(t * 1e3, 3),
            tflops=round(fl / t / 1e12, 2))


def sampling_cost():
    """Device-step cost of the sampling modes (the e2e engine rows in
    r2_exp6 C are tunnel/host-noise dominated; the defensible claim is
    the device cost of the lax.cond-guarded truncation sort)."""
    from tpu_flash.serving.engine import _sample_packed

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((16, 32000)), jnp.float32)
    key = jax.random.PRNGKey(0)
    fn = jax.jit(_sample_packed)
    for name, samp in (
        ("greedy", [0.0, 0.0, 1.0]),
        ("temp", [0.8, 0.0, 1.0]),
        ("topk_topp", [0.8, 50.0, 0.9]),
    ):
        s = jnp.asarray([samp] * 16, jnp.float32)
        t = time_fn(fn, logits, s, key, iters=50)
        row(tag=f"sample.{name}", us=round(t * 1e6, 1))


if __name__ == "__main__":
    main()
    sampling_cost()
