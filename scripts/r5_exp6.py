"""Round-5 experiment 6: isolate the dense_fp8 n=1024 d=128 chip-only
gate failure.

The canonical r5 attention rerun still carries the error row
(max_abs_err 0.0153 > 1e-2) — but the SAME config with the SAME suite
rng stream measures 0.0018 in interpret mode (and the r5 bisection's
0.0026 with its own inputs). The divergence is chip-only, so the r5
"gate artifact" conclusion was incomplete: the matched-oracle gate is
correct, and the REAL kernel still drifts ~1.5e-2 at this one shape.

Hypotheses probed (fp8-tensor e2e, suite inputs, matched oracle):
  A: bound_max True vs False        (loose norm-bound -> deep exp2
     arguments; the VPU exp2 approximation error is relative to the
     TRUE max, so a loose bound amplifies it);
  B: block_kv 2048 vs 1024 vs 512   (n=1024 < default block_kv: the
     kv block clamps; padding/single-step interaction);
  C: n in {1024, 2048, 4096}        (where does the drift die off);
  D: int8 at the same points        (is it the fp8 grid or the max path).

Writes logs/r5_exp6.jsonl.
"""

import functools
import json
import math
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.ops.oracle import blockwise_dpa
from tpu_flash.quant import qarray
from tpu_flash.quant.flash_q import quantized_flash_attention

LOG = open("/root/repo/logs/r5_exp6.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def suite_inputs(n, d, b=1, h=8):
    """Replicate suite_attention's rng stream: per (n, d) it draws q, k, v
    in order, iterating d=64 then d=128 for each n — we only need the
    (n, d) pair itself plus any earlier draws at the same n."""
    rng = np.random.default_rng(0)
    seqlens = (1024, 4096, 8192, 16384, 32768)
    for nn in seqlens:
        for dd in (64, 128):
            q = jnp.asarray(rng.standard_normal((b, h, nn, dd)), jnp.bfloat16)
            k = jnp.asarray(rng.standard_normal((b, h, nn, dd)), jnp.bfloat16)
            v = jnp.asarray(rng.standard_normal((b, h, nn, dd)), jnp.bfloat16)
            if nn == n and dd == d:
                return q, k, v
    # off-grid probe shapes (e.g. n=2048): fresh stream, clearly not the
    # canonical row's inputs but fine for the trend
    rng = np.random.default_rng(7)
    mk = lambda: jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
    return mk(), mk(), mk()


def probe(tag, mode, n, d, bound, bkv, bq=1024):
    q, k, v = suite_inputs(n, d)
    sm = 1.0 / math.sqrt(d)
    if mode == "fp8":
        dt = "float8_e4m3fn"
        kw = dict(q_dtype=dt, kv_dtype=dt, kv_scale="tensor")
        deq = lambda x, ax: qarray.dequantize(
            qarray.quantize(x.astype(jnp.float32), dt, ax))
        qf = deq(q.astype(jnp.float32) * sm, -1)
        kf, vf = deq(k, (-2, -1)), deq(v, -2)
    else:
        kw = dict(q_dtype="int8", kv_dtype="int8")
        deq = lambda x, dtt, ax: qarray.dequantize(
            qarray.quantize(x.astype(jnp.float32), dtt, ax))
        qf = deq(q.astype(jnp.float32) * sm, "int8", -1)
        kf, vf = deq(k, "int8", -1), deq(v, "int8", -2)
    fn = jax.jit(functools.partial(
        quantized_flash_attention, bound_max=bound, block_q=bq,
        block_kv=bkv, **kw))
    try:
        got = jax.block_until_ready(fn(q, k, v))
    except Exception as e:  # noqa: BLE001
        row(tag=tag, error=str(e)[:200])
        return
    want, _ = jax.jit(functools.partial(blockwise_dpa, scale=1.0))(qf, kf, vf)
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    row(tag=tag, err=round(err, 6), n=n, d=d, bound_max=bound, block_kv=bkv)


def main():
    d = 128
    for n in (1024, 2048, 4096):
        for bound in (True, False):
            probe(f"A.fp8.n{n}.bound{bound}.bkv2048", "fp8", n, d, bound, 2048)
    for bkv in (1024, 512):
        probe(f"B.fp8.n1024.boundTrue.bkv{bkv}", "fp8", 1024, d, True, bkv)
        probe(f"B.fp8.n1024.boundFalse.bkv{bkv}", "fp8", 1024, d, False, bkv)
    for bound in (True, False):
        probe(f"D.int8.n1024.bound{bound}.bkv2048", "int8", 1024, d, bound,
              2048)


if __name__ == "__main__":
    main()
