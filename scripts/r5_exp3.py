"""Round-5 experiment 3: lean state init A/B + new-winner confirmation.

r5_exp1's D ladder attributed the entire 8k-vs-32k residual to a ~10 µs
per-(bh, q-block) fixed cost; E found int8 @8k jumps to 194.9 TFLOP/s at
bq1024²/bhb8 under the constant bound. This experiment:

  A. lean on/off at the serving argmax configs (fp8 bq4096/bkv2048,
     int8 1024²/bhb8 + shipped 4096/2048) and bf16 dense default, 8k;
  B. the int8 winner at 32k (does 1024²/bhb8 beat 201?);
  C. winner configs re-gated + ready to freeze as defaults.

Writes logs/r5_exp3.jsonl.
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
from tpu_flash.ops import flash as flash_mod

sys.path.insert(0, "/root/repo/scripts")
import importlib.util

_spec = importlib.util.spec_from_file_location(
    "r5e1", "/root/repo/scripts/r5_exp1.py")
_m = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_m)

LOG = open("/root/repo/logs/r5_exp3.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def main():
    h, d = 8, 128
    for b, n in [(4, 8192), (1, 32768)]:
        q, k, v = _m.make_qkv(b, h, n, d)
        fl = attention_flops(b, h, n, n, d)
        cases = [
            ("float8_e4m3fn", "tensor", "float8_e4m3fn", 4096, 2048, 1),
            ("int8", "token", "int8", 4096, 2048, 1),
            ("int8", "token", "int8", 1024, 1024, 8),
            ("int8", "token", "int8", 1024, 1024, 4),
            ("float8_e4m3fn", "tensor", "float8_e4m3fn", 1024, 1024, 8),
        ]
        for dt, ks, qdt, bq, bkv, bhb in cases:
            for lean in (True, False):
                tag = (f"{dt}.n{n}.bq{bq}.bkv{bkv}.bhb{bhb}."
                       f"{'lean' if lean else 'eager'}")
                try:
                    t, err = _m.serving_case(
                        q, k, v, dt, ks, qdt, block_q=bq, block_kv=bkv,
                        bh_block=bhb, lean=lean)
                except Exception as e:  # noqa: BLE001
                    row(tag=tag, error=str(e)[:200])
                    continue
                row(tag=tag, ms=round(t * 1e3, 3),
                    tflops=round(fl / t / 1e12, 2), err=round(err, 5))
        # bf16 dense default, lean on/off
        for lean in (True, False):
            with flash_mod.force_lean(lean):
                fn = jax.jit(functools.partial(tf.dense_fa))
                t = time_fn(fn, q, k, v, iters=10)
            row(tag=f"bf16.n{n}.default.{'lean' if lean else 'eager'}",
                ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2))


if __name__ == "__main__":
    main()
