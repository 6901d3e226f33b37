"""Round-5 experiment 4: leftover frontier corners after the E sweep.

  A. bf16 dense @8k: deep packing at square tiles (bhb8 — the int8
     winner's geometry; bf16's auto cap stops at bhb4) + 2048/1024/bhb4.
  B. fp8 @8k: the unmeasured (4096,1024,2) / (2048,1024,4) combinations
     (big-q upcast amortization × some packing at feasible VMEM).
  C. int8/fp8 d=64 serving: standard-layout + deep packing vs the
     transposed default (the §22 band lesson probed on dense serving).

Writes logs/r5_exp4.jsonl.
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

import importlib.util

_spec = importlib.util.spec_from_file_location(
    "r5e1", "/root/repo/scripts/r5_exp1.py")
_m = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_m)

LOG = open("/root/repo/logs/r5_exp4.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def part_a():
    b, h, n, d = 4, 8, 8192, 128
    q, k, v = _m.make_qkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d)
    for bq, bkv, bhb in [(1024, 1024, 8), (2048, 1024, 4), (1024, 1024, 4),
                         (512, 1024, 8), (1024, 512, 8)]:
        with flash_mod.force_bh_block(bhb):
            try:
                fn = jax.jit(functools.partial(
                    tf.dense_fa, block_q=bq, block_kv=bkv))
                t = time_fn(fn, q, k, v, iters=10)
            except Exception as e:  # noqa: BLE001
                row(tag=f"A.bf16.bq{bq}.bkv{bkv}.bhb{bhb}",
                    error=str(e)[:200])
                continue
        row(tag=f"A.bf16.bq{bq}.bkv{bkv}.bhb{bhb}", ms=round(t * 1e3, 3),
            tflops=round(fl / t / 1e12, 2))


def part_b():
    b, h, n, d = 4, 8, 8192, 128
    q, k, v = _m.make_qkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d)
    for bq, bkv, bhb in [(4096, 1024, 2), (2048, 1024, 4), (2048, 1024, 8)]:
        tag = f"B.fp8.bq{bq}.bkv{bkv}.bhb{bhb}"
        try:
            t, err = _m.serving_case(
                q, k, v, "float8_e4m3fn", "tensor", "float8_e4m3fn",
                block_q=bq, block_kv=bkv, bh_block=bhb)
        except Exception as e:  # noqa: BLE001
            row(tag=tag, error=str(e)[:200])
            continue
        row(tag=tag, ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2),
            err=round(err, 5))


def part_c():
    b, h, n, d = 4, 8, 8192, 64
    q, k, v = _m.make_qkv(b, h, n, d)
    fl = attention_flops(b, h, n, n, d)
    for dt, ks, qdt in [("int8", "token", "int8"),
                        ("float8_e4m3fn", "tensor", "float8_e4m3fn")]:
        # transposed default
        try:
            t, err = _m.serving_case(q, k, v, dt, ks, qdt)
            row(tag=f"C.{dt}.d64.transposed", ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2), err=round(err, 5))
        except Exception as e:  # noqa: BLE001
            row(tag=f"C.{dt}.d64.transposed", error=str(e)[:200])
        for bq, bkv, bhb in [(1024, 1024, 8), (1024, 2048, 4),
                             (512, 1024, 8)]:
            tag = f"C.{dt}.d64.std.bq{bq}.bkv{bkv}.bhb{bhb}"
            try:
                t, err = _m.serving_case(
                    q, k, v, dt, ks, qdt, transposed=False, block_q=bq,
                    block_kv=bkv, bh_block=bhb)
            except Exception as e:  # noqa: BLE001
                row(tag=tag, error=str(e)[:200])
                continue
            row(tag=tag, ms=round(t * 1e3, 3),
                tflops=round(fl / t / 1e12, 2), err=round(err, 5))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "a"):
        part_a()
    if which in ("all", "b"):
        part_b()
    if which in ("all", "c"):
        part_c()
