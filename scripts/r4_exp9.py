"""Round-4 experiment 9: causal bound-max A/B (opt-in knowledge).

The constant norm-bound max ships auto-on for non-causal band + dense
(r4_exp8); causal kept the exact max — partly unmeasured, partly because
the engine's chunked-prefill bitwise contract needs a span-independent
max. This measures what the opt-in `bound_max=True` buys on the causal
schedules (training's most common shape), so the docstring guidance is a
number, not a guess. Also confirms dense d=128 32k with the bound at
b=1 (the 187.4 canonical row) against b=4.

Writes logs/r4_exp9.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import flash_attention
from tpu_flash.ops.oracle import blockwise_dpa

LOG = open("/root/repo/logs/r4_exp9.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def case(tag, b, h, n, d, sched, radius, bound, coverage, iters=10):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    fl = attention_flops(b, h, n, n, d) * coverage
    kw = dict(schedule=sched, bound_max=bound)
    okw = {}
    if sched == "causal":
        okw["causal"] = True
    elif sched == "local_causal":
        kw.update(radius=radius)
        okw.update(window_size=2 * radius + 1, causal=True)
    fn = jax.jit(functools.partial(flash_attention, **kw))
    try:
        got = jax.block_until_ready(fn(q, k, v))
    except Exception as e:  # noqa: BLE001
        row(tag=tag, error=str(e)[:160])
        return
    want, _ = jax.block_until_ready(jax.jit(functools.partial(
        blockwise_dpa, chunk=1024, **okw))(q, k, v))
    err = float(jnp.max(jnp.abs(
        got.astype(jnp.float32) - want.astype(jnp.float32))))
    if not err <= 2e-2:
        row(tag=tag, error=f"gate {err}")
        return
    t = time_fn(fn, q, k, v, iters=iters)
    row(tag=tag, ms=round(t * 1e3, 3), tflops=round(fl / t / 1e12, 2),
        err=round(err, 6))


def main():
    b, h, n, d = 4, 8, 8192, 128
    for bound in (False, True):
        s = "bound" if bound else "exact"
        case(f"causal.d128.n8192.{s}", b, h, n, d, "causal", 0, bound, 0.5)
        case(f"local_causal.w1025.d128.n8192.{s}", b, h, n, d,
             "local_causal", 512, bound, 1025 / n)
    # dense 32k b4 with the bound (canonical b1 measured 187.4)
    case("dense.d128.n32768.b4.bound", 4, 8, 32768, 128, "dense", 0,
         None, 1.0, iters=5)


if __name__ == "__main__":
    main()
