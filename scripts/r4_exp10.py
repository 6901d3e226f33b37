"""Round-4 experiment 10: block-diagonal bound-max A/B.

The auto rule excludes BlockDiagonalSchedule (global-|k| bound spans
heterogeneous sections, unmeasured). This measures what the opt-in
costs/buys at the bench shape so the exclusion is a number. Gated vs
the blockwise oracle.

Writes logs/r4_exp10.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import block_fa, force_bound_max
from tpu_flash.ops.oracle import blockwise_dpa

LOG = open("/root/repo/logs/r4_exp10.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def main():
    b, h, n, d = 4, 8, 8192, 128
    sec = 512
    fl = attention_flops(b, h, n, n, d) * (sec / n)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    want, _ = jax.block_until_ready(jax.jit(functools.partial(
        blockwise_dpa, block_size=sec, chunk=1024))(q, k, v))
    for bound in (False, True):
        tag = f"block.sec512.d128.{'bound' if bound else 'exact'}"
        fn = jax.jit(functools.partial(block_fa, block_size=sec))
        with force_bound_max(bound):
            got = jax.block_until_ready(fn(q, k, v))
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32))))
            if not err <= 5e-3:
                row(tag=tag, error=f"gate {err}")
                continue
            t = time_fn(fn, q, k, v, iters=20)
        row(tag=tag, ms=round(t * 1e3, 3),
            tflops_covered=round(fl / t / 1e12, 2), err=round(err, 6))


if __name__ == "__main__":
    main()
