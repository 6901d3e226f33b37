"""Minimal reproduction of the v5e dynamic-trip-loop DMA hang.

*** WARNING: RUNNING THIS WEDGES THE TPU FOR ~15 MINUTES. ***
*** Do NOT add it to any queue or CI. Run manually, on purpose, ***
*** only when investigating the hazard itself. ***

Distilled from the gated rank-1 fused-append decode kernel
(docs/DESIGN.md §13): a Pallas TPU kernel that

  1. runs a `fori_loop` whose TRIP COUNT IS A TRACED SCALAR (from scalar
     prefetch), each iteration waiting on double-buffered
     `make_async_copy` fetches from an ANY-space operand, and then
  2. issues ONE MORE async-copy fetch AFTER the loop (the "tail page"
     read the append variant needed),

wedges the chip on the post-loop DMA wait. Both an aliased-output and an
aliasing-free variant reproduced in round 2; the no-tail-fetch variant
(`paged_attention_pipelined` without append) and the constant-trip
variant (`ops/flash.py _fwd_kernel_band`) are hardware-validated safe.

SAFE-PATTERN RULES this repro implies (follow in any new kernel):
  * A loop that issues DMAs may have a dynamic trip count ONLY if no
    further DMA on the same buffers/semaphores follows the loop.
  * Prefer a CONSTANT trip count with clamped (possibly wasted but
    always-valid) sources and `pl.when`-guarded compute — issue/wait stay
    symmetric and nothing follows the loop (`_fwd_kernel_band`).
  * If a tail fetch is unavoidable, hoist it BEFORE the loop (fetch the
    tail page into its own buffer first) or split it into a separate
    kernel (the shipped split-append resolution).

Usage (manual, deliberate):
    python scripts/repro_hang.py --yes-i-want-to-wedge-the-chip
"""

import sys

if "--yes-i-want-to-wedge-the-chip" not in sys.argv:
    sys.exit(
        "refusing to run: this wedges the v5e for ~15 min.\n"
        "pass --yes-i-want-to-wedge-the-chip if that is really the goal."
    )

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 128
D = 128


def kernel(n_ref, x_any, o_ref, buf, sem, tail, tail_sem):
    # dynamic trip count from a prefetched scalar — hazard ingredient #1
    n_chunks = n_ref[0]

    def dma(c, slot):
        return pltpu.make_async_copy(
            x_any.at[pl.ds(c * CHUNK, CHUNK)], buf.at[slot], sem.at[slot]
        )

    dma(0, 0).start()

    def body(c, acc):
        slot = c % 2

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, (c + 1) % 2).start()

        dma(c, slot).wait()
        return acc + jnp.sum(buf[slot])

    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.float32(0))

    # ONE MORE fetch after the dynamic-trip loop — hazard ingredient #2.
    # On v5e this wait never completes and the chip wedges ~15 min.
    last = pltpu.make_async_copy(
        x_any.at[pl.ds((n_chunks - 1) * CHUNK, CHUNK)], tail, tail_sem
    )
    last.start()
    last.wait()
    o_ref[...] = jnp.full_like(o_ref, acc + jnp.sum(tail[...]))


def main():
    n_total = 8 * CHUNK
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (n_total, D)), jnp.float32)
    n_chunks = jnp.asarray([5], jnp.int32)  # dynamic: < n_total // CHUNK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda i, n: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, D), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((CHUNK, D), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(n_chunks, x)
    print("returned (did NOT hang?):", float(out[0, 0]))


if __name__ == "__main__":
    main()
