"""Round-5 timeboxed probe: can THIS libtpu express element-offset kv loads?

DESIGN §22 closed the band-geometry floor (aligned 1024-wide kv tiles
cover a 1536-wide band span at 2.5× inflation) with two measured dead
ends: BlockSpec is block-granular by construction, and the r3 manual-DMA
band kernel measured slower — while a DYNAMIC `pl.ds` offset on an
ANY-space DMA source crashed Mosaic's compile outright (bisected r3;
see scripts/repro_hang.py header for the related runtime-hang pattern).
ROUND4 open edge 3 asked for a dated re-probe on the current libtpu.

This script is COMPILE-ONLY probing (one tiny kernel per pattern, lowered
+ compiled, executed once on a 256-element toy so a compile success is
also a run success). It never uses the dynamic-trip-then-tail-DMA pattern
that wedges the chip. Patterns:

  P1: dynamic pl.ds element offset on an ANY-space make_async_copy source
      (the capability the band kernel needs for unaligned spans);
  P2: the same with a scalar-prefetch-derived offset;
  P3: control — scalar-indexed tile-pool DMA (the r3-safe pattern, must
      still compile).

Writes logs/r5_band_probe.jsonl with one row per pattern.
"""

import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG = open("/root/repo/logs/r5_band_probe.jsonl", "a")


def row(**kw):
    kw["date"] = time.strftime("%Y-%m-%d")
    kw["jax"] = jax.__version__
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print(json.dumps(kw), file=sys.stderr, flush=True)


def probe(name, build):
    try:
        out = jax.block_until_ready(build())
        row(pattern=name, ok=True, checksum=float(np.asarray(out).sum()))
    except Exception as e:  # noqa: BLE001
        row(pattern=name, ok=False, error=f"{type(e).__name__}: {e}"[:300])


def p1_dynamic_ds():
    n, w = 1024, 256

    def kernel(off_ref, x_any, o_ref, buf, sem):
        off = off_ref[0]
        pltpu.make_async_copy(
            x_any.at[pl.ds(off, w)], buf, sem).start()
        pltpu.make_async_copy(
            x_any.at[pl.ds(off, w)], buf, sem).wait()
        o_ref[...] = buf[...]

    x = jnp.arange(n * 128, dtype=jnp.float32).reshape(n, 128)
    off = jnp.asarray([96], jnp.int32)  # deliberately NOT tile-aligned

    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((w, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((w, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(off, x)


def p2_prefetch_offset():
    n, w = 1024, 256

    def kernel(off_ref, x_any, o_ref, buf, sem):
        off = off_ref[0] * 2 + 32  # derived, still element-granular
        pltpu.make_async_copy(
            x_any.at[pl.ds(off, w)], buf, sem).start()
        pltpu.make_async_copy(
            x_any.at[pl.ds(off, w)], buf, sem).wait()
        o_ref[...] = buf[...]

    x = jnp.arange(n * 128, dtype=jnp.float32).reshape(n, 128)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((w, 128), lambda i, s: (0, 0)),
        scratch_shapes=[pltpu.VMEM((w, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((w, 128), jnp.float32),
    )(jnp.asarray([17], jnp.int32), x)


def p3_scalar_tile_control():
    nt, w = 8, 256

    def kernel(idx_ref, x_any, o_ref, buf, sem):
        t = idx_ref[0]
        pltpu.make_async_copy(x_any.at[t], buf, sem).start()
        pltpu.make_async_copy(x_any.at[t], buf, sem).wait()
        o_ref[...] = buf[...]

    x = jnp.arange(nt * w * 128, dtype=jnp.float32).reshape(nt, w, 128)
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((w, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((w, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((w, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(jnp.asarray([3], jnp.int32), x)


if __name__ == "__main__":
    probe("P3.scalar_tile_control", p3_scalar_tile_control)
    probe("P1.dynamic_ds_any", p1_dynamic_ds)
    probe("P2.prefetch_derived_offset", p2_prefetch_offset)
