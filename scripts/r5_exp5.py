"""Round-5 experiment 5: element-offset band kernel A/B (DESIGN §22 r5).

The r5 libtpu probe (logs/r5_band_probe.jsonl) showed dynamic `pl.ds`
element offsets on ANY-space DMA sources now compile and run — the exact
capability whose absence forced aligned kv tiles and the 2.5× coverage
inflation that pins the band forward at 1.92 ms vs the 0.70 ms covered
ideal. `band_pipeline(True, sub=..., elem=True)` now starts each q
block's kv slab at its exact band_lo.

Cases (sliding/circulant w=1025 @8k d=128 b4·h8, the §22 shape):
  A: shipped BlockSpec default (control; bound-max on per r4 default);
  B: pipeline kernel, TILE mode sub=512 (the r3 control — the pipeline
     kernel itself measured slower than BlockSpec at equal coverage);
  C: pipeline kernel, ELEM mode sub=512, bq512, bhb {2 (auto), 4, 8};
  D: elem sub=256 bq256 bhb8 (smaller slabs are affordable at 1.0x
     coverage);
  E: elem sub=512 bq1024 (deeper per-instance amortization);
  F: circulant shipped control + elem best-of-C config.

Every row oracle-gated (blockwise f32) before timing.
Writes logs/r5_exp5.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import time_fn
from tpu_flash.ops.flash import (
    band_pipeline,
    flash_attention,
    force_bh_block,
)
from tpu_flash.ops.oracle import blockwise_dpa

LOG = open("/root/repo/logs/r5_exp5.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def band_case(tag, sched_name, radius, b, h, n, d, bq, bkv, bhb,
              pipeline, sub=None, elem=False, iters=20):
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))
    w = 2 * radius + 1
    fl = 4 * b * h * n * min(w, n) * d
    fn = jax.jit(functools.partial(
        flash_attention, schedule=sched_name, radius=radius,
        block_q=bq, block_kv=bkv))
    try:
        ctx_bhb = force_bh_block(bhb) if bhb else force_bh_block(None)
        with ctx_bhb, band_pipeline(pipeline, sub=sub, elem=elem):
            got = jax.block_until_ready(fn(q, k, v))
            want, _ = jax.block_until_ready(jax.jit(functools.partial(
                blockwise_dpa, window_size=w,
                wrap=(sched_name == "circulant"), chunk=1024))(q, k, v))
            err = float(jnp.max(jnp.abs(
                got.astype(jnp.float32) - want.astype(jnp.float32))))
            if not err <= 5e-3:
                row(tag=tag, error=f"gate {err}")
                return
            t = time_fn(fn, q, k, v, iters=iters)
    except Exception as e:  # noqa: BLE001
        row(tag=tag, error=str(e)[:200])
        return
    row(tag=tag, ms=round(t * 1e3, 3),
        tflops_covered=round(fl / t / 1e12, 2), err=round(err, 6))


def main():
    B, H, N, D, R = 4, 8, 8192, 128, 512
    # A: shipped default (BlockSpec path, frozen tiles/packing/bound-max)
    band_case("A.sliding.shipped", "sliding", R, B, H, N, D,
              None, None, None, pipeline=None)
    # B: r3 tile-mode pipeline control
    band_case("B.sliding.pipe.tile.sub512", "sliding", R, B, H, N, D,
              512, 1024, None, pipeline=True, sub=512, elem=False)
    # C: elem mode, bq512/sub512, packing ladder
    for bhb in (None, 4, 8):
        band_case(f"C.sliding.elem.sub512.bq512.bhb{bhb or 'auto'}",
                  "sliding", R, B, H, N, D, 512, 1024, bhb,
                  pipeline=True, sub=512, elem=True)
    # D: smaller slabs at exact coverage
    band_case("D.sliding.elem.sub256.bq256.bhb8", "sliding", R, B, H, N, D,
              256, 1024, 8, pipeline=True, sub=256, elem=True)
    band_case("D.sliding.elem.sub256.bq512.bhb8", "sliding", R, B, H, N, D,
              512, 1024, 8, pipeline=True, sub=256, elem=True)
    # E: deeper per-instance amortization
    band_case("E.sliding.elem.sub512.bq1024.bhb4", "sliding", R, B, H, N, D,
              1024, 1024, 4, pipeline=True, sub=512, elem=True)
    # F: circulant
    band_case("F.circulant.shipped", "circulant", R, B, H, N, D,
              None, None, None, pipeline=None)
    band_case("F.circulant.elem.sub512.bq512.bhb8", "circulant", R, B, H,
              N, D, 512, 1024, 8, pipeline=True, sub=512, elem=True)


if __name__ == "__main__":
    main()
