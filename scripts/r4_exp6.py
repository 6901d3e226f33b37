"""Round-4 experiment 6: backward floor decomposition + tile sweep.

VERDICT r3 item 4: dense fwd+bwd sits at 137–140 TFLOP/s d=128 (~70% of
the forward's roofline fraction) and never got round 3's big-tile /
packing treatment. Two parts:

A. Decomposition at the shipped blocks: time jax.grad with
   force_bwd_parts ∈ {none, dq, dkv, both} (flash_bwd.py) — "none" is
   forward + delta only, so the dq and dkv kernels' serial costs fall
   out by subtraction (the dq-vs-dkv split the verdict asked for).

B. Sweep (bq, bkv) x bhb over the dense fwd+bwd at 8k d=128, grad-gated
   against the checkpointed blockwise-oracle grads (the bench suite's
   recipe), plus the square-tile + packing corner the r4_exp3 forward
   sweep found. split>1 measured a no-op in r3 (DESIGN §20) and stays 1.

Writes logs/r4_exp6.jsonl.
"""

import functools
import json
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

from tpu_flash.bench.harness import attention_flops, time_fn
from tpu_flash.ops.flash import dense_fa, force_bh_block
from tpu_flash.ops.flash_bwd import force_bwd_parts
from tpu_flash.ops.oracle import blockwise_dpa

LOG = open("/root/repo/logs/r4_exp6.jsonl", "a")


def row(**kw):
    LOG.write(json.dumps(kw) + "\n")
    LOG.flush()
    print("  " + json.dumps(kw), file=sys.stderr, flush=True)


def main():
    b, h, n, d = 1, 8, 8192, 128
    fl = attention_flops(b, h, n, n, d, backward=True)
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.bfloat16)
               for _ in range(3))

    @jax.jit
    def oracle_grads(q, k, v):
        def loss(q, k, v):
            o, _ = blockwise_dpa(q, k, v)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    want = jax.block_until_ready(oracle_grads(q, k, v))
    wmax = max(float(jnp.max(jnp.abs(w))) for w in want)

    def grad_fn(bq, bkv):
        @jax.jit
        def fwdbwd(q, k, v):
            def loss(q, k, v):
                o = dense_fa(q, k, v, block_q=bq, block_kv=bkv)
                return jnp.sum(o.astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        return fwdbwd

    import os

    if os.environ.get("R4_EXP6_PHASE", "1") == "1":
        # ---- A. decomposition at the (new) default blocks 1024x1024
        for parts in ("both", "dq", "dkv", "none"):
            with force_bwd_parts(parts):
                fn = grad_fn(1024, 1024)
                t = time_fn(fn, q, k, v, iters=5)
            row(tag=f"decomp.bq1024.bkv1024.{parts}", ms=round(t * 1e3, 3))
        # ---- B. tile x packing sweep, grad-gated per config
        tiles = [(512, 512), (512, 1024), (1024, 512), (1024, 1024),
                 (1024, 2048), (2048, 1024), (2048, 2048), (4096, 1024)]
    elif os.environ.get("R4_EXP6_PHASE") == "2":
        # Phase 2 (after flash_bwd gained demand-sized grants): the rows
        # phase 1 lost to under-grants — the square-tile + packing corner
        # that won the forward sweep.
        tiles = [(512, 1024), (1024, 1024), (1024, 2048), (2048, 1024),
                 (2048, 2048), (4096, 1024)]
    else:
        # Phase 3: per-pass isolation INSIDE each backward kernel at the
        # measured-best blocks (2048², phase 2) — pins the ~2.1 ms gap to
        # the MXU dots-ideal on a term (exp2 / ds / the TN dk and dv
        # dots), the way DESIGN §20 did for the forward.
        from tpu_flash.ops.flash_bwd import force_bwd_isolate

        for parts in ("dq", "dkv"):
            for iso in ("", "noexp", "nods", "nodk", "nodv"):
                if parts == "dq" and iso in ("nodk", "nodv"):
                    continue
                with force_bwd_parts(parts), force_bwd_isolate(iso):
                    fn = grad_fn(2048, 2048)
                    t = time_fn(fn, q, k, v, iters=5)
                row(tag=f"iso.bq2048.bkv2048.{parts}.{iso or 'full'}",
                    ms=round(t * 1e3, 3))
        return
    best = (0.0, None)
    for bq, bkv in tiles:
        for bhb in (1, 2, 4):
            if (b * h) % bhb:
                continue
            tag = f"sweep.bq{bq}.bkv{bkv}.bhb{bhb}"
            fn = grad_fn(bq, bkv)
            try:
                with force_bh_block(bhb):
                    got = jax.block_until_ready(fn(q, k, v))
                    rel = max(
                        float(jnp.max(jnp.abs(
                            g.astype(jnp.float32) - w.astype(jnp.float32))))
                        for g, w in zip(got, want)) / max(wmax, 1.0)
                    if not rel <= 2.5e-2:
                        row(tag=tag, error=f"gate rel={rel}")
                        continue
                    t = time_fn(fn, q, k, v, iters=5)
            except Exception as e:  # noqa: BLE001
                row(tag=tag, error=str(e)[:160])
                continue
            tf = fl / t / 1e12
            row(tag=tag, ms=round(t * 1e3, 3), tflops=round(tf, 2),
                rel_err=round(rel, 6))
            if tf > best[0]:
                best = (tf, (bq, bkv, bhb))
    if best[1]:
        bq, bkv, bhb = best[1]
        row(tag="best", tflops=best[0], bq=bq, bkv=bkv, bhb=bhb)


if __name__ == "__main__":
    main()
