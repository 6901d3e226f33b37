"""Ulysses sequence parallelism: all-to-all head<->sequence re-sharding.

The second of the two exact sequence-parallel attention strategies SURVEY
§2 lists as "ours to design" (the reference is single-node — its closest
artifact is the (l, m) merge algebra of src/dense.jl:82-89, which ring.py
generalizes). Ulysses takes the other trade: instead of rotating K/V
around the ring for P hops (P−1 ppermutes, compute split by hop), ONE
``all_to_all`` re-shards the activations from sequence-sharded
``(B, H, N/P, D)`` to head-sharded ``(B, H/P, N, D)``, the local fused
kernel runs over the FULL sequence with every schedule/bwd feature intact,
and a second all-to-all restores sequence sharding.

Per device per direction the all-to-all moves ``(P−1)/P · BHND/P``
elements vs the ring's ``(P−1)/P · 2·BHND`` total K/V traffic — Ulysses
wins on ICI bytes whenever heads ≥ P, and keeps attention a single kernel
launch (better MXU utilization than P banded hop kernels at small N/P).
The ring remains the choice when P > heads or when the KV cache itself
must stay sequence-sharded (ring_decode.py).

TPU-native structure: ``jax.lax.all_to_all(tiled=True)`` lowers to one
XLA AllToAll over ICI; the kernel between the two collectives is the
SAME differentiable Pallas family (ops/flash.py), and autodiff transposes
each all-to-all into its inverse — the backward is ring-free too.

Use inside ``jax.shard_map`` with q/k/v sharded over the sequence axis,
or via the ready-made :func:`ulysses_fa` wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from tpu_flash.ops import flash


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    *,
    schedule: str = "causal",
    radius: int = 0,
    section: int = 0,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
    q_dtype=None,
    kv_dtype=None,
):
    """Exact attention on sequence shards via head<->seq all-to-all.

    Call inside shard_map; q, k, v are the LOCAL shards ``(B, H, Nl, D)``
    of a global sequence of length ``P*Nl`` sharded over ``axis_name``.
    Q heads must be divisible by the axis size; K/V heads are repeated up
    to the Q head count first when they are not (GQA ratios that survive
    the split are kept sharded). Every flash schedule is available — the
    kernel sees the full sequence, so banded/block patterns need no ring
    shift algebra. Quantized dtypes route through the quantized kernel
    family (inference-only, like the quantized ring).

    Returns the local output shard ``(B, H, Nl, D)`` (input dtype).
    """
    p = lax.axis_size(axis_name)
    b, hq, nl, d = q.shape
    hkv = k.shape[1]
    if hq % p:
        raise ValueError(f"q heads {hq} not divisible by axis size {p}")
    if hkv % p:
        # GQA group too coarse for the head split: replicate K/V heads up
        # to the Q head count (the kernel then runs MHA per shard). The
        # a2a moves the repeated heads, trading ICI bytes for divisibility.
        k = jnp.repeat(k, hq // hkv, axis=1)
        v = jnp.repeat(v, hq // hkv, axis=1)

    a2a_fwd = functools.partial(
        lax.all_to_all, axis_name=axis_name, split_axis=1, concat_axis=2,
        tiled=True,
    )
    qg = a2a_fwd(q)  # (B, Hq/P, N, D)
    kg = a2a_fwd(k)
    vg = a2a_fwd(v)

    o = flash.flash_attention(
        qg, kg, vg, schedule=schedule, radius=radius, section=section,
        scale=scale, block_q=block_q, block_kv=block_kv,
        interpret=interpret, q_dtype=q_dtype, kv_dtype=kv_dtype,
    )
    # inverse re-shard: split the sequence back, gather the heads
    return lax.all_to_all(
        o, axis_name=axis_name, split_axis=2, concat_axis=1, tiled=True
    )


def ulysses_fa(
    mesh,
    *,
    schedule: str = "causal",
    radius: int = 0,
    section: int = 0,
    axis_name: str = "seq",
    scale: Optional[float] = None,
    block_q: int = 512,
    block_kv: int = 512,
    interpret: Optional[bool] = None,
    q_dtype=None,
    kv_dtype=None,
):
    """Build a jitted Ulysses attention fn over ``mesh`` (mirror of
    :func:`tpu_flash.parallel.ring.ring_dense_fa`).

    Returns ``fn(q, k, v)`` taking GLOBAL ``(B, H, N, D)`` arrays sharded
    (or shardable) over ``axis_name``; batch rides the ``data`` axis and
    heads the ``model`` axis when present in the mesh.
    """
    from jax.sharding import PartitionSpec as P

    axes = mesh.axis_names
    spec = P(
        "data" if "data" in axes else None,
        "model" if "model" in axes else None,
        axis_name,
        None,
    )

    def local_fn(q, k, v):
        return ulysses_attention(
            q, k, v, axis_name, schedule=schedule, radius=radius,
            section=section, scale=scale, block_q=block_q, block_kv=block_kv,
            interpret=interpret, q_dtype=q_dtype, kv_dtype=kv_dtype,
        )

    fn = jax.shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(fn)
