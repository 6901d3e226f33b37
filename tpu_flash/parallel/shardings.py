"""Tensor-parallel serving over a mesh ``model`` axis.

The reference has no multi-device execution at all (SURVEY.md §2: absent by
construction). The engine scales Megatron-style: attention heads and the MLP
hidden dim shard over ``model`` (column-parallel wq/wk/wv/w_gate/w_up,
row-parallel wo/w_down, one ``psum`` after each row-parallel matmul, riding
ICI), and the paged KV-cache shards over its ``kv_heads`` axis so each chip
stores and attends only its own heads' pages.

Because the hot ops are Pallas kernels — which GSPMD cannot partition — the
engine's jitted entry points are wrapped in ``shard_map`` with the
PartitionSpec trees built here; the model code completes the row-parallel
products with explicit ``lax.psum`` (``tp_axis`` arg in models/transformer).
"""

from __future__ import annotations

import dataclasses

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_pspecs(params, axis: str = "model"):
    """PartitionSpec pytree for a transformer param tree.

    Handles both raw matrices and int8 weight-quantized entries
    ({"q": int8 (in, out), "s": f32 (out,)}): column-parallel weights shard
    their per-output-channel scales with the columns; row-parallel scales
    replicate (they index the unsharded output dim).
    """
    col = P(None, axis)   # (dim, sharded_out)
    row = P(axis, None)   # (sharded_in, dim)

    def wspec(w, spec, s_spec):
        if isinstance(w, dict):
            return {"q": spec, "s": s_spec}
        return spec

    def layer(l):
        d = dict(
            wq=wspec(l["wq"], col, P(axis)),
            wk=wspec(l["wk"], col, P(axis)),
            wv=wspec(l["wv"], col, P(axis)),
            wo=wspec(l["wo"], row, P()),
            ln_attn=P(), ln_mlp=P(),
        )
        if "wr" in l:
            # MoE layer: the expert bank replicates under the TP `model`
            # axis — each shard computes the full (replicated-activation)
            # MoE MLP, so no psum is needed and TP still shards attention.
            # Expert-dim parallelism composes separately via an `expert`
            # mesh axis (models/moe.py expert_pspecs), not this one.
            d.update(wr=P(), w_gate=P(), w_up=P(), w_down=P())
        else:
            d.update(
                w_gate=wspec(l["w_gate"], col, P(axis)),
                w_up=wspec(l["w_up"], col, P(axis)),
                w_down=wspec(l["w_down"], row, P()),
            )
        return d

    return dict(
        embed=P(),  # replicated: the unembed matmul needs full vocab rows
        ln_f=P(),
        layers=[layer(l) for l in params["layers"]],
    )


def cache_pspecs(cache, axis: str = "model"):
    """PartitionSpec tree shaped like a PagedKVCache (kv_heads sharded)."""
    quant = cache.k_scales is not None
    return dataclasses.replace(
        cache,
        k_pages=P(axis, None, None, None),
        v_pages=P(axis, None, None, None),
        k_scales=P(axis, None, None) if quant else None,
        v_scales=P(axis, None, None) if quant else None,
        page_tables=P(),
        lengths=P(),
    )


def shard_engine_state(mesh: Mesh, params, caches, axis: str = "model"):
    """device_put params and caches to their TP shardings.

    Requires q_heads, kv_heads and mlp hidden divisible by the axis size.
    """
    psh = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        param_pspecs(params, axis),
        is_leaf=lambda x: isinstance(x, P),
    )
    params = jax.tree_util.tree_map(jax.device_put, params, psh)
    out = []
    for c in caches:
        spec_tree = cache_pspecs(c, axis)
        kw = {}
        for f in ("k_pages", "v_pages", "k_scales", "v_scales",
                  "page_tables", "lengths"):
            val, spec = getattr(c, f), getattr(spec_tree, f)
            kw[f] = (jax.device_put(val, NamedSharding(mesh, spec))
                     if val is not None else None)
        out.append(dataclasses.replace(c, **kw))
    return params, out
