"""Multi-LoRA serving: per-request low-rank adapters over one base model.

Multi-tenant serving wants many fine-tunes sharing one deployment. LoRA
(low-rank adaptation) makes that a weights problem, not a models
problem: each adapter is a pair of rank-r factors per projection,
``W_eff = W + A @ B``, and the adapter bank for N tenants is just two
stacked tensors per projection — ``a: (N, in, r)`` and ``b: (N, r, out)``
— tiny next to the base weights (r ≪ min(in, out)).

The TPU-shaped part is HOW the delta applies in a continuously-batched
decode: different lanes run different adapters, so the engine gathers
each lane's factors (``a[ids]``: one cheap take along the adapter axis)
and adds ``(x @ a_g) @ b_g`` — two skinny einsums batched over lanes,
static shapes, no per-lane branching. ``adapter_id = -1`` means the base
model: the gather clamps to row 0 and the delta multiplies by 0, so
mixed base/adapter batches stay one jitted call.

Exactness contracts (tests/test_lora.py): zero-initialized adapters
change nothing (B starts at 0, the standard LoRA init); a served adapter
equals the same request run on a model with ``W + A @ B`` merged into
the dense weights offline.

Scope: the attention projections (wq/wk/wv/wo) — the standard serving
deployment; the engine threads per-lane ids through prefill, chunked
prefill, decode, and the speculative verify (the draft stays base: the
target's verification, not the draft's proposals, defines correctness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

TARGETS = ("wq", "wk", "wv", "wo")


def init_lora_bank(key, cfg, num_adapters: int, rank: int,
                   targets=TARGETS, scale: float = 1.0):
    """Adapter bank: per layer, per target, stacked low-rank factors.

    ``a`` ~ N(0, 1/rank) and ``b`` = 0 — the standard init, so a freshly
    created bank is an exact no-op. ``scale`` (classic alpha/r) is folded
    into ``b`` once here rather than multiplied every step.
    """
    dt = jnp.dtype(cfg.dtype)
    dims = dict(
        wq=(cfg.dim, cfg.q_dim),
        wk=(cfg.dim, cfg.kv_dim),
        wv=(cfg.dim, cfg.kv_dim),
        wo=(cfg.q_dim, cfg.dim),
    )
    del scale  # folded into b when training writes it; zeros at init
    layers = []
    for li in range(cfg.num_layers):
        key, sub = jax.random.split(key)
        layer = {}
        for t in targets:
            fan_in, fan_out = dims[t]
            key, ka = jax.random.split(key)
            layer[t] = dict(
                a=(jax.random.normal(ka, (num_adapters, fan_in, rank),
                                     jnp.float32) / rank).astype(dt),
                b=jnp.zeros((num_adapters, rank, fan_out), dt),
            )
        layers.append(layer)
    return layers


def lora_mm(x, w, entry, adapter_ids):
    """``x @ w`` plus the per-lane adapter delta.

    x: ``(B, n, in)``; entry: {"a": (N, in, r), "b": (N, r, out)};
    adapter_ids: ``(B,)`` int32, −1 = base model (delta suppressed).
    Weight-quantized base matrices compose (the delta adds after the
    dequantized matmul).
    """
    from tpu_flash.models.transformer import _mm

    y = _mm(x, w)
    if entry is None:
        return y
    ids = jnp.clip(adapter_ids, 0, entry["a"].shape[0] - 1)
    on = (adapter_ids >= 0).astype(y.dtype)[:, None, None]
    a_g = entry["a"][ids]  # (B, in, r)
    b_g = entry["b"][ids]  # (B, r, out)
    delta = jnp.einsum("bnr,bro->bno",
                       jnp.einsum("bni,bir->bnr", x, a_g), b_g)
    return y + delta * on


def merge_lora(params, bank, adapter: int):
    """Offline-merged dense weights for ONE adapter — the exactness
    oracle: serving adapter k must equal running the merged model."""
    out_layers = []
    for layer, lora in zip(params["layers"], bank):
        l2 = dict(layer)
        for t, entry in lora.items():
            w = layer[t]
            if isinstance(w, dict):
                raise ValueError("merge onto weight-quantized params is "
                                 "not supported; merge before quantizing")
            delta = (entry["a"][adapter].astype(jnp.float32)
                     @ entry["b"][adapter].astype(jnp.float32))
            l2[t] = (w.astype(jnp.float32) + delta).astype(w.dtype)
        out_layers.append(l2)
    return {**params, "layers": out_layers}
