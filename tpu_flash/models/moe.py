"""Mixture-of-Experts MLP with expert parallelism (EP).

SURVEY §2 lists EP among the parallelism strategies absent from the
single-node reference and "to be designed fresh" for the TPU build. This
is the canonical TPU formulation (GShard/Switch lineage): routing is
expressed as dense one-hot *dispatch* and *combine* einsums with a static
per-expert capacity, so every shape is compile-time constant — no sorting,
no ragged gathers, nothing the MXU can't tile. Expert parallelism is then
pure sharding: the expert-major weight tensors ``(E, d, h)`` partition
over an ``expert`` mesh axis and XLA inserts the all-to-all/reduce
collectives around the dispatch einsums (see ``expert_pspecs``).

Top-k routing, k∈{1,2}: softmax router, iterative argmax choices, each
choice's tokens counted into per-expert positions (choice 0 fills first,
GShard priority order); tokens whose position exceeds the capacity
``ceil(k·N/E · capacity_factor)`` are dropped (contribute zero — the
residual stream carries them). Kept gates renormalize to sum 1. The
Switch load-balance aux loss ``E · Σ_e f_e · p̄_e`` is returned for the
trainer to weight.

Serving note: capacity drops are BATCH-dependent — a token that overflows
in a batched prefill routes alone (and is kept) during decode, so dropful
configs are not prefix-consistent. For serving, pick
``capacity_factor ≥ E/top_k``: then capacity ≥ N and (since top-k choices
are distinct experts) no token can ever drop, making decode bit-consistent
with teacher-forced forward. Training typically keeps the classic ~1.25.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def init_moe_params(key, dim: int, hidden: int, num_experts: int, dtype):
    """Router + expert-major SwiGLU weights for one MoE layer."""
    kr, kg, ku, kd = jax.random.split(key, 4)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32)
                / math.sqrt(fan_in)).astype(dtype)

    return dict(
        # router stays genuinely f32 (no round-trip through the model dtype:
        # bf16-rounded logits can flip near-tie expert choices)
        wr=jax.random.normal(kr, (dim, num_experts), jnp.float32)
        / math.sqrt(dim),
        w_gate=dense(kg, dim, (num_experts, dim, hidden)),
        w_up=dense(ku, dim, (num_experts, dim, hidden)),
        w_down=dense(kd, hidden, (num_experts, hidden, dim)),
    )


def expert_pspecs():
    """PartitionSpecs sharding one MoE layer over an ``expert`` mesh axis
    (router replicated; expert-major tensors split on the expert dim).
    Compose with TP by adding "model" on the hidden dim:
    ``P("expert", None, "model")`` for w_gate/w_up and
    ``P("expert", "model", None)`` for w_down."""
    from jax.sharding import PartitionSpec as P

    return dict(
        wr=P(),
        w_gate=P("expert", None, None),
        w_up=P("expert", None, None),
        w_down=P("expert", None, None),
    )


def route_topk(logits, top_k: int, capacity: int):
    """GShard top-k routing → (dispatch, combine, aux_loss).

    logits: (B, N, E) f32. Returns dispatch (B, N, E, C) one-hot {0,1},
    combine (B, N, E, C) gate-weighted, and the Switch balance loss.
    Position accounting runs over the token axis per batch row; choice j
    fills positions only after all of choice j−1's tokens (priority order),
    so a token's second expert never evicts another token's first.
    """
    b, n, e = logits.shape
    if top_k > e:
        raise ValueError(f"top_k={top_k} exceeds num_experts={e}")
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    masks, gates = [], []
    p = probs
    for _ in range(top_k):
        idx = jnp.argmax(p, axis=-1)
        m = jax.nn.one_hot(idx, e, dtype=jnp.float32)  # (B, N, E)
        masks.append(m)
        gates.append(jnp.sum(probs * m, axis=-1))      # (B, N)
        p = p * (1.0 - m)

    # positions: running per-expert fill count, choices in priority order.
    # Later choices offset by the POST-truncation count of earlier choices
    # (GShard semantics) — a dropped choice-0 token must not waste a
    # capacity slot that a choice-1 token could fill.
    counts = jnp.zeros((b, 1, e), jnp.float32)
    kept_masks, positions = [], []
    for m in masks:
        pos = jnp.cumsum(m, axis=1) - m + counts        # (B, N, E)
        pos_tok = jnp.sum(pos * m, axis=-1)             # (B, N)
        keep = (pos_tok < capacity).astype(jnp.float32)
        km = m * keep[..., None]
        kept_masks.append(km)
        positions.append(pos_tok)
        counts = counts + jnp.sum(km, axis=1, keepdims=True)

    # renormalize the kept gates to sum 1 per token (0-token rows stay 0)
    kept_gate = [g * jnp.sum(km, -1) for g, km in zip(gates, kept_masks)]
    denom = sum(kept_gate)
    denom = jnp.where(denom > 0, denom, 1.0)

    dispatch = jnp.zeros((b, n, e, capacity), jnp.float32)
    combine = jnp.zeros((b, n, e, capacity), jnp.float32)
    for km, pos_tok, g in zip(kept_masks, positions, kept_gate):
        oh = km[..., None] * jax.nn.one_hot(
            pos_tok.astype(jnp.int32), capacity, dtype=jnp.float32
        )[:, :, None, :]                                # (B, N, E, C)
        dispatch = dispatch + oh
        combine = combine + oh * (g / denom)[..., None, None]

    # Switch aux: E · Σ_e (fraction of tokens whose TOP choice is e) · p̄_e
    frac = jnp.mean(masks[0], axis=(0, 1))
    pbar = jnp.mean(probs, axis=(0, 1))
    aux = e * jnp.sum(frac * pbar)
    return dispatch, combine, aux


def moe_mlp(layer, h, *, top_k: int = 2, capacity_factor: float = 1.25):
    """MoE SwiGLU block: h (B, N, dim) → (out (B, N, dim), aux_loss).

    All-einsum dispatch (static shapes): tokens gather into per-expert
    capacity slots, the three expert matmuls run batched over the expert
    axis (one big MXU-friendly contraction each), and the combine einsum
    scatters weighted results back onto the token axis.
    """
    b, n, d = h.shape
    e = layer["w_gate"].shape[0]
    capacity = max(1, math.ceil(top_k * n / e * capacity_factor))

    logits = h.astype(jnp.float32) @ layer["wr"]        # (B, N, E)
    dispatch, combine, aux = route_topk(logits, top_k, capacity)
    dispatch = dispatch.astype(h.dtype)

    xe = jnp.einsum("bnec,bnd->becd", dispatch, h)      # (B, E, C, d)
    g = jnp.einsum("becd,edh->bech", xe, layer["w_gate"])
    u = jnp.einsum("becd,edh->bech", xe, layer["w_up"])
    act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(h.dtype)
    y = jnp.einsum("bech,ehd->becd", act, layer["w_down"])  # (B, E, C, d)
    out = jnp.einsum("bnec,becd->bnd", combine.astype(h.dtype), y)
    return out, aux
