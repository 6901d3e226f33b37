"""Flagship model: a llama-style transformer LM driving the kernel family.

The reference is a kernel study with no model; the north star wires the
kernels into an inference engine, so this is the vehicle: RMSNorm → GQA
attention (prefill via the causal flash kernel, decode via the paged kernel)
→ SwiGLU, RoPE positions, tied embeddings. Pure functional JAX (params are
an explicit pytree) so pjit/shard_map sharding is transparent — no module
framework in the hot path.

Sliding-window attention per layer is supported (``attention="sliding"``)
to exercise the banded schedules in a real model, mirroring how the
reference's windowed kernels would be deployed.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_flash.ops import flash
from tpu_flash.ops.paged import paged_attention


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 32000
    dim: int = 1024
    num_layers: int = 8
    num_q_heads: int = 8
    num_kv_heads: int = 4
    head_dim: int = 128
    mlp_hidden: Optional[int] = None
    rope_theta: float = 10000.0
    dtype: str = "bfloat16"
    attention: str = "causal"  # causal | sliding
    window: int = 1025  # odd; used when attention == "sliding"
    block_q: int = 256
    block_kv: int = 256
    # Mixture-of-Experts MLP (models/moe.py): 0 = dense SwiGLU; >0 makes
    # every layer's MLP a top-k routed expert bank, EP-shardable over an
    # `expert` mesh axis via moe.expert_pspecs().
    moe_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    # Attention max strategy: None = the kernel library's measured auto
    # (causal keeps the exact max: the norm bound measured +14% forward,
    # 105.5 → 120.0 TFLOP/s @8k, but 2-6× gradient-error amplification
    # at small n — DESIGN §22, logs/r4_exp9.jsonl). True opts causal
    # into the bound for inference-only forwards. The serving engine
    # pins False: the BOUND depends on the kv span each kernel call
    # sees, and the engine's chunked-vs-unchunked prefill must be
    # bit-identical.
    attn_bound_max: Optional[bool] = None

    @property
    def hidden(self) -> int:
        if self.mlp_hidden is not None:
            return self.mlp_hidden
        # llama-style 2/3·4d, rounded to 256 lanes
        h = int(8 * self.dim / 3)
        return (h + 255) // 256 * 256

    @property
    def q_dim(self) -> int:
        return self.num_q_heads * self.head_dim

    @property
    def kv_dim(self) -> int:
        return self.num_kv_heads * self.head_dim


def init_params(key, cfg: ModelConfig):
    dt = jnp.dtype(cfg.dtype)
    keys = jax.random.split(key, cfg.num_layers + 2)

    def dense(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(dt)

    layers = []
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], 8)
        layer = dict(
            wq=dense(lk[0], cfg.dim, (cfg.dim, cfg.q_dim)),
            wk=dense(lk[1], cfg.dim, (cfg.dim, cfg.kv_dim)),
            wv=dense(lk[2], cfg.dim, (cfg.dim, cfg.kv_dim)),
            wo=dense(lk[3], cfg.q_dim, (cfg.q_dim, cfg.dim)),
            ln_attn=jnp.ones((cfg.dim,), jnp.float32),
            ln_mlp=jnp.ones((cfg.dim,), jnp.float32),
        )
        if cfg.moe_experts > 0:
            from tpu_flash.models.moe import init_moe_params

            layer.update(init_moe_params(
                lk[7], cfg.dim, cfg.hidden, cfg.moe_experts, dt))
        else:
            layer.update(
                w_gate=dense(lk[4], cfg.dim, (cfg.dim, cfg.hidden)),
                w_up=dense(lk[5], cfg.dim, (cfg.dim, cfg.hidden)),
                w_down=dense(lk[6], cfg.hidden, (cfg.hidden, cfg.dim)),
            )
        layers.append(layer)
    return dict(
        embed=(jax.random.normal(keys[-2], (cfg.vocab_size, cfg.dim), jnp.float32) * 0.02).astype(dt),
        ln_f=jnp.ones((cfg.dim,), jnp.float32),
        layers=layers,
    )


def quantize_weights(params, dtype: str = "int8"):
    """Per-output-channel symmetric int8 quantization of every projection
    matrix (wq/wk/wv/wo/w_gate/w_up/w_down). Embeddings and norms stay high
    precision (the unembed needs full vocab rows; norms are tiny).

    Decode is weight-streaming-bound (measured at the bf16 HBM floor), so
    halving weight bytes buys decode latency directly; the matmul runs as
    (x @ w_int8→bf16)·s — the per-column scale commutes out of the dot.
    """
    if dtype != "int8":
        raise ValueError("only int8 weight quantization is supported")

    from tpu_flash.quant.qarray import quantize as _quantize

    def quant(w):
        qa = _quantize(w, jnp.int8, axis=0)  # per-output-channel
        return {"q": qa.values, "s": qa.scales[0].astype(jnp.float32)}

    layers = []
    for l in params["layers"]:
        l2 = dict(l)
        for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
            # MoE layers carry 3-D expert-major MLP tensors (and no dense
            # w_gate/...); those stay high precision — only the 2-D
            # projections stream-quantize.
            if name in l and not isinstance(l[name], dict) and l[name].ndim == 2:
                l2[name] = quant(l[name])
        layers.append(l2)
    return {**params, "layers": layers}


def _proj(x, w, lora_layer, name, adapter_ids):
    """Projection matmul with an optional per-lane LoRA delta
    (models/lora.py). No adapter bank or no entry for this projection →
    plain _mm."""
    entry = lora_layer.get(name) if lora_layer else None
    if entry is None:
        return _mm(x, w)
    from tpu_flash.models.lora import lora_mm

    return lora_mm(x, w, entry, adapter_ids)


def _mm(x, w):
    """x @ w for raw or weight-quantized ({"q": int8, "s": f32}) matrices."""
    if isinstance(w, dict):
        y = x @ w["q"].astype(x.dtype)
        return y * w["s"].astype(x.dtype)
    return x @ w


def rmsnorm(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (x32 * scale * w).astype(x.dtype)


def _rope_angles(positions, head_dim, theta):
    # positions: (..., n) int32 → cos/sin (..., n, head_dim/2)
    half = head_dim // 2
    freqs = theta ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x, positions, theta):
    """x: (..., n, heads, head_dim); positions: (..., n)."""
    head_dim = x.shape[-1]
    cos, sin = _rope_angles(positions, head_dim, theta)  # (..., n, hd/2)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1)
    return out.astype(x.dtype)


def _attn_full(q, k, v, cfg: ModelConfig, attn_fn=None):
    """Full-sequence attention (training / prefill). q: (B, N, QH, D).

    ``attn_fn``, when given, replaces the local kernel with a custom
    implementation on (B, H, N, D) tensors — e.g. a shard_map-wrapped
    ring attention for sequence-parallel training (see __graft_entry__).
    """
    qt = jnp.swapaxes(q, 1, 2)  # (B, H, N, D)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if attn_fn is not None:
        # custom fns (e.g. shard_map ring attention) expect matched heads
        g = qt.shape[1] // kt.shape[1]
        if g > 1:
            kt = jnp.repeat(kt, g, axis=1)
            vt = jnp.repeat(vt, g, axis=1)
        o = attn_fn(qt, kt, vt)
    elif cfg.attention == "sliding":
        o = flash.sliding_fa(
            qt, kt, vt, cfg.window, causal=True,
            block_q=cfg.block_q, block_kv=cfg.block_kv,
            bound_max=cfg.attn_bound_max,
        )
    else:
        o = flash.dense_fa(
            qt, kt, vt, causal=True, block_q=cfg.block_q,
            block_kv=cfg.block_kv, bound_max=cfg.attn_bound_max,
        )
    return jnp.swapaxes(o, 1, 2)  # (B, N, H, D)


def _psum(x, tp_axis):
    return jax.lax.psum(x, tp_axis) if tp_axis else x


def _check_serving_moe(cfg: ModelConfig):
    """Serving paths require the drop-free MoE capacity factor.

    Capacity drops are batch-dependent (models/moe.py docstring): a token
    that overflows in a batched prefill routes alone during decode, so a
    dropful config silently produces decode tokens inconsistent with the
    teacher-forced forward. cf >= E/top_k guarantees zero drops."""
    if cfg.moe_experts > 0:
        need = cfg.moe_experts / cfg.moe_top_k
        if cfg.moe_capacity_factor < need:
            raise ValueError(
                f"serving an MoE model needs the drop-free capacity factor "
                f"moe_capacity_factor >= E/top_k = {need} (got "
                f"{cfg.moe_capacity_factor}); dropful routing is not "
                f"prefix-consistent between batched prefill and decode")


def _mlp(params, h, cfg: ModelConfig, tp_axis=None, collect_aux=None):
    """MLP residual branch: dense SwiGLU, or the MoE expert bank when the
    layer carries a router (``wr``). MoE aux (balance) losses append to
    ``collect_aux`` when given; EP needs no psum here — expert collectives
    are XLA's, inserted around the dispatch einsums by sharding."""
    if "wr" in params:
        from tpu_flash.models.moe import moe_mlp

        out, aux = moe_mlp(
            params, h, top_k=cfg.moe_top_k,
            capacity_factor=cfg.moe_capacity_factor,
        )
        if collect_aux is not None:
            collect_aux.append(aux)
        return out
    gate = jax.nn.silu(_mm(h, params["w_gate"]).astype(jnp.float32)).astype(h.dtype)
    return _psum(_mm(gate * _mm(h, params["w_up"]), params["w_down"]), tp_axis)


def _block(params, x, positions, cfg: ModelConfig, collect_kv=None,
           attn_fn=None, tp_axis=None, collect_aux=None, lora_layer=None,
           adapter_ids=None):
    # Head counts derive from the (possibly TP-sharded) projection widths,
    # not cfg — inside shard_map each shard owns q_heads/tp heads and the
    # row-parallel matmuls are completed by one psum each (Megatron TP).
    b, n, _ = x.shape
    h = rmsnorm(x, params["ln_attn"])
    qp = _proj(h, params["wq"], lora_layer, "wq", adapter_ids)
    kp = _proj(h, params["wk"], lora_layer, "wk", adapter_ids)
    vp = _proj(h, params["wv"], lora_layer, "wv", adapter_ids)
    qh = qp.shape[-1] // cfg.head_dim
    kvh = kp.shape[-1] // cfg.head_dim
    q = qp.reshape(b, n, qh, cfg.head_dim)
    k = kp.reshape(b, n, kvh, cfg.head_dim)
    v = vp.reshape(b, n, kvh, cfg.head_dim)
    q = apply_rope(q, positions, cfg.rope_theta)
    k = apply_rope(k, positions, cfg.rope_theta)
    if collect_kv is not None:
        collect_kv.append((k, v))
    o = _attn_full(q, k, v, cfg, attn_fn=attn_fn).reshape(b, n, qh * cfg.head_dim)
    x = x + _psum(_proj(o, params["wo"], lora_layer, "wo", adapter_ids),
                  tp_axis)
    h = rmsnorm(x, params["ln_mlp"])
    x = x + _mlp(params, h, cfg, tp_axis=tp_axis, collect_aux=collect_aux)
    return x


def forward(params, tokens, cfg: ModelConfig, positions=None, attn_fn=None,
            tp_axis=None, collect_aux=None):
    """Full causal forward: tokens (B, N) int32 → logits (B, N, vocab) f32."""
    b, n = tokens.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    x = params["embed"][tokens]
    for layer in params["layers"]:
        x = _block(layer, x, positions, cfg, attn_fn=attn_fn, tp_axis=tp_axis,
                   collect_aux=collect_aux)
    x = rmsnorm(x, params["ln_f"])
    return (x @ params["embed"].T).astype(jnp.float32)


def loss_fn(params, tokens, cfg: ModelConfig, attn_fn=None,
            moe_aux_coef: float = 0.01):
    """Next-token cross entropy — the training objective used by the
    multi-chip dry run and any fine-tuning use. MoE models add the
    Switch balance loss, weighted by ``moe_aux_coef``."""
    aux = []
    logits = forward(params, tokens[:, :-1], cfg, attn_fn=attn_fn,
                     collect_aux=aux)
    targets = tokens[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)
    loss = jnp.mean(nll)
    if aux:
        loss = loss + moe_aux_coef * sum(aux) / len(aux)
    return loss


def prefill(params, tokens, cfg: ModelConfig, tp_axis=None):
    """Forward over the prompt, returning last-position logits and the
    per-layer rotated K/V to seed the paged cache.

    Returns (logits (B, vocab), kv: list of (k, v) each (B, N, KVH, D)).
    """
    _check_serving_moe(cfg)
    b, n = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    x = params["embed"][tokens]
    kv = []
    for layer in params["layers"]:
        x = _block(layer, x, positions, cfg, collect_kv=kv, tp_axis=tp_axis)
    x = rmsnorm(x, params["ln_f"])
    logits = (x[:, -1] @ params["embed"].T).astype(jnp.float32)
    return logits, kv


def prefill_chunk(params, tokens, offset, true_len, caches, slot,
                  cfg: ModelConfig, pages_bound=None, tp_axis=None,
                  lora=None, adapter_ids=None):
    """Process ONE page-aligned chunk of a prompt against the paged cache.

    Chunked prefill keeps long prompts from blocking the decode batch: the
    engine interleaves one chunk per step. Per layer, the chunk attends the
    already-cached prefix through the paged decode kernel (every chunk token
    rides a batch lane) and itself through the causal flash kernel; the two
    partials merge with the (o, lse) algebra — the reference's column-tile
    merge (src/dense.jl:82-89) applied across the prefix/chunk split.

    tokens: ``(1, C)`` int32, padded to the chunk bucket; ``offset`` (traced
    scalar) is the chunk's first position (page-aligned); ``true_len`` the
    number of real tokens in it. Returns ``(logits (1, C, vocab) f32,
    greedy_last int32, new_caches)`` — ``greedy_last`` is the argmax token
    after the last REAL position (used on the final chunk).
    """
    _check_serving_moe(cfg)
    from tpu_flash.parallel.ring import merge_partials

    b, C = tokens.shape
    positions = offset + jnp.arange(C, dtype=jnp.int32)[None, :]
    x = params["embed"][tokens]
    radius = (cfg.window - 1) // 2 if cfg.attention == "sliding" else None
    slot_lanes = jnp.full((C,), slot, jnp.int32)
    loras = lora if lora is not None else [None] * len(params["layers"])
    new_caches = []
    for layer, le, cache in zip(params["layers"], loras, caches):
        h = rmsnorm(x, layer["ln_attn"])
        qp = _proj(h, layer["wq"], le, "wq", adapter_ids)
        kp = _proj(h, layer["wk"], le, "wk", adapter_ids)
        vp = _proj(h, layer["wv"], le, "wv", adapter_ids)
        qh = qp.shape[-1] // cfg.head_dim
        kvh = kp.shape[-1] // cfg.head_dim
        q = apply_rope(qp.reshape(b, C, qh, cfg.head_dim), positions,
                       cfg.rope_theta)
        k = apply_rope(kp.reshape(b, C, kvh, cfg.head_dim), positions,
                       cfg.rope_theta)
        v = vp.reshape(b, C, kvh, cfg.head_dim)

        # prefix attention BEFORE the write: cache.lengths is still the
        # prefix length, so the paged kernel sees exactly [start, offset).
        # Per-lane positions give each chunk token its OWN band start for
        # sliding models (lane i's query sits at offset + i, not offset).
        o1, lse1 = paged_attention(
            q[0].astype(x.dtype), cache, slot_lanes, radius=radius,
            positions=positions[0] if radius is not None else None,
            pages_bound=pages_bound, return_lse=True,
            shared_page_table=True,  # C lanes, ONE slot: one SMEM row
        )  # (C, qh, d), (C, qh) — chunk tokens ride the lane axis
        # in-chunk attention; padded tail rows only ever attend earlier
        # real keys, nothing attends the padding. Sliding models use the
        # banded causal schedule so chunk token i attends chunk keys
        # [i − radius, i] — with the prefix band above, the union is
        # exactly the model's window [pos − radius, pos].
        o2, lse2 = flash.flash_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
            jnp.swapaxes(v, 1, 2),
            schedule="causal" if radius is None else "local_causal",
            radius=radius,
            block_q=cfg.block_q, block_kv=cfg.block_kv, return_lse=True,
            bound_max=cfg.attn_bound_max,
        )  # (1, qh, C, d), (1, qh, C)
        o, _ = merge_partials(
            jnp.swapaxes(o1, 0, 1)[None].astype(jnp.float32),
            jnp.swapaxes(lse1, 0, 1)[None],
            o2.astype(jnp.float32), lse2,
        )
        o = jnp.swapaxes(o, 1, 2).astype(x.dtype)  # (1, C, qh, d)

        cache = cache.write_chunk(
            slot, jnp.swapaxes(k[0], 0, 1), jnp.swapaxes(v[0], 0, 1),
            offset, valid_n=true_len,
        )
        x = x + _psum(_proj(o.reshape(b, C, qh * cfg.head_dim),
                            layer["wo"], le, "wo", adapter_ids), tp_axis)
        hm = rmsnorm(x, layer["ln_mlp"])
        x = x + _mlp(layer, hm, cfg, tp_axis=tp_axis)
        new_caches.append(cache)
    x = rmsnorm(x, params["ln_f"])
    logits = (x @ params["embed"].T).astype(jnp.float32)
    last = jax.lax.dynamic_index_in_dim(logits[0], true_len - 1, keepdims=False)
    return logits, jnp.argmax(last).astype(jnp.int32), new_caches


def decode_step_seq(params, tokens, positions, caches, slots,
                    cfg: ModelConfig, axis_name: str, pages_bound=None):
    """One decode step with each layer's paged cache SHARDED over
    ``axis_name`` (call inside shard_map).

    Identical dense path to :func:`decode_step` (replicated — one token per
    lane, the projections are not worth sharding at batch≤max_batch), but
    attention runs :func:`tpu_flash.parallel.ring_decode.
    sharded_paged_attention`: every rank attends its local slice of the
    history, partials merge with one psum pair over ICI, and the new
    token's K/V append lands only on the tail-owner rank (the last shard).
    ``caches`` are the rank-LOCAL PagedKVCache views. Sliding-window
    decode is not supported across shards (band positions are global).
    """
    _check_serving_moe(cfg)
    from tpu_flash.parallel.ring_decode import sharded_paged_attention

    if cfg.attention == "sliding":
        raise NotImplementedError("seq-sharded decode is causal-only")
    b = tokens.shape[0]
    x = params["embed"][tokens][:, None, :]
    pos = positions[:, None]
    new_caches = []
    for layer, cache in zip(params["layers"], caches):
        h = rmsnorm(x, layer["ln_attn"])
        qp, kp, vp = _mm(h, layer["wq"]), _mm(h, layer["wk"]), _mm(h, layer["wv"])
        qh = qp.shape[-1] // cfg.head_dim
        kvh = kp.shape[-1] // cfg.head_dim
        q = apply_rope(qp.reshape(b, 1, qh, cfg.head_dim), pos, cfg.rope_theta)
        k = apply_rope(kp.reshape(b, 1, kvh, cfg.head_dim), pos, cfg.rope_theta)
        v = vp.reshape(b, 1, kvh, cfg.head_dim)
        o, cache = sharded_paged_attention(
            q[:, 0].astype(x.dtype), cache, slots, axis_name,
            new_kv=(k[:, 0].astype(x.dtype), v[:, 0].astype(x.dtype)),
            pages_bound=pages_bound,
        )
        x = x + _mm(o.reshape(b, 1, qh * cfg.head_dim), layer["wo"])
        hm = rmsnorm(x, layer["ln_mlp"])
        x = x + _mlp(layer, hm, cfg)
        new_caches.append(cache)
    x = rmsnorm(x, params["ln_f"])
    logits = (x[:, 0] @ params["embed"].T).astype(jnp.float32)
    return logits, new_caches


def decode_verify(params, tokens, positions, caches, slots,
                  cfg: ModelConfig, pages_bound=None, tp_axis=None,
                  lora=None, adapter_ids=None):
    """Speculative-decoding verification: score K tokens per lane in ONE
    jitted call against the paged caches.

    tokens: ``(B, K)`` int32 — lane b's pending token followed by K−1 draft
    proposals; positions: ``(B,)`` the position of ``tokens[:, 0]`` (must
    equal the slot's stored length). Per layer, all K tokens' K/V append
    first (K fused-append passes), then one paged-attention call rides the
    B·K tokens on the lane axis with per-lane visible lengths
    ``base + j + 1`` — token j attends everything up to and including
    itself, exactly the view K sequential decode steps would give it.

    Returns ``(logits (B, K, vocab) f32, new_caches)`` with every slot's
    length advanced by K; the caller rolls lengths back to the accepted
    prefix (rejected tokens' K/V stay as length-masked garbage).
    """
    _check_serving_moe(cfg)
    from tpu_flash.ops.paged import paged_attention

    b, K = tokens.shape
    pos = positions[:, None] + jnp.arange(K, dtype=jnp.int32)[None]  # (B, K)
    x = params["embed"][tokens]  # (B, K, dim)
    radius = (cfg.window - 1) // 2 if cfg.attention == "sliding" else None
    slots_flat = jnp.repeat(slots, K)          # (B·K,)
    vis_flat = (pos + 1).reshape(-1)           # per-lane visible lengths
    pos_flat = pos.reshape(-1)
    loras = lora if lora is not None else [None] * len(params["layers"])
    new_caches = []
    for layer, le, cache in zip(params["layers"], loras, caches):
        h = rmsnorm(x, layer["ln_attn"])
        qp = _proj(h, layer["wq"], le, "wq", adapter_ids)
        kp = _proj(h, layer["wk"], le, "wk", adapter_ids)
        vp = _proj(h, layer["wv"], le, "wv", adapter_ids)
        qh = qp.shape[-1] // cfg.head_dim
        kvh = kp.shape[-1] // cfg.head_dim
        q = apply_rope(qp.reshape(b, K, qh, cfg.head_dim), pos, cfg.rope_theta)
        k = apply_rope(kp.reshape(b, K, kvh, cfg.head_dim), pos, cfg.rope_theta)
        v = vp.reshape(b, K, kvh, cfg.head_dim)
        for j in range(K):  # K appends advance each slot's length by one
            cache = cache.append(slots, k[:, j].astype(x.dtype),
                                 v[:, j].astype(x.dtype))
        o = paged_attention(
            q.reshape(b * K, qh, cfg.head_dim).astype(x.dtype), cache,
            slots_flat, lengths_override=vis_flat,
            positions=pos_flat if radius is not None else None,
            pages_bound=pages_bound, radius=radius,
        )
        o = o.reshape(b, K, qh * cfg.head_dim)
        x = x + _psum(_proj(o, layer["wo"], le, "wo", adapter_ids), tp_axis)
        hm = rmsnorm(x, layer["ln_mlp"])
        x = x + _mlp(layer, hm, cfg, tp_axis=tp_axis)
        new_caches.append(cache)
    x = rmsnorm(x, params["ln_f"])
    logits = (x @ params["embed"].T).astype(jnp.float32)
    return logits, new_caches


def decode_step(params, tokens, positions, caches, slots, cfg: ModelConfig,
                pages_bound=None, tp_axis=None, pipelined=False,
                lora=None, adapter_ids=None):
    """One decode step over the paged caches.

    tokens: (B,) int32 new token ids; positions: (B,) their positions;
    caches: list (len = num_layers) of PagedKVCache; slots: (B,) slot ids.
    The new token's K/V are appended to each layer's cache *before* the
    paged attention, so the token attends to itself.

    ``pipelined=True`` uses the hand-pipelined decode kernel
    (ops/paged.py `_pipe_kernel`: dynamic page loop, manual
    double-buffered DMA; append runs as the standalone fused-append
    kernel before the attention) — ``pages_bound`` is then ignored.

    Returns (logits (B, vocab), new_caches).
    """
    _check_serving_moe(cfg)
    b = tokens.shape[0]
    x = params["embed"][tokens][:, None, :]  # (B, 1, dim)
    pos = positions[:, None]
    # sliding-window models attend only the trailing window during decode,
    # matching the prefill/forward semantics (cfg.attention == "sliding")
    radius = (cfg.window - 1) // 2 if cfg.attention == "sliding" else None
    loras = lora if lora is not None else [None] * len(params["layers"])
    new_caches = []
    for layer, le, cache in zip(params["layers"], loras, caches):
        h = rmsnorm(x, layer["ln_attn"])
        qp = _proj(h, layer["wq"], le, "wq", adapter_ids)
        kp = _proj(h, layer["wk"], le, "wk", adapter_ids)
        vp = _proj(h, layer["wv"], le, "wv", adapter_ids)
        qh = qp.shape[-1] // cfg.head_dim
        kvh = kp.shape[-1] // cfg.head_dim
        q = qp.reshape(b, 1, qh, cfg.head_dim)
        k = kp.reshape(b, 1, kvh, cfg.head_dim)
        v = vp.reshape(b, 1, kvh, cfg.head_dim)
        q = apply_rope(q, pos, cfg.rope_theta)
        k = apply_rope(k, pos, cfg.rope_theta)
        # fused append+attention: the new token's K/V are quantized and
        # written into the tail page in the same kernel pass that reads it
        if pipelined:
            from tpu_flash.ops.paged import paged_attention_pipelined

            o, cache = paged_attention_pipelined(
                q[:, 0].astype(x.dtype), cache, slots,
                new_kv=(k[:, 0].astype(x.dtype), v[:, 0].astype(x.dtype)),
                radius=radius,
            )
        else:
            o, cache = paged_attention(
                q[:, 0].astype(x.dtype), cache, slots,
                new_kv=(k[:, 0].astype(x.dtype), v[:, 0].astype(x.dtype)),
                pages_bound=pages_bound, radius=radius,
            )
        x = x + _psum(_proj(o.reshape(b, 1, qh * cfg.head_dim),
                            layer["wo"], le, "wo", adapter_ids), tp_axis)
        hm = rmsnorm(x, layer["ln_mlp"])
        x = x + _mlp(layer, hm, cfg, tp_axis=tp_axis)
        new_caches.append(cache)
    x = rmsnorm(x, params["ln_f"])
    logits = (x[:, 0] @ params["embed"].T).astype(jnp.float32)
    return logits, new_caches
