"""Continuous-batching inference engine over the paged KV-cache.

The decode loop the north star asks for: requests stream in, prompts are
prefilled through the causal flash kernel, K/V land in paged cache slots
granted by the native allocator (csrc/pagepool.cpp), and every engine step
advances ALL running sequences by one token through the paged decode kernel
— new sequences join the batch the moment pages are free (continuous
batching), finished ones release pages immediately. Pool exhaustion preempts
the youngest sequence back to the queue rather than deadlocking (the
allocator's decode-reserve watermark makes extends succeed first).

Design notes:
* decode is ONE jitted call per step, batch dimension = max_batch, inactive
  lanes parked on a trash slot whose page table points at physical page 0
  (reserved; never granted to real sequences);
* prefill is per-request, bucketed to powers of two so each bucket compiles
  once; pages are granted for the padded bucket so the in-cache garbage
  tail is always covered (attention masks it by true length);
* cache buffers are donated through the decode jit, so page memory is
  updated in place rather than copied per token.
"""

from __future__ import annotations

import dataclasses
import functools
import json
import time
from collections import deque
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.cache.allocator import PageAllocator
from tpu_flash.cache.paged_cache import CacheConfig, PagedKVCache
from tpu_flash.models import transformer as tfm


def _device_sample(logits: jnp.ndarray, samp: jnp.ndarray, key,
                   positions=None) -> jnp.ndarray:
    """On-device next-token choice. ``samp``: (B, 3) f32 rows of
    [temperature, top_k, top_p] — greedy for temp<=0, Gumbel-max over the
    (optionally top-k / nucleus-truncated) scaled distribution otherwise.

    Sampling noise is keyed two ways:
    * ``positions`` given (the serving paths): ``key`` is a (B, 2) array
      of PER-REQUEST base keys and lane i draws from
      ``fold_in(key[i], positions[i])`` — the position the sampled token
      will occupy. Sampling is then a pure function of (request seed,
      position): BATCHING-INVARIANT (a request's stream never depends on
      its co-batched neighbors, lane index, chunking, preemption/resume,
      or the async decode chain) and replay-stable across checkpoints.
    * ``positions=None`` (the speculative draft/verify paths): ``key`` is
      one engine-stream key for the whole batch (acceptance there is a
      distributional law, not a bitwise contract — DESIGN §18).

    Keeps the decode loop's host traffic to one int per lane per step —
    fetching full logits over the device link costs more than the step
    itself (measured: 2 MB logits ≈ the whole decode step under the TPU
    tunnel). The vocab sort that truncation needs runs under a lax.cond,
    so pure-temperature/greedy batches never pay it.
    """
    logits = logits.astype(jnp.float32)
    temps, top_k, top_p = samp[:, 0], samp[:, 1], samp[:, 2]
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = _truncated_scores(logits, samp)
    v = logits.shape[-1]
    if positions is None:
        u = jax.random.uniform(key, logits.shape, jnp.float32, 1e-20, 1.0)
    else:
        lane_keys = jax.vmap(jax.random.fold_in)(
            key, positions.astype(jnp.uint32))
        u = jax.vmap(
            lambda k: jax.random.uniform(k, (v,), jnp.float32, 1e-20, 1.0)
        )(lane_keys)
    gumbel = -jnp.log(-jnp.log(u))
    sampled = jnp.argmax(scaled + gumbel, axis=-1).astype(jnp.int32)
    return jnp.where(temps <= 0.0, greedy, sampled)


def _sample_packed(logits, samp, key, positions=None):
    """(token, logprob) packed into one (B, 2) f32 array — a single
    device fetch per decode step (each fetched buffer is a ~30 ms round
    trip under the TPU tunnel). The logprob is the chosen token's raw
    log-softmax (the model distribution, untempered — the standard
    serving-API quantity). Key semantics as :func:`_device_sample`."""
    tok = _device_sample(logits, samp, key, positions)
    lp = jnp.take_along_axis(
        jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1),
        tok[:, None].astype(jnp.int32), axis=-1)[:, 0]
    return jnp.stack([tok.astype(jnp.float32), lp], axis=1)


def _truncated_scores(logits: jnp.ndarray, samp: jnp.ndarray) -> jnp.ndarray:
    """Temperature-scaled logits with top-k / nucleus truncation applied
    (truncated entries at -1e30). The sort runs under a lax.cond, so
    untruncated batches never pay it."""
    temps, top_k, top_p = samp[:, 0], samp[:, 1], samp[:, 2]
    t = jnp.maximum(temps, 1e-6)[:, None]
    scaled = logits.astype(jnp.float32) / t
    neg = jnp.float32(-1e30)

    def truncated(scaled):
        v = scaled.shape[-1]
        # ONE descending sort serves both filters: the top-k mask is
        # order-preserving in sorted space, so the nucleus pass reuses it.
        srt = jnp.sort(scaled, axis=-1)[:, ::-1]
        # top-k: keep entries >= the k-th largest (ties keep extras)
        k_idx = jnp.clip(top_k.astype(jnp.int32) - 1, 0, v - 1)
        kth = jnp.take_along_axis(srt, k_idx[:, None], axis=-1)
        kmask = top_k[:, None] > 0
        srt = jnp.where(kmask & (srt < kth), neg, srt)
        # nucleus: smallest prefix of the sorted distribution reaching
        # top_p; the max of top_p with a tiny epsilon keeps the first
        # (most likely) token alive even for a degenerate top_p = 0
        prob = jax.nn.softmax(srt, axis=-1)
        csum = jnp.cumsum(prob, axis=-1)
        keep = (csum - prob) < jnp.maximum(top_p, 1e-9)[:, None]
        cutoff = jnp.min(jnp.where(keep, srt, jnp.inf), axis=-1)
        scaled = jnp.where(kmask & (scaled < kth), neg, scaled)
        return jnp.where(scaled >= cutoff[:, None], scaled, neg)

    return jax.lax.cond(
        jnp.any((top_k > 0) | (top_p < 1.0)), truncated, lambda s: s, scaled
    )


def _trunc_dist(logits: jnp.ndarray, samp: jnp.ndarray) -> jnp.ndarray:
    """The probability distribution plain decoding samples from: truncated
    temperature softmax, degenerating to a one-hot argmax at temp <= 0.
    This is the p (and q) of speculative rejection sampling — defining the
    greedy limit as one-hot makes greedy acceptance a special case of
    accept-with-prob-min(1, p/q)."""
    temps = samp[:, 0]
    probs = jax.nn.softmax(_truncated_scores(logits, samp), axis=-1)
    v = logits.shape[-1]
    onehot = jax.nn.one_hot(jnp.argmax(logits, axis=-1), v, dtype=jnp.float32)
    return jnp.where((temps <= 0.0)[:, None], onehot, probs)


def _spec_accept(toks, p_all, q, key):
    """Speculative rejection sampling (Leviathan et al.), greedy-inclusive.

    toks: (B, K) pending token + K−1 draft proposals; p_all: (B, K, V)
    target distributions (p_all[:, j] is the distribution of the token
    FOLLOWING toks[:, j]); q: (B, K−1, V) the draft distributions the
    proposals were sampled from. Proposal d_i accepts with probability
    min(1, p(d_i)/q(d_i)); the first rejection resamples from the residual
    norm(max(p−q, 0)); full acceptance samples the bonus from p[:, K−1].
    With one-hot p/q (temp<=0, see _trunc_dist) this reduces exactly to
    greedy token-matching. Emitted tokens are distributed per p — the same
    law as plain sampling — for ANY draft.

    Returns (m (B,) accepted-proposal counts, final (B,) int32 token).
    """
    b, K = toks.shape
    ku, kf = jax.random.split(key)
    u = jax.random.uniform(ku, (b, K - 1), jnp.float32, 1e-20, 1.0)
    d = toks[:, 1:]
    p_d = jnp.take_along_axis(p_all[:, : K - 1], d[..., None], -1)[..., 0]
    q_d = jnp.take_along_axis(q, d[..., None], -1)[..., 0]
    accept = (u * q_d < p_d).astype(jnp.int32)  # u < p/q without the div
    m = jnp.sum(jnp.cumprod(accept, axis=1), axis=1)  # (B,)
    # final token: residual distribution at the cut, bonus p at full accept
    p_cut = jnp.take_along_axis(p_all, m[:, None, None], 1)[:, 0]  # (B, V)
    q_cut = jnp.take_along_axis(
        q, jnp.minimum(m, K - 2)[:, None, None], 1)[:, 0]
    resid = jnp.maximum(p_cut - q_cut, 0.0)
    rs = jnp.sum(resid, axis=-1, keepdims=True)
    resid = jnp.where(rs > 1e-9, resid / rs, p_cut)  # p==q: nothing rejects
    dist = jnp.where((m == K - 1)[:, None], p_cut, resid)
    g = -jnp.log(-jnp.log(
        jax.random.uniform(kf, dist.shape, jnp.float32, 1e-20, 1.0)))
    final = jnp.argmax(jnp.log(jnp.maximum(dist, 1e-30)) + g,
                       axis=-1).astype(jnp.int32)
    return m, final


@dataclasses.dataclass
class Request:
    rid: int
    prompt: List[int]
    max_new_tokens: int = 32
    temperature: float = 0.0
    top_k: int = 0        # 0 = disabled; keep only the k most likely
    top_p: float = 1.0    # nucleus sampling mass; 1.0 = disabled
    eos_id: Optional[int] = None
    # finish when the GENERATED tail ends with any of these token
    # sequences (checked host-side after each emitted token; composes
    # with speculation — an accepted proposal can complete a stop)
    stop_sequences: tuple = ()
    # multi-LoRA serving: adapter row in the engine's bank (−1 = base
    # model); any mix of adapters and base rides one batched decode
    adapter_id: int = -1
    # internal: set on preemption requeue — the ORIGINAL user prompt
    # length, so a stop sequence straddling the preemption boundary
    # (generated tokens absorbed into the requeued prompt) still fires
    true_prompt_len: Optional[int] = None


@dataclasses.dataclass
class _Running:
    rid: int
    slot: int
    tokens: List[int]          # prompt + generated
    prompt_len: int
    max_new_tokens: int
    temperature: float
    # defaults keep _Running(**row) working for checkpoints written before
    # a field existed
    top_k: int = 0
    top_p: float = 1.0
    eos_id: Optional[int] = None
    alloc_tokens: int = 0      # page-covered capacity
    next_token: int = -1
    logprobs: List[float] = dataclasses.field(default_factory=list)
    stop_sequences: tuple = ()
    true_prompt_len: Optional[int] = None
    adapter_id: int = -1


@dataclasses.dataclass
class FinishedRequest:
    rid: int
    tokens: List[int]
    new_tokens: List[int]
    reason: str  # "length" | "eos" | "stop" | "cap"
    # raw log-softmax of each generated token under the model distribution
    logprobs: List[float] = dataclasses.field(default_factory=list)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    max_batch: int = 8
    prefill_buckets: tuple = (64, 128, 256, 512, 1024, 2048)
    pages_bound: Optional[int] = None  # static cap for the decode kernel
    pipelined_decode: bool = False  # hand-pipelined decode kernel (v2)
    chunk_size: Optional[int] = None  # tokens per prefill chunk (page-multiple);
    # prompts longer than this stream in chunks interleaved with decode steps
    prefix_cache: bool = False  # copy-on-write sharing of full prompt pages:
    # repeated prefixes skip both prefill compute and page memory
    # (serving/prefix_cache.py); evicted LRU-first under pool pressure
    prefix_cache_entries: int = 4096
    prefill_bound_max: bool = False  # inference fast path: run PREFILL
    # causal attention with the constant norm-bound max (+14% measured
    # forward, 105.5 → 120.0 TFLOP/s @8k d=128, logs/r4_exp9.jsonl).
    # RELAXES the engine's chunked-vs-unchunked prefill contract from
    # bit-identical to a tolerance: the bound depends on the kv span each
    # chunk sees, so chunked prefill logits differ from unchunked in the
    # last bits (may flip near-tie samples). Decode is untouched (paged
    # kernels, exact max). Off by default — the bitwise contract stands
    # unless the deployment opts into the speed.
    metrics_path: Optional[str] = None  # per-step JSONL metrics stream
    speculate_k: int = 0  # speculative decoding: tokens verified per round
    async_decode: bool = True  # keep ONE decode dispatch in flight: round
    # N+1 is issued chained on round N's device outputs before N's tokens
    # are fetched, hiding the host↔device round trip (the ~30 ms tunnel
    # dispatch floor) behind device work. Commit order, finish logic and
    # the token stream are bit-identical to the synchronous loop; the
    # chain flushes on any composition change. Applies to the
    # decode_steps > 1 scan path (plain/speculative rounds always flush).
    decode_steps: int = 1  # >1: scan K decode iterations in ONE device call
    # (sampling + append on-device), so the host pays one dispatch per K
    # tokens — decode is step-overhead-bound through the tunnel (~30 ms
    # round trip vs sub-ms device steps). Lanes that finish mid-scan are
    # rolled back host-side exactly like speculative rejections. Ignored
    # when a draft model is attached (speculation already amortizes).
    # (pending + k−1 draft proposals in ONE target call). Needs a draft
    # model (Engine(draft=...)). Greedy streams are byte-identical to
    # plain decoding; temperature streams follow the same truncated-softmax
    # law via rejection sampling (_spec_accept).
    seed: int = 0


class Engine:
    def __init__(
        self,
        params,
        model_cfg: tfm.ModelConfig,
        cache_cfg: CacheConfig,
        engine_cfg: EngineConfig = EngineConfig(),
        mesh=None,
        tp_axis: str = "model",
        draft=None,  # (draft_params, draft ModelConfig) for speculation
        lora=None,   # adapter bank (models/lora.py init_lora_bank layout)
    ):
        self.params = params
        # Pin the exact running max for every prefill kernel call: the
        # norm-bound max depends on the kv SPAN each call sees, and the
        # engine guarantees bit-identical streams across chunked vs
        # unchunked prefill (tests/test_engine.py) and across resume.
        # An explicitly-True caller config is an error, not a silent
        # overwrite (advisor r4): the caller asked for semantics the
        # engine's contract forbids.
        if model_cfg.attn_bound_max:
            raise ValueError(
                "attn_bound_max=True breaks the engine's bit-identical "
                "chunked-vs-unchunked prefill contract (the norm bound "
                "depends on the kv span each chunk sees); leave it None")
        self.mcfg = dataclasses.replace(model_cfg, attn_bound_max=False)
        # Prefill may opt into the norm-bound causal fast path (a
        # tolerance contract — see EngineConfig.prefill_bound_max);
        # decode always keeps the exact-max pin above.
        self.mcfg_prefill = (
            dataclasses.replace(model_cfg, attn_bound_max=True)
            if engine_cfg.prefill_bound_max else self.mcfg)
        self.ccfg = cache_cfg
        self.ecfg = engine_cfg
        self.mesh = mesh
        self.tp_axis = tp_axis if mesh is not None else None
        self.lora = lora
        if lora is not None and mesh is not None:
            raise NotImplementedError(
                "multi-LoRA under tensor parallelism is not composed yet "
                "(the adapter deltas would need the projections' shardings)")
        if engine_cfg.max_batch > cache_cfg.max_seqs - 1:
            raise ValueError("max_batch must leave one trash slot free")
        # physical page 0 is the trash page; allocator hands out [1, total).
        self._alloc = PageAllocator(
            total_pages=cache_cfg.total_pages - 1,
            max_seqs=cache_cfg.max_seqs,
            max_pages_per_seq=cache_cfg.max_pages_per_seq,
            decode_reserve=engine_cfg.max_batch,
        )
        self.caches = [
            PagedKVCache.create(cache_cfg) for _ in range(model_cfg.num_layers)
        ]
        if mesh is not None:
            # Megatron-style TP: shard params + cache heads over tp_axis,
            # run the jitted entry points under shard_map (Pallas kernels
            # are not GSPMD-partitionable).
            from tpu_flash.parallel.shardings import shard_engine_state

            self.params, self.caches = shard_engine_state(
                mesh, self.params, self.caches, tp_axis
            )
        self._trash_slot = cache_cfg.max_seqs - 1
        self._free_slots = deque(
            s for s in range(cache_cfg.max_seqs) if s != self._trash_slot
        )
        self.waiting: deque[Request] = deque()
        self.running: dict[int, _Running] = {}
        self.prefilling: dict[int, dict] = {}  # slot → chunked-prefill state
        self.finished: List[FinishedRequest] = []
        if engine_cfg.chunk_size is not None and (
            engine_cfg.chunk_size % cache_cfg.page_size
        ):
            raise ValueError("chunk_size must be a multiple of page_size")
        # ---- speculative decoding: draft model + its own paged caches
        # (same page geometry and the SAME allocator tables — the draft
        # pools mirror the target's slot/page structure, so no second
        # allocator is needed) --------------------------------------------
        self._draft = None
        if draft is not None and engine_cfg.speculate_k > 0:
            if engine_cfg.speculate_k < 2:
                raise ValueError(
                    "speculate_k must be >= 2 (one pending + >=1 proposal);"
                    " k=1 would pay the draft prefills for nothing")
            dparams, dcfg = draft
            if dcfg.vocab_size != model_cfg.vocab_size:
                raise ValueError("draft vocab must match the target's")
            # Under TP the draft stays UNsharded: it is small by
            # construction, so its prefills/micro-steps run plain
            # single-device jits while only the target's verify call is
            # shard_map'd over the mesh (qd/samp enter replicated).
            dccfg = dataclasses.replace(
                cache_cfg,
                num_kv_heads=dcfg.num_kv_heads,
                head_dim=dcfg.head_dim,
            )
            self._draft = dict(
                params=dparams, cfg=dcfg,
                caches=[PagedKVCache.create(dccfg)
                        for _ in range(dcfg.num_layers)],
                lens={},       # slot → draft-cache stored length (host)
                fns={},        # jit caches
            )
        self._spec_proposed = 0
        self._spec_accepted = 0
        self._steps = 0
        self._tokens_out = 0
        self._preemptions = 0
        self._metrics_fh = (open(engine_cfg.metrics_path, "a")
                            if engine_cfg.metrics_path else None)
        self._pcache = None
        if engine_cfg.prefix_cache:
            from tpu_flash.serving.prefix_cache import PrefixCache

            self._pcache = PrefixCache(
                self._alloc, engine_cfg.prefix_cache_entries
            )
        self._rng = np.random.default_rng(engine_cfg.seed)
        self._key = jax.random.PRNGKey(engine_cfg.seed)
        self._inflight = None  # async decode: the one dispatched round
        # Per-request sampling base keys (see _device_sample): derived
        # purely from (engine seed, rid), so they need no checkpoint state
        # and survive preemption/resume/batching changes unchanged.
        self._req_keys: dict = {}
        self._decode_fns = {}
        self._prefill_fns = {}
        self._write_fns = {}

    # ---- jitted model entry points ------------------------------------

    def _decode_fn(self, pages_bound: int):
        """Jitted decode step for a static page bound.

        The paged kernel is head-batched with grid (batch, pages_bound);
        scanning the cache-wide max_pages_per_seq when every running
        sequence is short multiplies grid-step overhead for nothing
        (measured 14 ms → ~1 ms on short sequences). Bounds are bucketed to
        powers of four (``_pages_bound``) so at most log4(max_pages)
        variants ever compile."""
        if pages_bound not in self._decode_fns:
            mcfg, axis = self.mcfg, self.tp_axis
            trash = self._trash_slot

            pipelined = self.ecfg.pipelined_decode

            def run(params, lora, caches, tokens, positions, slots, samp,
                    aids, key):
                logits, caches = tfm.decode_step(
                    params, tokens, positions, caches, slots, mcfg,
                    pages_bound=pages_bound, tp_axis=axis,
                    pipelined=pipelined, lora=lora, adapter_ids=aids,
                )
                # idle lanes append to the trash slot every step; reset its
                # length so it never walks off its (all-trash-page) table
                caches = [
                    dataclasses.replace(
                        c, lengths=c.lengths.at[trash].set(0)
                    )
                    for c in caches
                ]
                # key: (B, 2) per-REQUEST base keys; the sampled token
                # lands at positions+1 — see _device_sample
                return _sample_packed(logits, samp, key, positions + 1), caches

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P
                from tpu_flash.parallel.shardings import (
                    cache_pspecs, param_pspecs,
                )

                pp = param_pspecs(self.params, axis)
                cs = [cache_pspecs(c, axis) for c in self.caches]
                run = jax.shard_map(
                    run, mesh=self.mesh,
                    in_specs=(pp, None, cs, P(), P(), P(), P(), P(), P()),
                    out_specs=(P(), cs),
                    check_vma=False,
                )
            self._decode_fns[pages_bound] = jax.jit(run, donate_argnums=(2,))
        return self._decode_fns[pages_bound]

    def _decode_multi_fn(self, pages_bound: int, K: int):
        """Jitted K-step decode scan: one host dispatch yields K tokens per
        lane (VERDICT r2 item 5 — the engine was host-loop-bound at one
        device call per token).

        The scan body is exactly :func:`_decode_fn`'s step — same
        decode_step, same trash-slot reset, same ``key, sub = split(key)``
        order — so a K-step call produces bit-identical streams to K plain
        steps (asserted in tests/test_engine.py). Returns
        ``(packed (B, K, 2), new_key, caches)``.
        """
        fkey = ("multi", pages_bound, K)
        if fkey not in self._decode_fns:
            mcfg, axis = self.mcfg, self.tp_axis
            trash = self._trash_slot
            pipelined = self.ecfg.pipelined_decode

            def run(params, lora, caches, tokens, positions, slots, samp,
                    aids, keys):
                def body(carry, _):
                    tokens, positions, caches = carry
                    logits, caches = tfm.decode_step(
                        params, tokens, positions, caches, slots, mcfg,
                        pages_bound=pages_bound, tp_axis=axis,
                        pipelined=pipelined, lora=lora, adapter_ids=aids,
                    )
                    caches = [
                        dataclasses.replace(
                            c, lengths=c.lengths.at[trash].set(0)
                        )
                        for c in caches
                    ]
                    # per-(request, position) sampling keys: the scan body
                    # IS the plain step bit-for-bit (same fold_in), so a
                    # K-step call ≡ K plain calls regardless of K
                    packed = _sample_packed(logits, samp, keys, positions + 1)
                    ntok = packed[:, 0].astype(jnp.int32)
                    return (ntok, positions + 1, caches), packed

                (ntok, npos, caches), packs = jax.lax.scan(
                    body, (tokens, positions, caches), None, length=K)
                # ntok/npos feed a CHAINED next round without a host fetch
                # (the async decode loop — VERDICT r4 next-round item 6)
                return jnp.moveaxis(packs, 0, 1), ntok, npos, caches

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P
                from tpu_flash.parallel.shardings import (
                    cache_pspecs, param_pspecs,
                )

                pp = param_pspecs(self.params, axis)
                cs = [cache_pspecs(c, axis) for c in self.caches]
                run = jax.shard_map(
                    run, mesh=self.mesh,
                    in_specs=(pp, None, cs, P(), P(), P(), P(), P(), P()),
                    out_specs=(P(), P(), P(), cs),
                    check_vma=False,
                )
            self._decode_fns[fkey] = jax.jit(run, donate_argnums=(2,))
        return self._decode_fns[fkey]

    def _set_lengths_fn(self):
        if "setlen" not in self._write_fns:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(caches, slots, vals):
                return [dataclasses.replace(
                    c, lengths=c.lengths.at[slots].set(vals))
                    for c in caches]

            self._write_fns["setlen"] = run
        return self._write_fns["setlen"]

    def _pages_bound(self, ahead: int = 0) -> int:
        ps = self.ccfg.page_size
        need = max(
            -(-(len(r.tokens) + ahead) // ps) for r in self.running.values()
        )
        # powers of 4 (4, 16, 64, …): ≤ log4(max_pages) jit variants, since
        # each bucket crossing costs a fresh compile of the decode step.
        bound = 4
        while bound < need:
            bound *= 4
        bound = min(bound, self.ccfg.max_pages_per_seq)
        if self.ecfg.pages_bound is not None:
            if ahead:
                # user-pinned static cap; a speculative round may need to
                # scan past it for the K pre-acceptance writes
                return min(max(self.ecfg.pages_bound, bound),
                           self.ccfg.max_pages_per_seq)
            return self.ecfg.pages_bound
        return bound

    def _prefill_fn(self, bucket: int):
        if bucket not in self._prefill_fns:
            mcfg, axis = self.mcfg_prefill, self.tp_axis

            def run(params, lora, tokens, length, samp, aid, key):
                logits_all, kv = _prefill_all_logits(
                    params, tokens, mcfg, tp_axis=axis, lora=lora,
                    adapter_ids=aid[None],
                )
                logits = jax.lax.dynamic_index_in_dim(
                    logits_all, length - 1, axis=1, keepdims=False
                )
                # key: the request's base key; the first sampled token
                # lands at position `length`
                tok_lp = _sample_packed(
                    logits, samp[None], key[None], length[None])[0]
                return tok_lp, kv

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P
                from tpu_flash.parallel.shardings import param_pspecs

                pp = param_pspecs(self.params, axis)
                kv_spec = [
                    (P(None, None, axis, None), P(None, None, axis, None))
                    for _ in range(mcfg.num_layers)
                ]
                run = jax.shard_map(
                    run, mesh=self.mesh,
                    in_specs=(pp, None, P(), P(), P(), P(), P()),
                    out_specs=(P(), kv_spec),
                    check_vma=False,
                )
            self._prefill_fns[bucket] = jax.jit(run)
        return self._prefill_fns[bucket]

    # ---- speculative decoding -------------------------------------------

    def spec_stats(self) -> dict:
        return dict(proposed=self._spec_proposed,
                    accepted=self._spec_accepted)

    def _draft_prefill(self, prompt, slot: int) -> None:
        """Seed the draft caches with the prompt's K/V (one whole-prompt
        draft forward — the draft is small by construction)."""
        dp = self._draft
        n = len(prompt)
        bucket = self._bucket(n)
        key = ("dpre", bucket)
        if key not in dp["fns"]:
            dcfg = dp["cfg"]

            @functools.partial(jax.jit, donate_argnums=(1,))
            def run(params, caches, tokens, slot, n):
                _, kv = tfm.prefill(params, tokens, dcfg)
                out = []
                for c, (k, v) in zip(caches, kv):
                    c = c.write_prompt(
                        slot, jnp.swapaxes(k[0], 0, 1),
                        jnp.swapaxes(v[0], 0, 1))
                    out.append(dataclasses.replace(
                        c, lengths=c.lengths.at[slot].set(n)))
                return out

            dp["fns"][key] = run
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = prompt
        dp["caches"] = dp["fns"][key](
            dp["params"], dp["caches"], jnp.asarray(toks), jnp.int32(slot),
            jnp.int32(n))
        dp["lens"][slot] = n

    def _draft_step_fn(self, pages_bound: int):
        dp = self._draft
        key = ("dstep", pages_bound)
        if key not in dp["fns"]:
            dcfg, trash = dp["cfg"], self._trash_slot

            def run(params, caches, tokens, positions, slots, samp, key):
                logits, caches = tfm.decode_step(
                    params, tokens, positions, caches, slots, dcfg,
                    pages_bound=pages_bound)
                caches = [dataclasses.replace(
                    c, lengths=c.lengths.at[trash].set(0)) for c in caches]
                # proposals sample from the request's OWN distribution
                # (temp/top-k/top-p applied to the draft logits); its dist
                # is returned for the verify step's acceptance ratio
                return (_device_sample(logits, samp, key),
                        _trunc_dist(logits, samp), caches)

            dp["fns"][key] = jax.jit(run, donate_argnums=(1,))
        return dp["fns"][key]

    def _verify_fn(self, pages_bound: int, K: int):
        """Target verification + on-device greedy acceptance: one call
        scores the K tokens, computes the accepted-prefix length m per
        lane, and rolls each slot's length back to base + m + 1 (rejected
        tokens' K/V stay as length-masked garbage)."""
        key = ("verify", pages_bound, K)
        if key not in self._prefill_fns:
            mcfg, trash = self.mcfg, self._trash_slot
            axis = self.tp_axis

            def run(params, lora, caches, toks, positions, slots, qd, samp,
                    aids, key):
                logits, caches = tfm.decode_verify(
                    params, toks, positions, caches, slots, mcfg,
                    pages_bound=pages_bound, tp_axis=axis, lora=lora,
                    adapter_ids=aids)
                b, K_, v = logits.shape
                p_all = _trunc_dist(
                    logits.reshape(b * K_, v),
                    jnp.repeat(samp, K_, axis=0),
                ).reshape(b, K_, v)
                m, final = _spec_accept(toks, p_all, qd, key)
                # raw log-softmax logprobs of the emitted tokens: each
                # accepted proposal at its scoring position, the final
                # token at the cut position
                logp = jax.nn.log_softmax(logits, axis=-1)
                lp_prop = jnp.take_along_axis(
                    logp[:, : K_ - 1], toks[:, 1:, None], -1)[..., 0]
                lp_cut = jnp.take_along_axis(logp, m[:, None, None], 1)[:, 0]
                lp_final = jnp.take_along_axis(
                    lp_cut, final[:, None], -1)[:, 0]
                new_len = positions + m + 1
                caches = [dataclasses.replace(
                    c,
                    lengths=c.lengths.at[slots].set(new_len)
                    .at[trash].set(0),
                ) for c in caches]
                return final, m, lp_prop, lp_final, caches

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P
                from tpu_flash.parallel.shardings import (
                    cache_pspecs, param_pspecs,
                )

                pp = param_pspecs(self.params, axis)
                cs = [cache_pspecs(c, axis) for c in self.caches]
                run = jax.shard_map(
                    run, mesh=self.mesh,
                    in_specs=(pp, None, cs, P(), P(), P(), P(), P(), P(),
                              P()),
                    out_specs=(P(), P(), P(), P(), cs),
                    check_vma=False,
                )
            self._prefill_fns[key] = jax.jit(run, donate_argnums=(2,))
        return self._prefill_fns[key]

    def _set_draft_lengths_fn(self):
        dp = self._draft
        if "setlen" not in dp["fns"]:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(caches, slots, vals):
                return [dataclasses.replace(
                    c, lengths=c.lengths.at[slots].set(vals))
                    for c in caches]

            dp["fns"]["setlen"] = run
        return dp["fns"]["setlen"]

    def _decode_speculative(self, K: int) -> None:
        """One speculative round: draft proposes K−1 tokens per lane
        (sequential micro-steps of the small model, with catch-up feeds for
        confirmed tokens the draft cache hasn't seen), ONE target verify
        call scores pending + proposals, and rejection sampling
        (_spec_accept) emits tokens distributed exactly as plain decoding
        would — greedy streams byte-identical, temperature streams from
        the same truncated-softmax law — in ~(1 + accepted) tokens per
        target call."""
        dp = self._draft
        mb = self.ecfg.max_batch
        lanes = sorted(self.running)[:mb]
        bound = self._pages_bound(ahead=K)

        # per-lane feed queues: confirmed tokens the draft hasn't stored
        # yet, ending with the pending token (normally just [pending])
        feeds = {s: self.running[s].tokens[dp["lens"].get(s, 0):]
                 for s in lanes}
        max_c = max(len(f) for f in feeds.values())
        steps = max_c + K - 2  # catch-up then K−1 proposals for every lane
        dpos = {s: dp["lens"].get(s, 0) for s in lanes}
        proposals = {s: [] for s in lanes}
        last_out = {}
        samp_np = np.zeros((mb, 3), np.float32)
        samp_np[:, 2] = 1.0
        for lane, s in enumerate(lanes):
            r = self.running[s]
            samp_np[lane] = (r.temperature, r.top_k, r.top_p)
        samp = jnp.asarray(samp_np)
        step_fn = self._draft_step_fn(bound)
        q_steps = []  # per-micro-step draft dists (B, V), stay on device
        for si in range(steps):
            toks_np = np.zeros(mb, np.int32)
            pos_np = np.zeros(mb, np.int32)
            slots_np = np.full(mb, self._trash_slot, np.int32)
            for lane, s in enumerate(lanes):
                f = feeds[s]
                toks_np[lane] = (f[si] if si < len(f) else last_out[s])
                pos_np[lane] = dpos[s]
                slots_np[lane] = s
                dpos[s] += 1
            self._key, sub = jax.random.split(self._key)
            out, qrow, dp["caches"] = step_fn(
                dp["params"], dp["caches"], jnp.asarray(toks_np),
                jnp.asarray(pos_np), jnp.asarray(slots_np), samp, sub)
            q_steps.append(qrow)
            out = np.asarray(out)
            for lane, s in enumerate(lanes):
                if si >= len(feeds[s]) - 1:
                    proposals[s].append(int(out[lane]))
                last_out[s] = int(out[lane])
        # proposal i of lane s came from micro-step (len(feeds[s])−1)+i:
        # gather each lane's K−1 draft dists out of the stacked steps
        qall = jnp.stack(q_steps, axis=1)  # (B, S, V)
        idx_np = np.zeros((mb, K - 1), np.int32)
        for lane, s in enumerate(lanes):
            idx_np[lane] = len(feeds[s]) - 1 + np.arange(K - 1)
        qd = jnp.take_along_axis(
            qall, jnp.asarray(idx_np)[:, :, None], axis=1)  # (B, K-1, V)

        # target verification: pending + first K−1 proposals per lane
        toks_np = np.zeros((mb, K), np.int32)
        pos_np = np.zeros(mb, np.int32)
        slots_np = np.full(mb, self._trash_slot, np.int32)
        aids_np = np.full(mb, -1, np.int32)
        for lane, s in enumerate(lanes):
            r = self.running[s]
            toks_np[lane, 0] = r.next_token
            toks_np[lane, 1:] = proposals[s][:K - 1]
            pos_np[lane] = len(r.tokens) - 1
            slots_np[lane] = s
            aids_np[lane] = r.adapter_id
        self._key, sub = jax.random.split(self._key)
        final, m, lp_prop, lp_final, self.caches = self._verify_fn(bound, K)(
            self.params, self.lora, self.caches, jnp.asarray(toks_np),
            jnp.asarray(pos_np), jnp.asarray(slots_np), qd, samp,
            jnp.asarray(aids_np), sub)
        final, m = np.asarray(final), np.asarray(m)
        lp_prop, lp_final = np.asarray(lp_prop), np.asarray(lp_final)

        # apply accepted tokens + roll the draft back to confirmed ground
        dlens_np = np.zeros(mb, np.int32)
        for lane, s in enumerate(lanes):
            r = self.running[s]
            base = len(r.tokens) - 1
            acc = int(m[lane])
            self._spec_proposed += K - 1
            self._spec_accepted += acc
            # draft K/V is valid through the last confirmed position it
            # actually stored: catch-up ran through base, and of the
            # proposals d_i (at base+i) only d_1..d_{K−2} were ever fed
            valid = base + min(acc, K - 2)
            dlens_np[lane] = valid + 1
            dp["lens"][s] = valid + 1
            new_toks = [int(x) for x in toks_np[lane, 1:1 + acc]]
            new_toks.append(int(final[lane]))
            new_lps = [float(x) for x in lp_prop[lane, :acc]]
            new_lps.append(float(lp_final[lane]))
            for tok, lp in zip(new_toks, new_lps):
                r.tokens.append(tok)
                r.next_token = tok
                r.logprobs.append(lp)
                self._tokens_out += 1
                self._maybe_finish(s)
                if s not in self.running:
                    break
        dp["caches"] = self._set_draft_lengths_fn()(
            dp["caches"], jnp.asarray(slots_np), jnp.asarray(dlens_np))
        for s in list(dp["lens"]):
            if s not in self.running and s not in self.prefilling:
                dp["lens"].pop(s)



    # ---- public API -----------------------------------------------------

    def submit(self, req: Request) -> None:
        cap = self.ccfg.max_pages_per_seq * self.ccfg.page_size
        if len(req.prompt) + 1 > cap:
            raise ValueError(
                f"prompt of {len(req.prompt)} tokens exceeds per-sequence "
                f"cache capacity {cap}"
            )
        if req.adapter_id != -1 and self.lora is None:
            # Silently decoding an adapter request with the base model is
            # wrong output, not degraded service — reject at the door.
            # (Covers SeqShardedEngine too, which never carries a bank.)
            raise ValueError(
                f"request {req.rid} names adapter {req.adapter_id} but this "
                "engine was built without a LoRA bank"
            )
        self.waiting.append(req)

    def step(self) -> None:
        """Admit + prefill new requests, advance one chunked prefill, then
        advance all running sequences by one decode token."""
        t0 = time.monotonic()
        tok0 = self._tokens_out
        self._admit()
        self._advance_prefill()
        if self.running:
            self._decode()
        self._steps += 1
        if self._metrics_fh is not None:
            row = dict(
                step=self._steps,
                wall_ms=round((time.monotonic() - t0) * 1e3, 3),
                new_tokens=self._tokens_out - tok0,
                running=len(self.running),
                prefilling=len(self.prefilling),
                waiting=len(self.waiting),
                free_pages=self._alloc.num_free(),
                preemptions=self._preemptions,
            )
            if self._pcache is not None:
                row["prefix_cache"] = self._pcache.stats()
            if self._draft is not None:
                row["speculative"] = self.spec_stats()
            self._metrics_fh.write(json.dumps(row) + "\n")
            self._metrics_fh.flush()

    def close(self) -> None:
        if self._metrics_fh is not None:
            self._metrics_fh.close()
            self._metrics_fh = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def metrics(self) -> dict:
        """Aggregate engine counters (the per-step stream goes to
        ``EngineConfig.metrics_path`` as JSONL, the reference's
        logs→figures culture applied to serving)."""
        out = dict(
            steps=self._steps,
            tokens_out=self._tokens_out,
            preemptions=self._preemptions,
            finished=len(self.finished),
            free_pages=self._alloc.num_free(),
        )
        if self._pcache is not None:
            out["prefix_cache"] = self._pcache.stats()
        if self._draft is not None:
            out["speculative"] = self.spec_stats()
        return out

    def run(self, max_steps: int = 10_000) -> List[FinishedRequest]:
        steps = 0
        while (self.waiting or self.running or self.prefilling) and steps < max_steps:
            self.step()
            steps += 1
        self.flush()  # commit any async round left in flight
        return self.finished

    def stream(self, max_steps: int = 10_000):
        """Generator form of :meth:`run`: yields ``(rid, token, logprob)``
        for every generated token as soon as its engine step lands (a
        speculative round can yield several per rid at once), then the
        FinishedRequest when a request completes. Tokens stream in emit
        order, so a caller can forward them to clients incrementally."""
        # rid → [prompt_len last seen, tokens yielded in that basis]. A
        # preemption requeue absorbs generated tokens into the prompt, so
        # token indices restart at the grown prompt_len — detected by the
        # prompt_len change itself (queue membership races with same-step
        # re-admission) and compensated so every token is yielded exactly
        # once: pre-preempt yields came out of previous iterations, the
        # resumed indices count from the new base.
        state: dict[int, list] = {}
        done_seen = 0
        steps = 0

        def _drain():
            nonlocal done_seen
            out = []
            for r in list(self.running.values()):
                st = state.setdefault(r.rid, [r.prompt_len, 0])
                if r.prompt_len > st[0]:
                    st[1] = max(0, st[1] - (r.prompt_len - st[0]))
                    st[0] = r.prompt_len
                n = len(r.tokens) - r.prompt_len
                for i in range(st[1], n):
                    out.append((r.rid, r.tokens[r.prompt_len + i],
                                r.logprobs[i] if i < len(r.logprobs)
                                else None))
                st[1] = n
            while done_seen < len(self.finished):
                f = self.finished[done_seen]
                done_seen += 1
                st = state.pop(f.rid, [0, 0])
                for i in range(st[1], len(f.new_tokens)):
                    out.append((f.rid, f.new_tokens[i],
                                f.logprobs[i] if i < len(f.logprobs)
                                else None))
                out.append(f)
            return out

        while (self.waiting or self.running or self.prefilling) and steps < max_steps:
            self.step()
            steps += 1
            yield from _drain()
        self.flush()  # commit any async round left in flight
        yield from _drain()

    # ---- internals ------------------------------------------------------

    def _key_for(self, rid: int) -> np.ndarray:
        """The request's sampling base key: fold_in(PRNGKey(seed), rid).
        Pure in (seed, rid) — reproducible across resume and re-admission."""
        k = self._req_keys.get(rid)
        if k is None:
            k = np.asarray(jax.random.fold_in(
                jax.random.PRNGKey(self.ecfg.seed), rid & 0x7FFFFFFF))
            self._req_keys[rid] = k
        return k

    def _bucket(self, n: int) -> int:
        for b in self.ecfg.prefill_buckets:
            if n <= b:
                return b
        # beyond the configured buckets (long prompts, or preempted
        # sequences re-queued with their generated context): grow by
        # doubling, capped at the per-sequence cache capacity so the page
        # admission below can always succeed. Raising here would wedge the
        # admit loop forever (the request is still at the queue head).
        cap = self.ccfg.max_pages_per_seq * self.ccfg.page_size
        b = max(self.ecfg.prefill_buckets)
        while b < n:
            b *= 2
        return min(b, cap)

    def _sync_slot_tables(self, slot: int,
                          set_length: Optional[int] = None) -> None:
        # Allocator ids are shifted +1 (physical page 0 is the trash page);
        # entries beyond the allocated count stay 0 → trash.
        npages = self._alloc.num_pages(slot)
        mask = np.zeros(self.ccfg.max_pages_per_seq, np.int32)
        mask[:npages] = 1
        row = jnp.asarray((self._alloc.table(slot) + 1) * mask)
        # set_length: at ADMISSION the slot's device-side length must be set
        # before the first chunk's paged prefix attention reads it — 0 for a
        # fresh prompt (a recycled slot's stale length would mask in
        # [0, stale) of freshly granted old-content pages), or the cached
        # prefix length for a prefix-cache hit. Decode-time extends pass
        # None and keep the length.
        def sync(caches):
            return [
                dataclasses.replace(
                    c,
                    page_tables=c.page_tables.at[slot].set(row),
                    lengths=(c.lengths if set_length is None
                             else c.lengths.at[slot].set(set_length)),
                )
                for c in caches
            ]

        self.caches = sync(self.caches)
        if self._draft is not None:
            self._draft["caches"] = sync(self._draft["caches"])

    def _evict_for_pool(self) -> bool:
        """Drop LRU prefix-cache entries until at least one page actually
        returns to the pool (entries whose pages are still table-referenced
        free nothing). False when the cache is drained."""
        if self._pcache is None:
            return False
        while len(self._pcache):
            if self._pcache.evict(4):
                return True
        return False

    def _chunk_bucket(self, n: int) -> int:
        """Prefill-chunk bucket for an n-token tail: the power-of-two
        bucket rounded up to a page multiple (prefill_chunk writes whole
        pages)."""
        b = self._bucket(max(n, 1))
        ps = self.ccfg.page_size
        return -(-b // ps) * ps

    def _admit(self) -> None:
        while (
            self.waiting
            and self._free_slots
            and len(self.running) + len(self.prefilling) < self.ecfg.max_batch
        ):
            req = self.waiting[0]
            ps = self.ccfg.page_size
            cs = self.ecfg.chunk_size
            slot = self._free_slots[0]

            # Thundering-herd gate: if a currently-prefilling request
            # shares this one's first page, its full chain is about to be
            # published — admitting now would match only a stale short
            # chain and serve the whole shared prefix through the slow
            # chunked-tail path (measured in r3: 8 same-prefix requests
            # admitted together matched 1 page each, and the "warm" serve
            # ran 2.1x SLOWER than cold). Defer one step; the leader's
            # insert turns the rest into full-chain hits.
            if self._pcache is not None and self.prefilling:
                head = tuple(req.prompt[:ps])
                if any(tuple(st["req"].prompt[:ps]) == head
                       for st in self.prefilling.values()):
                    break

            # adapter-scoped prefix namespace: adapted K/V never shares
            # with the base model or other adapters (anchor -1 = base)
            shared = (self._pcache.match(req.prompt, ps,
                                         anchor=-2 - req.adapter_id)
                      if self._pcache is not None else [])
            # A sliver hit is a net loss: the shared path routes the tail
            # through chunked prefill (one paged-prefix call per chunk),
            # so taking it to save one page's compute trades a fast
            # whole-prompt prefill for a slow one. Require the cached
            # prefix to be worth it.
            if shared and (len(shared) * ps
                           < max(2 * ps, len(req.prompt) // 8)):
                shared = []
            if shared:
                # prefix hit: table = shared pages (copy-on-write) + fresh
                # tail pages; the tail prefills through the chunked path
                # starting at the cached offset, attending the shared
                # prefix through the paged kernel.
                cached = len(shared) * ps
                pages_needed = -(-(len(req.prompt) + 1) // ps)
                if not self._alloc.admit_shared(
                    slot, shared, pages_needed - len(shared)
                ):
                    if self._evict_for_pool():
                        continue  # freed pool pages; retry this request
                    break
                self.waiting.popleft()
                self._free_slots.popleft()
                self._sync_slot_tables(slot, set_length=cached)
                tail = len(req.prompt) - cached
                self.prefilling[slot] = dict(
                    req=req, done=cached, pages=pages_needed,
                    chunk=min(self._chunk_bucket(tail), cs or 10**9),
                )
                continue

            chunked = cs is not None and len(req.prompt) > cs
            bucket = cs if chunked else self._bucket(len(req.prompt) + 1)
            if chunked:
                # page-cover the whole prompt plus one decode token up front
                pages_needed = -(-(len(req.prompt) + 1) // ps)
            else:
                pages_needed = -(-bucket // ps)
            if not self._alloc.admit(slot, pages_needed):
                if self._evict_for_pool():
                    continue  # cache eviction freed pages; retry
                break  # pool exhausted; retry next step
            self.waiting.popleft()
            self._free_slots.popleft()
            self._sync_slot_tables(slot, set_length=0)
            if chunked:
                self.prefilling[slot] = dict(
                    req=req, done=0, pages=pages_needed
                )
            else:
                self._prefill(req, slot, bucket, pages_needed)

    def _chunk_fn(self, chunk: int, pages_bound: int, final: bool):
        """Jitted one-chunk prefill. ``pages_bound`` (static, bucketed)
        caps the per-layer prefix page scan — without it every chunk pays
        the full max_pages_per_seq grid (same overhead the decode path
        buckets away). Only the ``final`` variant samples: intermediate
        chunks' logits are dead, and sampling them would both waste two
        vocab-size argmaxes per chunk and burn an RNG split, making
        temperature>0 output depend on chunk_size."""
        key = ("chunk", chunk, pages_bound, final)
        if key not in self._prefill_fns:
            mcfg, axis = self.mcfg_prefill, self.tp_axis

            def run(params, lora, caches, tokens, offset, true_len, slot,
                    samp, aid, k):
                logits, _, caches = tfm.prefill_chunk(
                    params, tokens, offset, true_len, caches, slot, mcfg,
                    pages_bound=pages_bound, tp_axis=axis, lora=lora,
                    adapter_ids=aid[None],
                )
                if not final:
                    return jnp.full((2,), -1.0, jnp.float32), caches
                last = jax.lax.dynamic_index_in_dim(
                    logits[0], true_len - 1, keepdims=False
                )
                # first sampled token's absolute position = offset+true_len
                return _sample_packed(
                    last[None], samp[None], k[None],
                    (offset + true_len)[None])[0], caches

            if self.mesh is not None:
                from jax.sharding import PartitionSpec as P
                from tpu_flash.parallel.shardings import (
                    cache_pspecs, param_pspecs,
                )

                pp = param_pspecs(self.params, axis)
                cs_specs = [cache_pspecs(c, axis) for c in self.caches]
                run = jax.shard_map(
                    run, mesh=self.mesh,
                    in_specs=(pp, None, cs_specs, P(), P(), P(), P(), P(),
                              P()),
                    out_specs=(P(), cs_specs),
                    check_vma=False,
                )
            self._prefill_fns[key] = jax.jit(run, donate_argnums=(2,))
        return self._prefill_fns[key]

    def _advance_prefill(self) -> None:
        """Process ONE chunk of the oldest in-flight chunked prefill —
        long prompts stream through without stalling the decode batch."""
        if not self.prefilling:
            return
        slot, st = next(iter(self.prefilling.items()))
        req, done = st["req"], st["done"]
        cs = st.get("chunk") or self.ecfg.chunk_size
        chunk = req.prompt[done : done + cs]
        true_n = len(chunk)
        final = done + true_n >= len(req.prompt)
        toks = np.zeros((1, cs), np.int32)
        toks[0, :true_n] = chunk
        # static prefix-page bound for this chunk, bucketed to powers of two
        # (≤ log2 variants per chunk size compile over a prompt's lifetime)
        need = max(1, -(-done // self.ccfg.page_size))
        pb = 1
        while pb < need:
            pb *= 2
        pb = min(pb, self.ccfg.max_pages_per_seq)
        sub = jnp.asarray(self._key_for(req.rid))  # unused by non-final
        tok_lp, self.caches = self._chunk_fn(cs, pb, final)(
            self.params, self.lora, self.caches, jnp.asarray(toks),
            jnp.int32(done), jnp.int32(true_n), jnp.int32(slot),
            jnp.asarray([req.temperature, req.top_k, req.top_p],
                        jnp.float32), jnp.int32(req.adapter_id), sub,
        )
        st["done"] = done + true_n
        if st["done"] >= len(req.prompt):
            del self.prefilling[slot]
            if self._pcache is not None:
                self._pcache.insert(
                    req.prompt, self._alloc.table(slot),
                    self.ccfg.page_size, anchor=-2 - req.adapter_id,
                )
            if self._draft is not None:
                self._draft_prefill(req.prompt, slot)
            self._tokens_out += 1
            tok_lp = np.asarray(tok_lp)
            self.running[slot] = _Running(
                rid=req.rid,
                slot=slot,
                tokens=list(req.prompt) + [int(tok_lp[0])],
                prompt_len=len(req.prompt),
                max_new_tokens=req.max_new_tokens,
                temperature=req.temperature,
                top_k=req.top_k,
                top_p=req.top_p,
                eos_id=req.eos_id,
                stop_sequences=tuple(tuple(x) for x in req.stop_sequences),
                true_prompt_len=req.true_prompt_len,
                adapter_id=req.adapter_id,
                alloc_tokens=st["pages"] * self.ccfg.page_size,
                next_token=int(tok_lp[0]),
                logprobs=[float(tok_lp[1])],
            )
            self._maybe_finish(slot)

    def _write_fn(self, bucket: int):
        """Jitted, cache-donating writer for a whole prompt across all
        layers. Eager per-layer writes copied the entire page pool per
        layer per admission (XLA cannot update in place outside jit while
        the old cache is still referenced) — ~2·num_layers full-pool copies
        for every request."""
        if bucket not in self._write_fns:

            @functools.partial(jax.jit, donate_argnums=(0,))
            def run(caches, kv, slot, n):
                out = []
                for c, (k, v) in zip(caches, kv):
                    c = c.write_prompt(
                        slot, jnp.swapaxes(k[0], 0, 1), jnp.swapaxes(v[0], 0, 1)
                    )
                    # write_prompt set length to the padded bucket; fix to n.
                    out.append(dataclasses.replace(
                        c, lengths=c.lengths.at[slot].set(n)
                    ))
                return out

            self._write_fns[bucket] = run
        return self._write_fns[bucket]

    def _prefill(self, req: Request, slot: int, bucket: int, pages: int) -> None:
        n = len(req.prompt)
        toks = np.zeros((1, bucket), np.int32)
        toks[0, :n] = req.prompt
        tok_lp, kv = self._prefill_fn(bucket)(
            self.params, self.lora, jnp.asarray(toks), jnp.int32(n),
            jnp.asarray([req.temperature, req.top_k, req.top_p],
                        jnp.float32), jnp.int32(req.adapter_id),
            jnp.asarray(self._key_for(req.rid)),
        )
        # one donated jit writes every layer's K/V (padded tail is
        # page-covered and masked by length).
        self.caches = self._write_fn(bucket)(
            self.caches, kv, jnp.int32(slot), jnp.int32(n)
        )
        if self._pcache is not None:
            self._pcache.insert(
                req.prompt, self._alloc.table(slot), self.ccfg.page_size,
                anchor=-2 - req.adapter_id,
            )
        if self._draft is not None:
            self._draft_prefill(req.prompt, slot)
        self._tokens_out += 1
        tok_lp = np.asarray(tok_lp)
        tok = int(tok_lp[0])
        self.running[slot] = _Running(
            rid=req.rid,
            slot=slot,
            tokens=list(req.prompt) + [tok],
            prompt_len=n,
            max_new_tokens=req.max_new_tokens,
            temperature=req.temperature,
            top_k=req.top_k,
            top_p=req.top_p,
            eos_id=req.eos_id,
            stop_sequences=tuple(tuple(x) for x in req.stop_sequences),
            true_prompt_len=req.true_prompt_len,
            adapter_id=req.adapter_id,
            alloc_tokens=pages * self.ccfg.page_size,
            next_token=tok,
            logprobs=[float(tok_lp[1])],
        )
        self._maybe_finish(slot)

    def _ensure_capacity(self, slot: int, ahead: int = 1) -> str:
        """Make sure the slot can hold ``ahead`` more tokens (speculative
        rounds write K tokens' K/V before acceptance).

        Returns ``"ok"`` (has/got room), ``"cap"`` (the slot already owns
        max_pages_per_seq — no extension can EVER succeed, so the request
        must finish, not preempt: requeueing it would wedge the queue head
        re-failing admission forever), or ``"pool"`` (transient pool
        exhaustion — preempt and retry later)."""
        r = self.running[slot]
        # token j ahead lands at position len(tokens)-1 + j
        need = len(r.tokens) - 1 + ahead
        synced = False
        while need > r.alloc_tokens:
            if self._alloc.num_pages(slot) >= self.ccfg.max_pages_per_seq:
                return "cap"
            page = self._alloc.extend(slot)
            if page is None and self._evict_for_pool():
                # cached-but-unused pages are the lowest class of pool
                # citizen: evict before preempting a live sequence.
                page = self._alloc.extend(slot)
            if page is None:
                if synced:
                    self._sync_slot_tables(slot)
                return "pool"
            r.alloc_tokens += self.ccfg.page_size
            synced = True
        if synced:
            self._sync_slot_tables(slot)
        return "ok"

    def _finish_capacity(self, slot: int) -> None:
        """Terminate a sequence that hit its per-slot page ceiling."""
        r = self.running.pop(slot)
        self.finished.append(
            FinishedRequest(
                rid=r.rid,
                tokens=list(r.tokens),
                new_tokens=r.tokens[r.prompt_len:],
                reason="cap",
                logprobs=list(r.logprobs),
            )
        )
        self._alloc.free_seq(slot)
        self._free_slots.append(slot)

    def _preempt(self, slot: int) -> None:
        """Return a sequence to the waiting queue (re-prefill later)."""
        cap = self.ccfg.max_pages_per_seq * self.ccfg.page_size
        if len(self.running[slot].tokens) + 1 > cap:
            # requeueing would fail submit()'s capacity bound on
            # readmission; terminate instead of wedging the queue head.
            self._finish_capacity(slot)
            return
        r = self.running.pop(slot)
        self._preemptions += 1
        self._alloc.free_seq(slot)
        self._free_slots.append(slot)
        self.waiting.appendleft(
            Request(
                rid=r.rid,
                prompt=r.tokens,  # resume with generated context as prompt
                max_new_tokens=r.max_new_tokens - (len(r.tokens) - r.prompt_len),
                temperature=r.temperature,
                top_k=r.top_k,
                top_p=r.top_p,
                eos_id=r.eos_id,
                stop_sequences=r.stop_sequences,
                adapter_id=r.adapter_id,
                true_prompt_len=(r.true_prompt_len
                                 if r.true_prompt_len is not None
                                 else r.prompt_len),
            )
        )

    def _decode(self) -> None:
        # With a round in flight, host lengths lag the device by K — the
        # capacity probe must cover the in-flight appends too. Any
        # shortfall breaks the chain first, so finish/preempt below run
        # against exactly-committed state.
        if self._inflight is not None:
            ka = self._inflight["K"]
            if any(self._ensure_capacity(s, ahead=ka + 1) != "ok"
                   for s in sorted(self.running)):
                self.flush()
        # capacity check first (may finish at-cap sequences or preempt)
        for slot in sorted(self.running):
            status = self._ensure_capacity(slot)
            if status == "cap":
                self._finish_capacity(slot)
            elif status == "pool":
                self._preempt(slot)
        if not self.running:
            self.flush()  # every in-flight lane is dead — drain it
            return
        K = self.ecfg.speculate_k
        if self._draft is not None and K > 1:
            self.flush()  # speculative rounds need committed state
            if not self.running:
                return
        if self._draft is not None and K > 1:
            # every lane must page-cover the K pre-acceptance writes — a
            # lane that can't (cap or pool) degrades the whole round to
            # plain decoding, never errors.
            if all(self._ensure_capacity(s, ahead=K) == "ok"
                   for s in sorted(self.running)[:self.ecfg.max_batch]):
                self._decode_speculative(K)
                return
        if self.ecfg.decode_steps > 1:
            # bucket K to powers of two (≤ log2 variants compile); shrink
            # toward the tail so a batch one token from done doesn't pay a
            # full K-step scan of discards.
            remaining = max(
                r.max_new_tokens - (len(r.tokens) - r.prompt_len)
                for r in self.running.values())
            K = 1
            while K < min(self.ecfg.decode_steps, remaining):
                K *= 2
            K = min(K, self.ecfg.decode_steps)
            # chained rounds stack K in-flight appends on top of the next
            # round's K — cover both before issuing (see _decode_multi)
            ka = K + (self._inflight["K"] if self._inflight is not None
                      else 0)
            if K > 1 and all(
                    self._ensure_capacity(s, ahead=ka) == "ok"
                    for s in sorted(self.running)[:self.ecfg.max_batch]):
                self._decode_multi(K)
                return
        self.flush()  # the plain path fetches synchronously
        if not self.running:
            return
        mb = self.ecfg.max_batch
        slots_np = np.full(mb, self._trash_slot, np.int32)
        toks_np = np.zeros(mb, np.int32)
        pos_np = np.zeros(mb, np.int32)
        samp_np = np.zeros((mb, 3), np.float32)
        samp_np[:, 2] = 1.0  # idle lanes: top_p disabled
        aids_np = np.full(mb, -1, np.int32)
        keys_np = np.zeros((mb, 2), np.uint32)
        lanes = []
        for lane, slot in enumerate(sorted(self.running)):
            if lane >= mb:
                break
            r = self.running[slot]
            slots_np[lane] = slot
            toks_np[lane] = r.next_token
            pos_np[lane] = len(r.tokens) - 1  # position of the new token
            samp_np[lane] = (r.temperature, r.top_k, r.top_p)
            aids_np[lane] = r.adapter_id
            keys_np[lane] = self._key_for(r.rid)
            lanes.append(slot)
        packed, self.caches = self._decode_fn(self._pages_bound())(
            self.params,
            self.lora,
            self.caches,
            jnp.asarray(toks_np),
            jnp.asarray(pos_np),
            jnp.asarray(slots_np),
            jnp.asarray(samp_np),
            jnp.asarray(aids_np),
            jnp.asarray(keys_np),
        )
        packed = np.asarray(packed)
        for lane, slot in enumerate(lanes):
            r = self.running[slot]
            tok = int(packed[lane, 0])
            r.tokens.append(tok)
            r.next_token = tok
            r.logprobs.append(float(packed[lane, 1]))
            self._tokens_out += 1
            self._maybe_finish(slot)

    def _decode_composition(self):
        """Host-side arrays describing the current decode batch, plus the
        chain signature (everything the jitted call consumes EXCEPT tokens
        and positions — those are what an async chained round takes from
        the previous round's device outputs)."""
        mb = self.ecfg.max_batch
        slots_np = np.full(mb, self._trash_slot, np.int32)
        toks_np = np.zeros(mb, np.int32)
        pos_np = np.zeros(mb, np.int32)
        samp_np = np.zeros((mb, 3), np.float32)
        samp_np[:, 2] = 1.0  # idle lanes: top_p disabled
        aids_np = np.full(mb, -1, np.int32)
        keys_np = np.zeros((mb, 2), np.uint32)
        lanes = []
        for lane, slot in enumerate(sorted(self.running)):
            if lane >= mb:
                break
            r = self.running[slot]
            slots_np[lane] = slot
            toks_np[lane] = r.next_token
            pos_np[lane] = len(r.tokens) - 1
            samp_np[lane] = (r.temperature, r.top_k, r.top_p)
            aids_np[lane] = r.adapter_id
            keys_np[lane] = self._key_for(r.rid)
            lanes.append(slot)
        sig = (tuple(lanes), samp_np.tobytes(), aids_np.tobytes(),
               keys_np.tobytes())
        return (lanes, slots_np, toks_np, pos_np, samp_np, aids_np,
                keys_np, sig)

    def _commit_round(self, info) -> None:
        """Fetch a dispatched K-round and commit its tokens through the
        normal finish logic. Lanes that finished at an earlier j (or in an
        earlier round, for a flushed in-flight round) are discarded
        exactly like speculative rejections."""
        packed = np.asarray(info["packed"])  # (mb, K, 2)
        for j in range(info["K"]):
            for lane, slot in enumerate(info["lanes"]):
                if slot not in self.running:
                    continue  # finished earlier; discard the rest
                r = self.running[slot]
                if r.rid != info["rids"][lane]:
                    continue  # slot recycled by a NEWER request — discard
                tok = int(packed[lane, j, 0])
                r.tokens.append(tok)
                r.next_token = tok
                r.logprobs.append(float(packed[lane, j, 1]))
                self._tokens_out += 1
                self._maybe_finish(slot)

    def _rollback_lengths(self, info) -> None:
        # Roll cache lengths back to the committed counts. Engine invariant:
        # device length = len(r.tokens) − 1 (the pending next_token's K/V is
        # appended by the NEXT call). Surviving lanes already sit there
        # (a same-value set); finished/freed slots go to 0 — unless the
        # slot was already recycled by a newer request, whose own
        # committed length stands.
        lanes, slots_np = info["lanes"], info["slots_np"]
        lens_np = np.zeros(len(lanes), np.int32)
        for lane, slot in enumerate(lanes):
            r = self.running.get(slot)
            if r is not None and r.rid == info["rids"][lane]:
                lens_np[lane] = len(r.tokens) - 1
        self.caches = self._set_lengths_fn()(
            self.caches, jnp.asarray(slots_np[:len(lanes)]),
            jnp.asarray(lens_np))

    def flush(self) -> None:
        """Commit any in-flight async decode round (async_decode mode).

        Callers that need the host view exactly synced with the device —
        checkpointing, external cache surgery — call this first; the
        engine's own step loop flushes automatically whenever the batch
        composition changes or capacity tightens."""
        info, self._inflight = self._inflight, None
        if info is None:
            return
        self._commit_round(info)
        self._rollback_lengths(info)

    def _decode_multi(self, K: int) -> None:
        """One device dispatch advancing every running lane by K tokens.

        All K tokens' K/V append on-device (capacity pre-covered via
        ``_ensure_capacity(ahead=K)``); the host commits tokens in order
        through the normal finish logic — tokens generated past an
        eos/stop/length finish are discarded exactly like speculative
        rejections (their K/V stays as length-masked garbage).

        With ``async_decode`` (default), ONE dispatch is kept in flight:
        round N+1 is issued BEFORE round N's tokens are fetched, chained
        on round N's on-device ``(tokens, positions)`` outputs — the
        host fetch (a full tunnel round trip, the measured ~30 ms dispatch
        floor that left e2e at ~1% of device throughput,
        logs/decode.jsonl r4) overlaps the next round's device work, and
        the steady state pays ZERO host→device input transfers. The chain
        breaks (flush: fetch + commit + length rollback) whenever the
        batch composition changes — a finish, an admission, a preemption.
        Sampling is keyed per (request, position) (_device_sample), so the
        committed stream is bit-identical to the synchronous loop.
        """
        (lanes, slots_np, toks_np, pos_np, samp_np, aids_np, keys_np,
         sig) = self._decode_composition()
        use_async = self.ecfg.async_decode
        inflight = self._inflight
        if inflight is not None:
            if (use_async and inflight["sig"] == sig
                    and inflight["K"] == K):
                # chained issue: tokens/positions come from the previous
                # round's device outputs; slots/samp/aids/keys reuse the
                # already-transferred device arrays.
                info = self._issue_round(
                    K, lanes, slots_np,
                    inflight["ntok"], inflight["npos"],
                    inflight["slots_dev"], inflight["samp_dev"],
                    inflight["aids_dev"], inflight["keys_dev"], sig,
                    pages_ahead=2 * K)
                self._inflight = info
                self._commit_round(inflight)
                # finishes during this commit change the composition; the
                # NEXT call's sig mismatch flushes the new round cleanly.
                return
            self.flush()
            # the flush may have finished lanes / freed slots — rebuild
            (lanes, slots_np, toks_np, pos_np, samp_np, aids_np, keys_np,
             sig) = self._decode_composition()
            if not lanes:
                return
        info = self._issue_round(
            K, lanes, slots_np,
            jnp.asarray(toks_np), jnp.asarray(pos_np),
            jnp.asarray(slots_np), jnp.asarray(samp_np),
            jnp.asarray(aids_np), jnp.asarray(keys_np), sig,
            pages_ahead=2 * K if use_async else K)
        if use_async:
            self._inflight = info
            return
        self._commit_round(info)
        self._rollback_lengths(info)

    def _issue_round(self, K, lanes, slots_np, toks, pos, slots_dev,
                     samp_dev, aids_dev, keys_dev, sig, *, pages_ahead):
        packed, ntok, npos, self.caches = self._decode_multi_fn(
            self._pages_bound(ahead=pages_ahead), K)(
            self.params,
            self.lora,
            self.caches,
            toks,
            pos,
            slots_dev,
            samp_dev,
            aids_dev,
            keys_dev,
        )
        return dict(
            packed=packed, ntok=ntok, npos=npos, K=K, sig=sig,
            lanes=list(lanes), slots_np=np.array(slots_np),
            rids=[self.running[s].rid for s in lanes],
            slots_dev=slots_dev, samp_dev=samp_dev, aids_dev=aids_dev,
            keys_dev=keys_dev,
        )

    def _maybe_finish(self, slot: int) -> None:
        r = self.running.get(slot)
        if r is None:
            return
        produced = len(r.tokens) - r.prompt_len
        # stop sequences match against everything generated since the
        # ORIGINAL prompt — a preemption requeue absorbs generated tokens
        # into the prompt, and a stop straddling that boundary must fire
        gen_total = len(r.tokens) - (
            r.true_prompt_len if r.true_prompt_len is not None
            else r.prompt_len)
        reason = None
        if r.eos_id is not None and r.tokens[-1] == r.eos_id:
            reason = "eos"
        elif any(
            len(ss) and gen_total >= len(ss)
            and tuple(r.tokens[-len(ss):]) == tuple(ss)
            for ss in r.stop_sequences
        ):
            reason = "stop"
        elif produced >= r.max_new_tokens:
            reason = "length"
        if reason:
            self.finished.append(
                FinishedRequest(
                    rid=r.rid,
                    tokens=list(r.tokens),
                    new_tokens=r.tokens[r.prompt_len:],
                    reason=reason,
                    logprobs=list(r.logprobs)[: len(r.tokens) - r.prompt_len],
                )
            )
            del self.running[slot]
            self._alloc.free_seq(slot)
            self._free_slots.append(slot)


def _prefill_all_logits(params, tokens, cfg, tp_axis=None, lora=None,
                        adapter_ids=None):
    """Prefill returning logits for ALL positions (engine picks length-1)."""
    b, n = tokens.shape
    positions = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    x = params["embed"][tokens]
    loras = lora if lora is not None else [None] * len(params["layers"])
    kv = []
    for layer, le in zip(params["layers"], loras):
        x = tfm._block(layer, x, positions, cfg, collect_kv=kv,
                       tp_axis=tp_axis, lora_layer=le,
                       adapter_ids=adapter_ids)
    x = tfm.rmsnorm(x, params["ln_f"])
    logits = (x @ params["embed"].T).astype(jnp.float32)
    return logits, kv
