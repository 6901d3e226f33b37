"""Sequence-sharded serving engine: each layer's paged KV-cache split over
a mesh ``seq`` axis, decode merged with the (o, lse) algebra.

BASELINE config #5 asks for ring-attention decode with the KV-cache (INT4/
INT8) sharded over N hosts. This engine realizes it on a ``Mesh`` seq axis:

* every rank owns an independent page pool / page table / length vector
  (the cache arrays gain a leading shard dim sharded over ``seq``);
* a prompt's K/V are sliced contiguously across ranks at prefill
  (rank i holds global positions [i·Ls, (i+1)·Ls)); RoPE is applied before
  the write, so slices carry their global positions;
* every decode step runs ONE jitted shard_map: the dense stack is
  replicated (a single token per lane — not worth sharding), each rank
  attends its local slice through the paged kernel, partials merge with
  one psum pair (parallel/ring_decode.py), and the new token's K/V append
  lands only on the LAST rank, whose pool is the only one that grows;
* the host side keeps one PageAllocator per rank; capacity pressure and
  preemption follow the base engine's rules against the tail rank's pool.

Chunked prefill and tensor parallelism are not composed with sequence
sharding here (orthogonal features; the base engine provides them), and
sliding-window models are rejected (band positions are global).
"""

from __future__ import annotations

import dataclasses
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_flash.cache.allocator import PageAllocator
from tpu_flash.cache.paged_cache import CacheConfig, PagedKVCache
from tpu_flash.models import transformer as tfm
from tpu_flash.serving.engine import (
    Engine,
    EngineConfig,
    _sample_packed,
)


def _cache_specs(cache: PagedKVCache, axis: str):
    quant = cache.k_scales is not None
    return dataclasses.replace(
        cache,
        k_pages=P(axis), v_pages=P(axis),
        k_scales=P(axis) if quant else None,
        v_scales=P(axis) if quant else None,
        page_tables=P(axis), lengths=P(axis),
    )


_FIELDS = ("k_pages", "v_pages", "k_scales", "v_scales", "page_tables",
           "lengths")


def _map_fields(cache, fn):
    kw = {f: (fn(getattr(cache, f)) if getattr(cache, f) is not None else None)
          for f in _FIELDS}
    return dataclasses.replace(cache, **kw)


def _local(cache):
    """Strip the leading shard dim inside shard_map (block size 1)."""
    return _map_fields(cache, lambda a: a[0])


def _restack(cache):
    return _map_fields(cache, lambda a: a[None])


class SeqShardedEngine(Engine):
    """Engine with per-layer caches sharded over a mesh ``seq`` axis."""

    def __init__(
        self,
        params,
        model_cfg: tfm.ModelConfig,
        cache_cfg: CacheConfig,
        engine_cfg: EngineConfig = EngineConfig(),
        *,
        mesh,
        seq_axis: str = "seq",
    ):
        if engine_cfg.chunk_size is not None:
            raise NotImplementedError(
                "chunked prefill is not composed with sequence sharding"
            )
        if model_cfg.attention == "sliding":
            raise NotImplementedError("seq-sharded decode is causal-only")
        if engine_cfg.prefix_cache:
            # the base class would bind the PrefixCache to an allocator
            # this engine replaces with per-shard allocators — the feature
            # would silently no-op (every retain fails); reject instead
            raise NotImplementedError(
                "prefix caching is not composed with sequence sharding")
        if engine_cfg.speculate_k > 0:
            raise NotImplementedError(
                "speculative decoding is not composed with sequence "
                "sharding")
        super().__init__(params, model_cfg, cache_cfg, engine_cfg, mesh=None)
        self.mesh = mesh
        self.seq_axis = seq_axis
        self.n_shards = mesh.shape[seq_axis]
        S = self.n_shards
        # one independent pool per rank (page 0 stays the trash page)
        self._allocs = [
            PageAllocator(
                total_pages=cache_cfg.total_pages - 1,
                max_seqs=cache_cfg.max_seqs,
                max_pages_per_seq=cache_cfg.max_pages_per_seq,
                decode_reserve=engine_cfg.max_batch,
            )
            for _ in range(S)
        ]
        self._alloc = self._allocs[-1]  # base-class paths see the tail pool
        # stack the per-rank caches along a new leading dim, sharded on seq
        caches = []
        for c in self.caches:
            spec = _cache_specs(c, seq_axis)
            kw = {}
            for f in _FIELDS:
                val = getattr(c, f)
                if val is None:
                    kw[f] = None
                    continue
                stacked = jnp.broadcast_to(val[None], (S, *val.shape))
                kw[f] = jax.device_put(
                    stacked, NamedSharding(mesh, getattr(spec, f))
                )
            caches.append(dataclasses.replace(c, **kw))
        self.caches = caches
        self._seq_meta: dict[int, dict] = {}  # slot → {"lens0": [..], "n0": n}

    # ---- geometry -----------------------------------------------------

    def _slice_len(self, bucket: int) -> int:
        return bucket // self.n_shards

    def _bucket(self, n: int) -> int:
        # per-rank slices must be page-aligned → bucket % (S·page) == 0
        b = super()._bucket(n)
        gran = self.n_shards * self.ccfg.page_size
        b = -(-b // gran) * gran
        cap = self.ccfg.max_pages_per_seq * self.ccfg.page_size * self.n_shards
        return min(b, cap)

    def _shard_lens(self, slot: int) -> list[int]:
        meta = self._seq_meta[slot]
        r = self.running.get(slot)
        lens = list(meta["lens0"])
        if r is not None:
            # every decode-step append went to the tail rank
            lens[-1] += (len(r.tokens) - 1) - meta["n0"]
        return lens

    # ---- host-side page bookkeeping -----------------------------------

    def _sync_slot_tables(self, slot: int) -> None:
        rows = []
        for alloc in self._allocs:
            npages = alloc.num_pages(slot)
            mask = np.zeros(self.ccfg.max_pages_per_seq, np.int32)
            mask[:npages] = 1
            rows.append((alloc.table(slot) + 1) * mask)
        stacked = jnp.asarray(np.stack(rows))  # (S, max_pages_per_seq)
        self.caches = [
            dataclasses.replace(
                c, page_tables=c.page_tables.at[:, slot].set(stacked)
            )
            for c in self.caches
        ]

    def _admit(self) -> None:
        while (
            self.waiting
            and self._free_slots
            and len(self.running) < self.ecfg.max_batch
        ):
            req = self.waiting[0]
            bucket = self._bucket(len(req.prompt) + 1)
            ls = self._slice_len(bucket)
            pages_each = -(-ls // self.ccfg.page_size)
            slot = self._free_slots[0]
            ok = []
            for alloc in self._allocs:
                if alloc.admit(slot, pages_each):
                    ok.append(alloc)
                else:
                    break
            if len(ok) < len(self._allocs):
                for alloc in ok:  # roll back partial admission
                    alloc.free_seq(slot)
                break
            self.waiting.popleft()
            self._free_slots.popleft()
            self._sync_slot_tables(slot)
            n = len(req.prompt)
            lens0 = [int(np.clip(n - i * ls, 0, ls))
                     for i in range(self.n_shards)]
            self._seq_meta[slot] = {"lens0": lens0, "n0": n}
            self._prefill(req, slot, bucket, pages_each * self.n_shards)

    def _ensure_capacity(self, slot: int) -> str:
        tail = self._shard_lens(slot)[-1]
        cap_tail = self._allocs[-1].num_pages(slot) * self.ccfg.page_size
        if tail + 1 <= cap_tail:
            return "ok"
        if self._allocs[-1].num_pages(slot) >= self.ccfg.max_pages_per_seq:
            return "cap"
        page = self._allocs[-1].extend(slot)
        if page is not None:
            self._sync_slot_tables(slot)
            return "ok"
        return "pool"

    def _finish_capacity(self, slot: int) -> None:
        super()._finish_capacity(slot)
        # super() freed only the tail pool (self._alloc); free the rest
        for alloc in self._allocs[:-1]:
            alloc.free_seq(slot)
        self._seq_meta.pop(slot, None)

    def _preempt(self, slot: int) -> None:
        in_running = slot in self.running
        super()._preempt(slot)
        if in_running and slot not in self.running:
            for alloc in self._allocs[:-1]:
                alloc.free_seq(slot)
            self._seq_meta.pop(slot, None)

    def _maybe_finish(self, slot: int) -> None:
        was = slot in self.running
        super()._maybe_finish(slot)
        if was and slot not in self.running:
            for alloc in self._allocs[:-1]:
                alloc.free_seq(slot)
            self._seq_meta.pop(slot, None)

    def _pages_bound(self) -> int:
        if self.ecfg.pages_bound is not None:
            return self.ecfg.pages_bound
        ps = self.ccfg.page_size
        need = 1
        for slot in self.running:
            need = max(need, max(
                -(-l // ps) for l in self._shard_lens(slot)) or 1)
        bound = 4
        while bound < need:
            bound *= 4
        return min(bound, self.ccfg.max_pages_per_seq)

    # ---- jitted entry points ------------------------------------------

    def _write_fn(self, bucket: int):
        """Shard-sliced prompt write: rank i stores tokens [i·Ls, (i+1)·Ls)
        of the (padded) bucket into its local pool."""
        key = ("seqw", bucket)
        if key not in self._write_fns:
            ls = self._slice_len(bucket)
            axis = self.seq_axis

            def run(caches, kv, slot, n):
                sidx = jax.lax.axis_index(axis)
                off = sidx * ls
                out = []
                for c, (k, v) in zip(caches, kv):
                    local = _local(c)
                    ksl = jax.lax.dynamic_slice_in_dim(
                        jnp.swapaxes(k[0], 0, 1), off, ls, axis=1
                    )
                    vsl = jax.lax.dynamic_slice_in_dim(
                        jnp.swapaxes(v[0], 0, 1), off, ls, axis=1
                    )
                    local = local.write_prompt(slot, ksl, vsl)
                    llen = jnp.clip(n - off, 0, ls)
                    local = dataclasses.replace(
                        local, lengths=local.lengths.at[slot].set(llen)
                    )
                    out.append(_restack(local))
                return out

            cs = [_cache_specs(c, axis) for c in self.caches]
            kv_spec = [(P(), P()) for _ in range(self.mcfg.num_layers)]
            run = jax.shard_map(
                run, mesh=self.mesh,
                in_specs=(cs, kv_spec, P(), P()),
                out_specs=cs,
                check_vma=False,
            )
            self._write_fns[key] = jax.jit(run, donate_argnums=(0,))
        return self._write_fns[key]

    def _decode_fn(self, pages_bound: int):
        if pages_bound not in self._decode_fns:
            mcfg, axis = self.mcfg, self.seq_axis
            trash = self._trash_slot

            def run(params, lora, caches, tokens, positions, slots, samp,
                    aids, key):
                # lora/aids ride the base-class call signature; this engine
                # is constructed without an adapter bank (multi-LoRA is not
                # composed with sequence sharding), so lora is None and every
                # lane's aid is -1 — both are ignored here.
                del lora, aids
                locals_ = [_local(c) for c in caches]
                logits, locals_ = tfm.decode_step_seq(
                    params, tokens, positions, locals_, slots, mcfg,
                    axis_name=axis, pages_bound=pages_bound,
                )
                locals_ = [
                    dataclasses.replace(
                        c, lengths=c.lengths.at[trash].set(0)
                    )
                    for c in locals_
                ]
                return (
                    _sample_packed(logits, samp, key, positions + 1),
                    [_restack(c) for c in locals_],
                )

            cs = [_cache_specs(c, axis) for c in self.caches]
            run = jax.shard_map(
                run, mesh=self.mesh,
                in_specs=(P(), None, cs, P(), P(), P(), P(), P(), P()),
                out_specs=(P(), cs),
                check_vma=False,
            )
            self._decode_fns[pages_bound] = jax.jit(run, donate_argnums=(2,))
        return self._decode_fns[pages_bound]
