"""Paged KV-cache: fixed-size pages in HBM, per-sequence page tables.

The reference has no KV-cache at all (it is a kernel study); this is the
north-star's storage layer for continuous-batching inference. Design points:

* pages are ``(page_size, head_dim)`` tiles stored as
  ``(kv_heads, total_pages, page_size, head_dim)`` — the layout the paged
  decode kernel (ops/paged.py) DMAs directly, one page per grid step, with
  the page id coming from a scalar-prefetched page table;
* dtype ∈ {bf16/f32, int8, int4-packed}; quantized pages carry per-token
  scales ``(kv_heads, total_pages, page_size)`` so appends quantize one
  token at a time without touching old pages;
* page allocation is host-side (cache/allocator.py — C++ free list with a
  Python fallback); this module only does the device-side reads/writes.

All updates are functional (returns a new pytree) and jit-compatible:
indices are data, shapes are static.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_flash.quant.qarray import quantize, quantize_int4_halves


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    num_kv_heads: int
    head_dim: int
    page_size: int = 64
    total_pages: int = 1024
    max_seqs: int = 64
    max_pages_per_seq: int = 128
    dtype: str = "bfloat16"  # bfloat16 | float32 | int8 | int4 | fp8
    # ("fp8" ≡ float8_e4m3fn pages + per-token f32 scales, same scale
    # machinery as int8; in-kernel dequant via the `_fp8_upcast` bit-trick)

    @property
    def quantized(self) -> bool:
        return self.dtype in ("int8", "int4", "fp8", "float8_e4m3fn")

    @property
    def fp8(self) -> bool:
        return self.dtype in ("fp8", "float8_e4m3fn")

    @property
    def storage_head_dim(self) -> int:
        return self.head_dim // 2 if self.dtype == "int4" else self.head_dim

    @property
    def storage_dtype(self):
        if self.fp8:
            return jnp.float8_e4m3fn
        if self.quantized:
            return jnp.int8
        return jnp.dtype(self.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    """Device state of the paged cache.

    ``page_tables[s, i]`` = physical page id of logical page ``i`` of
    sequence-slot ``s``; ``lengths[s]`` = tokens currently stored.
    """

    k_pages: jnp.ndarray  # (kv_heads, total_pages, page, stor_dim)
    v_pages: jnp.ndarray
    k_scales: Optional[jnp.ndarray]  # (kv_heads, total_pages, page) or None
    v_scales: Optional[jnp.ndarray]
    page_tables: jnp.ndarray  # (max_seqs, max_pages_per_seq) int32
    lengths: jnp.ndarray  # (max_seqs,) int32
    config: CacheConfig = dataclasses.field(metadata=dict(static=True))

    @classmethod
    def create(cls, config: CacheConfig) -> "PagedKVCache":
        shape = (
            config.num_kv_heads,
            config.total_pages,
            config.page_size,
            config.storage_head_dim,
        )
        sc_shape = (config.num_kv_heads, config.total_pages, config.page_size)
        quant = config.quantized
        return cls(
            k_pages=jnp.zeros(shape, config.storage_dtype),
            v_pages=jnp.zeros(shape, config.storage_dtype),
            k_scales=jnp.ones(sc_shape, jnp.float32) if quant else None,
            v_scales=jnp.ones(sc_shape, jnp.float32) if quant else None,
            page_tables=jnp.zeros(
                (config.max_seqs, config.max_pages_per_seq), jnp.int32
            ),
            lengths=jnp.zeros((config.max_seqs,), jnp.int32),
            config=config,
        )

    # -- encoding -----------------------------------------------------------

    def _encode(self, x: jnp.ndarray):
        """(…, head_dim) f32/bf16 → (values (…, stor_dim), scales (…,) | None).

        Shares the quantizers in quant/qarray.py; the Pallas append kernel's
        in-register copy (ops/paged.py:_encode_row) must stay bit-identical.
        """
        cfg = self.config
        if cfg.dtype == "int8":
            qa = quantize(x, jnp.int8, axis=-1)
            return qa.values, qa.scales[..., 0]
        if cfg.fp8:
            qa = quantize(x, jnp.float8_e4m3fn, axis=-1)
            return qa.values, qa.scales[..., 0]
        if cfg.dtype == "int4":
            qa = quantize_int4_halves(x, axis=-1)
            return qa.values, qa.scales[..., 0]
        return x.astype(self.k_pages.dtype), None

    # -- writes -------------------------------------------------------------

    def assign_pages(self, slot_pages: jnp.ndarray) -> "PagedKVCache":
        """Install host-allocated page tables: (max_seqs, max_pages_per_seq)."""
        return dataclasses.replace(self, page_tables=slot_pages.astype(jnp.int32))

    def write_prompt(
        self, slot, k: jnp.ndarray, v: jnp.ndarray
    ) -> "PagedKVCache":
        """Write a full prompt's K/V into sequence-slot ``slot``.

        k, v: ``(kv_heads, prompt_len, head_dim)``; prompt_len is static.
        The slot's page table must already cover ``ceil(prompt_len/page)``
        pages. Resets the slot length to ``prompt_len``.
        """
        return self.write_chunk(slot, k, v, 0)

    def write_chunk(
        self, slot, k: jnp.ndarray, v: jnp.ndarray, offset, valid_n=None
    ) -> "PagedKVCache":
        """Write a page-aligned CHUNK of a prompt at token ``offset``.

        k, v: ``(kv_heads, chunk_len, head_dim)``; ``offset`` (python int or
        traced scalar) must be a multiple of page_size (chunks are sized in
        pages). Sets the slot length to ``offset + valid_n`` — pass
        ``valid_n < chunk_len`` for a padded final chunk (the padded tail is
        page-covered and masked by length).
        """
        cfg = self.config
        if isinstance(offset, int) and offset % cfg.page_size:
            raise ValueError("chunk offset must be page-aligned")
        kh, n, d = k.shape
        page = cfg.page_size
        n_pad = -(-n // page) * page
        if n_pad != n:
            pad = ((0, 0), (0, n_pad - n), (0, 0))
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        num_pages = n_pad // page
        kv_vals, k_sc = self._encode(k)
        vv_vals, v_sc = self._encode(v)
        kv_vals = kv_vals.reshape(kh, num_pages, page, -1)
        vv_vals = vv_vals.reshape(kh, num_pages, page, -1)
        # Pad the table row so a final chunk whose padded tail runs past the
        # slot's allocation (or past max_pages_per_seq) resolves to entry 0
        # = the trash page — WITHOUT dynamic_slice's start-clamping, which
        # would silently shift the write onto earlier REAL pages.
        row = jnp.concatenate([
            self.page_tables[slot],
            jnp.zeros((num_pages,), self.page_tables.dtype),
        ])
        ids = jax.lax.dynamic_slice_in_dim(
            row, offset // page, num_pages
        )  # offset may be traced; dynamic_slice handles both
        k_pages = self.k_pages.at[:, ids].set(kv_vals)
        v_pages = self.v_pages.at[:, ids].set(vv_vals)
        k_scales, v_scales = self.k_scales, self.v_scales
        if k_sc is not None:
            k_scales = k_scales.at[:, ids].set(k_sc.reshape(kh, num_pages, page))
            v_scales = v_scales.at[:, ids].set(v_sc.reshape(kh, num_pages, page))
        valid = n if valid_n is None else valid_n
        return dataclasses.replace(
            self,
            k_pages=k_pages,
            v_pages=v_pages,
            k_scales=k_scales,
            v_scales=v_scales,
            lengths=self.lengths.at[slot].set(offset + valid),
        )

    def append(self, slots, k: jnp.ndarray, v: jnp.ndarray) -> "PagedKVCache":
        """Append ONE token per sequence for a batch of slots.

        slots: ``(B,)`` int32 slot ids; k, v: ``(B, kv_heads, head_dim)``.
        The target page must already be allocated in each slot's table.
        Increments lengths.
        """
        # Fused Pallas RMW (quantize in-register, one page block per lane):
        # the XLA scatter formulation (`.at[:, phys, offset].set`) costs
        # ~1.3 ms per layer on v5e — scatter serializes per index.
        from tpu_flash.ops.paged import fused_append

        k_pages, v_pages, k_scales, v_scales = fused_append(self, slots, k, v)
        return dataclasses.replace(
            self,
            k_pages=k_pages,
            v_pages=v_pages,
            k_scales=k_scales if k_scales is not None else self.k_scales,
            v_scales=v_scales if v_scales is not None else self.v_scales,
            lengths=self.lengths.at[slots].add(1),
        )

    # -- reads (debug/oracle path) -------------------------------------------

    def gather_kv(self, slot: int, max_len: int):
        """Reassemble a slot's K/V as f32 ``(kv_heads, max_len, head_dim)``
        (dequantized) — the oracle-side read used in tests."""
        cfg = self.config
        num_pages = -(-max_len // cfg.page_size)
        ids = self.page_tables[slot, :num_pages]
        k = self.k_pages[:, ids]  # (kh, np, page, stor)
        v = self.v_pages[:, ids]
        if cfg.dtype == "int4":
            from tpu_flash.quant.qarray import unpack_int4_halves

            k = unpack_int4_halves(k)
            v = unpack_int4_halves(v)
        k = k.astype(jnp.float32)
        v = v.astype(jnp.float32)
        if cfg.quantized:
            k = k * self.k_scales[:, ids][..., None]
            v = v * self.v_scales[:, ids][..., None]
        kh = cfg.num_kv_heads
        k = k.reshape(kh, -1, cfg.head_dim)[:, :max_len]
        v = v.reshape(kh, -1, cfg.head_dim)[:, :max_len]
        return k, v
