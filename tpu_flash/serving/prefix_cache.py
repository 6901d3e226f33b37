"""Prefix caching: copy-on-write sharing of prompt KV pages.

Serving workloads repeat prompt prefixes constantly (system prompts,
few-shot templates, multi-turn histories). Because attention is causal,
a page of K/V depends only on the tokens at and before it — so a full
page computed for one sequence is byte-for-byte the page any other
sequence with the same token prefix needs. This module indexes full
prompt pages by content and lets the engine skip both the prefill
compute and the page memory for every cached prefix page.

Design (vLLM-lineage, restated for this engine's native allocator):

* **Full pages only.** A sequence's trailing partial page is private
  (decode appends land there); only pages completely covered by the
  prompt are immutable and shareable.
* **Content addressing by chain key.** Each full page is keyed by
  ``(parent_page_id, page_tokens)``: the physical id of the preceding
  cached page plus this page's own tokens. The chain anchors at
  parent=-1, so a key transitively pins the entire token prefix without
  storing O(n²) prefix copies; equality is exact (no hash collisions —
  the tokens are the key).
* **Refcounts live in the native pool** (csrc/pagepool.cpp). A table
  entry holds one reference, the cache holds one per retained page;
  sharing is ``pp_admit_shared`` (incref + fresh tail pages in one
  atomic grant) and eviction is ``pp_release``. The engine's existing
  free/preempt paths need no special cases — a shared page simply
  outlives any one sequence.
* **LRU eviction**, by entry count (bounded host memory) and on demand
  when the pool runs dry: the engine evicts before preempting, turning
  cache residency into the lowest class of pool citizen.

The reference has no serving layer at all (SURVEY §5: north-star
territory); this is the piece that makes the paged cache a cache in the
resource-management sense, not just an allocation scheme.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import List, Sequence


class PrefixCache:
    """Content-addressed index of immutable full prompt pages.

    ``alloc`` is the engine's PageAllocator; page ids are allocator-space
    (the engine shifts +1 for device tables). ``max_entries`` bounds the
    index; eviction releases the cache's page reference (LRU first).
    """

    def __init__(self, alloc, max_entries: int = 4096):
        self._alloc = alloc
        self._max = max_entries
        # Native pool available → the index lives in C++ next to the
        # refcounts it manipulates (csrc/pagepool.cpp pp_pc_*): one lock
        # covers match/insert/evict and the page references they take,
        # and the admission hot path stays out of Python. The pure-Python
        # structures below are the fallback (and the semantics reference).
        self._native = alloc.native
        # (parent_entry_id, tokens) -> (page, entry_id). Chains link by a
        # MONOTONIC entry id, never the physical page id: page ids recycle
        # through the pool, and keying children by a recycled parent page
        # would resolve stale entries (K/V computed under a different
        # prefix) after the parent's eviction. Entry ids never recycle, so
        # a chain whose parent was evicted is simply unreachable until LRU
        # drains it.
        self._map: OrderedDict = OrderedDict()
        self._next_id = 0
        self.hits = 0
        self.misses = 0
        self.hit_tokens = 0

    def __len__(self) -> int:
        if self._native:
            return self._alloc.pc_len()
        return len(self._map)

    def match(self, prompt: Sequence[int], page_size: int,
              anchor: int = -1) -> List[int]:
        """Longest cached page chain covering a page-aligned prefix.

        Leaves at least one prompt token uncovered — the engine must still
        run a (tail) prefill to produce next-token logits. Returns the
        allocator page ids, oldest first; updates LRU order and stats.
        ``anchor`` (< 0) scopes the chain root: cached K/V depend on the
        LoRA adapter that computed them, so each adapter gets its own
        namespace (base model = -1).
        """
        if self._native:
            return self._alloc.pc_match(prompt, page_size, anchor)
        pages: List[int] = []
        parent = anchor
        max_full = (len(prompt) - 1) // page_size
        for i in range(max_full):
            key = (parent, tuple(prompt[i * page_size:(i + 1) * page_size]))
            hit = self._map.get(key)
            if hit is None:
                break
            self._map.move_to_end(key)
            page, parent = hit
            pages.append(page)
        if pages:
            self.hits += 1
            self.hit_tokens += len(pages) * page_size
        else:
            self.misses += 1
        return pages

    def insert(self, prompt: Sequence[int], table, page_size: int,
               anchor: int = -1) -> None:
        """Register a prefilled slot's full prompt pages.

        ``table``: the slot's allocator page ids in order (may begin with
        already-shared pages — those dedupe onto the existing entries and
        the chain continues through the cached copy). Each newly indexed
        page gains a cache reference so it survives its sequence.
        """
        if self._native:
            self._alloc.pc_insert(prompt, table, page_size, self._max,
                                  anchor)
            return
        parent = anchor
        for i in range(len(prompt) // page_size):
            key = (parent, tuple(prompt[i * page_size:(i + 1) * page_size]))
            cur = self._map.get(key)
            if cur is not None:
                self._map.move_to_end(key)
                parent = cur[1]
                continue
            page = int(table[i])
            if not self._alloc.retain(page):
                break  # page not live (shouldn't happen mid-prefill)
            self._next_id += 1
            self._map[key] = (page, self._next_id)
            parent = self._next_id
            if len(self._map) > self._max:
                self.evict(1)

    def evict(self, n: int = 1) -> int:
        """Release the ``n`` least-recently-used entries.

        Returns how many pages actually went back to the free pool (an
        entry whose page is still table-referenced frees nothing yet).
        """
        if self._native:
            return self._alloc.pc_evict(n)
        freed = 0
        for _ in range(min(n, len(self._map))):
            _, (page, _id) = self._map.popitem(last=False)
            if self._alloc.refcount(page) == 1:
                freed += 1
            self._alloc.release(page)
        return freed

    def clear(self) -> None:
        self.evict(len(self))

    def stats(self) -> dict:
        if self._native:
            return self._alloc.pc_stats()
        return dict(entries=len(self._map), hits=self.hits,
                    misses=self.misses, hit_tokens=self.hit_tokens)
