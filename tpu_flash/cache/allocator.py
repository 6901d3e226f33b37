"""Host-side page allocator: ctypes binding to the native pool
(csrc/pagepool.cpp), with a pure-Python fallback when no compiler exists.

The native pool owns admission control (all-or-nothing multi-page grants,
decode reservation watermark) so the serving engine can't leak or deadlock
pages; Python only mirrors the page tables into device arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "csrc")
_SO = os.path.join(_CSRC, "libpagepool.so")
_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(
            os.path.join(_CSRC, "pagepool.cpp")
        ):
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True, timeout=120
            )
        lib = ctypes.CDLL(_SO)
        lib.pp_create.restype = ctypes.c_void_p
        lib.pp_create.argtypes = [ctypes.c_int32] * 4
        lib.pp_destroy.argtypes = [ctypes.c_void_p]
        lib.pp_num_free.restype = ctypes.c_int32
        lib.pp_num_free.argtypes = [ctypes.c_void_p]
        lib.pp_admit.restype = ctypes.c_int32
        lib.pp_admit.argtypes = [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]
        lib.pp_extend.restype = ctypes.c_int32
        lib.pp_extend.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pp_free_seq.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pp_num_pages.restype = ctypes.c_int32
        lib.pp_num_pages.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pp_table.restype = ctypes.c_int32
        lib.pp_table.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.pp_restore.restype = ctypes.c_int32
        lib.pp_restore.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.pp_admit_shared.restype = ctypes.c_int32
        lib.pp_admit_shared.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.pp_retain.restype = ctypes.c_int32
        lib.pp_retain.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pp_release.restype = ctypes.c_int32
        lib.pp_release.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pp_refcount.restype = ctypes.c_int32
        lib.pp_refcount.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pp_pc_match.restype = ctypes.c_int32
        lib.pp_pc_match.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.pp_pc_insert.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int64,
        ]
        lib.pp_pc_evict.restype = ctypes.c_int32
        lib.pp_pc_evict.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        lib.pp_pc_len.restype = ctypes.c_int32
        lib.pp_pc_len.argtypes = [ctypes.c_void_p]
        lib.pp_pc_stats.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64)
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


class PageAllocator:
    """Allocator facade: native pool when available, Python otherwise."""

    def __init__(
        self,
        total_pages: int,
        max_seqs: int,
        max_pages_per_seq: int,
        decode_reserve: int = 0,
        force_python: bool = False,
    ):
        self.total_pages = total_pages
        self.max_seqs = max_seqs
        self.max_pages_per_seq = max_pages_per_seq
        self.decode_reserve = decode_reserve
        self._lib = None if force_python else _load_native()
        if self._lib is not None:
            self._h = self._lib.pp_create(
                total_pages, max_seqs, max_pages_per_seq, decode_reserve
            )
            if not self._h:
                raise ValueError("pp_create failed")
        else:
            self._free = list(range(total_pages - 1, -1, -1))
            self._tables = [[] for _ in range(max_seqs)]
            self._active = [False] * max_seqs
            self._refs = [0] * total_pages

    def _take_free(self) -> int:
        page = self._free.pop()
        self._refs[page] = 1
        return page

    def _drop_ref(self, page: int) -> None:
        self._refs[page] -= 1
        if self._refs[page] == 0:
            self._free.append(page)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def __del__(self):
        if getattr(self, "_lib", None) is not None and getattr(self, "_h", None):
            self._lib.pp_destroy(self._h)
            self._h = None

    def num_free(self) -> int:
        if self._lib is not None:
            return self._lib.pp_num_free(self._h)
        return len(self._free)

    def admit(self, slot: int, npages: int) -> bool:
        if self._lib is not None:
            return self._lib.pp_admit(self._h, slot, npages) == 0
        if (
            slot < 0
            or slot >= self.max_seqs
            or self._active[slot]
            or npages > self.max_pages_per_seq
            or len(self._free) < npages + self.decode_reserve
        ):
            return False
        self._tables[slot] = [self._take_free() for _ in range(npages)]
        self._active[slot] = True
        return True

    def admit_shared(self, slot: int, shared, n_new: int) -> bool:
        """Admit with a table of existing ``shared`` pages (prefix-cache
        hits; each gains a reference — copy-on-write sharing) followed by
        ``n_new`` fresh pages. Only the fresh pages count against the free
        pool + decode reserve. All-or-nothing."""
        shared = [int(p) for p in shared]
        if self._lib is not None:
            buf = (ctypes.c_int32 * max(1, len(shared)))(*(shared or [0]))
            return (
                self._lib.pp_admit_shared(
                    self._h, slot, buf, len(shared), n_new
                )
                == 0
            )
        if (
            slot < 0
            or slot >= self.max_seqs
            or self._active[slot]
            or n_new < 0
            or len(shared) + n_new > self.max_pages_per_seq
            or any(not (0 <= p < self.total_pages) or self._refs[p] <= 0
                   for p in shared)
            or len(self._free) < n_new + self.decode_reserve
        ):
            return False
        for p in shared:
            self._refs[p] += 1
        self._tables[slot] = shared + [self._take_free() for _ in range(n_new)]
        self._active[slot] = True
        return True

    def retain(self, page: int) -> bool:
        """Add a reference to a live page (prefix-cache retain)."""
        if self._lib is not None:
            return self._lib.pp_retain(self._h, page) > 0
        if not (0 <= page < self.total_pages) or self._refs[page] <= 0:
            return False
        self._refs[page] += 1
        return True

    def release(self, page: int) -> bool:
        """Drop a reference (prefix-cache eviction); frees the page at 0."""
        if self._lib is not None:
            return self._lib.pp_release(self._h, page) >= 0
        if not (0 <= page < self.total_pages) or self._refs[page] <= 0:
            return False
        self._drop_ref(page)
        return True

    def refcount(self, page: int) -> int:
        if self._lib is not None:
            return self._lib.pp_refcount(self._h, page)
        if not (0 <= page < self.total_pages):
            return -1
        return self._refs[page]

    def extend(self, slot: int) -> Optional[int]:
        if self._lib is not None:
            page = self._lib.pp_extend(self._h, slot)
            return None if page < 0 else page
        if (
            not self._active[slot]
            or len(self._tables[slot]) >= self.max_pages_per_seq
            or not self._free
        ):
            return None
        page = self._take_free()
        self._tables[slot].append(page)
        return page

    def free_seq(self, slot: int) -> None:
        if self._lib is not None:
            self._lib.pp_free_seq(self._h, slot)
            return
        if self._active[slot]:
            for p in self._tables[slot]:
                self._drop_ref(p)
            self._tables[slot] = []
            self._active[slot] = False

    def num_pages(self, slot: int) -> int:
        if self._lib is not None:
            return self._lib.pp_num_pages(self._h, slot)
        return len(self._tables[slot])

    def restore(self, slot: int, pages) -> bool:
        """Reinstate a slot's exact page table (checkpoint resume).

        Free pages are claimed; pages already live (restored into another
        slot first — prefix-shared tables) gain a reference. Duplicates
        within one table are rejected; all-or-nothing. Unlike
        :meth:`admit`, bypasses the decode reservation — the pages were
        already admitted before the snapshot was taken.
        """
        pages = np.asarray(pages, np.int32)
        if self._lib is not None:
            buf = (ctypes.c_int32 * max(1, len(pages)))(*(pages.tolist() or [0]))
            return self._lib.pp_restore(self._h, slot, buf, len(pages)) == 0
        taken = set(pages.tolist())
        if (
            slot < 0
            or slot >= self.max_seqs
            or self._active[slot]
            or len(pages) > self.max_pages_per_seq
            or len(taken) != len(pages)
            or not all(0 <= p < self.total_pages for p in taken)
        ):
            return False
        self._free = [p for p in self._free if p not in taken]
        for p in pages.tolist():
            self._refs[p] += 1
        self._tables[slot] = list(pages.tolist())
        self._active[slot] = True
        return True

    # ---- native prefix-cache index (csrc pp_pc_*) ----------------------
    # The index lives in the pool (one mutex covers it and the page refs
    # it takes); these wrappers own the ctypes marshalling so the
    # PrefixCache facade never touches the handle. All native-only — the
    # pure-Python PrefixCache fallback keeps its own structures.

    def pc_match(self, tokens, page_size: int, anchor: int = -1):
        n = len(tokens)
        toks = (ctypes.c_int32 * max(1, n))(*(list(tokens) or [0]))
        cap = max(1, (n - 1) // page_size) if n else 1
        out = (ctypes.c_int32 * cap)()
        got = self._lib.pp_pc_match(self._h, toks, n, page_size, anchor,
                                    out, cap)
        return [int(out[i]) for i in range(max(0, got))]

    def pc_insert(self, tokens, table, page_size: int, max_entries: int,
                  anchor: int = -1) -> None:
        n = len(tokens)
        npages = min(n // page_size, len(table))
        toks = (ctypes.c_int32 * max(1, n))(*(list(tokens) or [0]))
        tab = (ctypes.c_int32 * max(1, npages))(
            *([int(p) for p in table[:npages]] or [0]))
        self._lib.pp_pc_insert(self._h, toks, n, tab, npages, page_size,
                               max_entries, anchor)

    def pc_evict(self, n: int) -> int:
        return self._lib.pp_pc_evict(self._h, n)

    def pc_len(self) -> int:
        return self._lib.pp_pc_len(self._h)

    def pc_stats(self) -> dict:
        out = (ctypes.c_int64 * 4)()
        self._lib.pp_pc_stats(self._h, out)
        return dict(hits=int(out[0]), misses=int(out[1]),
                    hit_tokens=int(out[2]), entries=int(out[3]))

    def table(self, slot: int) -> np.ndarray:
        """Slot's page ids padded with zeros to max_pages_per_seq."""
        out = np.zeros(self.max_pages_per_seq, np.int32)
        if self._lib is not None:
            buf = (ctypes.c_int32 * self.max_pages_per_seq)()
            n = self._lib.pp_table(self._h, slot, buf, self.max_pages_per_seq)
            out[:n] = np.frombuffer(buf, np.int32, n)
        else:
            t = self._tables[slot]
            out[: len(t)] = t
        return out
