"""Block schedules: which KV blocks each Q block visits, and in-block masks.

This is the TPU-native re-expression of the reference's sparsity machinery.
Where the reference realizes sparsity either by materializing patch copies
(windowed, src/windowed.jl:3-23) or by per-element index gathers through
``cartesian_circulant`` (circulant, src/circulant.jl:68-79), a TPU kernel
must touch only contiguous, tile-aligned blocks. Every attention pattern is
therefore described by a :class:`Schedule`:

* a rectangular Pallas grid ``(batch·heads, num_q_blocks, max_kv_steps)``,
* ``kv_block_index(i, s)`` — which KV block the s-th step of Q block ``i``
  loads (duplicate indices are coalesced by Pallas's revisit detection, so
  "skipped" steps cost no DMA),
* ``step_needed(i, s)`` — predicate gating compute for that step (block
  skipping: the performance point of the reference's block_fa ≪ dense_fa,
  logs/compare1.txt),
* ``mask(q_pos, k_pos)`` — the in-block elementwise mask for partial blocks
  (band edges, causality, sequence padding).

The circulant band's wraparound seam is removed *before* the kernel by
extending K/V with halo copies (``k_ext = [k[-p:], k, k[:p]]``), turning the
mod-N band (reference src/utils.jl:6-17) into a contiguous sliding band over
the extended sequence — no gathers, at most ``2p`` duplicated rows.

All index arithmetic here runs either at trace time (Python ints) or inside
index maps / kernels (traced int32); nothing is data-dependent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


@dataclasses.dataclass(frozen=True)
class Schedule:
    """Base: dense (every Q block visits every KV block).

    ``n_q``/``n_kv`` are the *real* (unpadded) lengths; ``n_q_pad``/
    ``n_kv_pad`` the padded lengths the kernel actually runs on. Positions
    passed to :meth:`mask` are global padded coordinates.
    """

    n_q: int
    n_kv: int
    block_q: int
    block_kv: int

    @property
    def n_q_pad(self) -> int:
        return cdiv(self.n_q, self.block_q) * self.block_q

    @property
    def n_kv_pad(self) -> int:
        return cdiv(self.kv_len, self.block_kv) * self.block_kv

    @property
    def kv_len(self) -> int:
        """Length of the (possibly extended) KV sequence before padding."""
        return self.n_kv

    @property
    def num_q_blocks(self) -> int:
        return cdiv(self.n_q, self.block_q)

    @property
    def num_kv_blocks(self) -> int:
        return cdiv(self.kv_len, self.block_kv)

    @property
    def max_kv_steps(self) -> int:
        return self.num_kv_blocks

    def kv_block_index(self, i, s):
        return s

    def step_needed(self, i, s):
        return True

    # -- transposed iteration (KV-major), used by the dK/dV backward kernel.
    # For KV block ``j``, which Q blocks visit it? This is the safe answer to
    # the reference's unsynchronized OpenMP dK/dV accumulation race
    # (src_cpp/FlashAttention.cpp:300-312): the backward runs a second grid
    # whose parallel dimension is KV blocks, so each dK/dV tile has exactly
    # one writer.

    @property
    def max_q_steps(self) -> int:
        return self.num_q_blocks

    def q_block_index(self, j, s):
        return s

    def q_step_needed(self, j, s):
        return True

    @property
    def has_mask(self) -> bool:
        return self.kv_len % self.block_kv != 0

    def mask(self, q_pos, k_pos) -> Optional[jnp.ndarray]:
        if not self.has_mask:
            return None
        return k_pos < self.kv_len

    def block_unmasked(self, i, s):
        """Traced bool: the (i, s) tile has NO masked element, so the kernel
        may skip the iota/compare/where entirely (interior-block fast path —
        on band schedules most visited tiles are interior, and paying the
        full elementwise mask on them was the main reason sparse speedup
        lagged coverage). ``None`` means "cannot cheaply decide; always
        mask". Conservative (may say False for an unmasked tile), never
        wrong the other way."""
        if not self.has_mask:
            return None
        return self._kv_pad_ok(self.kv_block_index(i, s))

    def _kv_pad_ok(self, kv_idx):
        """Tile at kv block ``kv_idx`` lies fully inside the real kv range."""
        if self.kv_len % self.block_kv == 0:
            return True
        return (kv_idx + 1) * self.block_kv <= self.kv_len

    def _and_kv_pad(self, m, k_pos):
        if self.kv_len % self.block_kv != 0:
            m = jnp.logical_and(m, k_pos < self.kv_len)
        return m

    def bias_pattern_info(self, max_tiles: int = 4096):
        """Dedupe the per-tile masks into a small set of precomputed
        patterns, so the kernel replaces the iota/compare/where chain
        (~5 VPU passes over the score tile) with ONE add of a streamed
        additive-bias tile.

        Valid because every schedule's mask is a function of the tile's
        block offset ``o = i·bq − kv_idx·bkv`` (all conditions compare
        ``q_pos − k_pos``) plus the single ragged-last-KV-block flag, so
        distinct tile contents are indexed by ``(o, is_last_ragged)`` —
        a handful of patterns regardless of grid size. Returns
        ``(patterns (P, bq, bkv) bool ndarray, pid(i, s) → traced idx)``
        or None when no mask exists / the grid enumeration is too large.
        """
        if not self.has_mask:
            return None
        if self.num_q_blocks * self.max_kv_steps > max_tiles:
            return None
        import math as _math

        import jax as _jax
        import numpy as _np

        bq, bkv = self.block_q, self.block_kv
        g = _math.gcd(bq, bkv)
        ragged = self.kv_len % bkv != 0
        last_block = self.num_kv_blocks - 1
        # Enumerate visited offsets at compile time (the caller is usually
        # inside a jit trace, where jnp ops on constants would be staged
        # as tracers) and on the CPU backend (eager ops would otherwise
        # round-trip the TPU tunnel per tile, ~30 ms each).
        # local_devices, not devices: under a multi-process launch the
        # first GLOBAL cpu device belongs to process 0 and is
        # non-addressable from other ranks (tests/test_multihost.py).
        cpu = _jax.local_devices(backend="cpu")[0]
        try:
            with _jax.ensure_compile_time_eval(), _jax.default_device(cpu):
                offs = set()
                for i in range(self.num_q_blocks):
                    for s in range(self.max_kv_steps):
                        if not bool(self.step_needed(i, s)):
                            continue
                        offs.add(
                            i * bq - int(self.kv_block_index(i, s)) * bkv)
                if not offs:
                    return None
                omin, omax = min(offs), max(offs)
                num_o = (omax - omin) // g + 1
                a = _np.arange(bq)[:, None]
                b = _np.arange(bkv)[None, :]
                pats = []
                for lastflag in [False, True] if ragged else [False]:
                    kstart = last_block * bkv if lastflag else 0
                    for oi in range(num_o):
                        o = omin + oi * g
                        m = self.mask(
                            jnp.asarray(kstart + o + a),
                            jnp.asarray(kstart + b),
                        )
                        # masks that ignore one coordinate (e.g. the dense
                        # kv-padding mask) come back partially broadcast
                        pats.append(
                            _np.broadcast_to(_np.asarray(m), (bq, bkv)))
        except _jax.errors.ConcretizationTypeError:
            # inside transforms where compile-time eval cannot escape the
            # trace (e.g. shard_map) — fall back to the in-kernel mask.
            # ConcretizationTypeError is the parent of all the
            # tracer-leak flavors this can raise (bool conversion in
            # step_needed, int conversion in kv_block_index, array
            # conversion when self.mask stages jnp ops).
            return None
        num_p = len(pats)

        def pid(i, s, _self=self):
            j = _self.kv_block_index(i, s)
            base = (i * bq - j * bkv - omin) // g
            if ragged:
                base = base + num_o * (j == last_block)
            return jnp.clip(base, 0, num_p - 1)

        return _np.stack(pats), pid


DenseSchedule = Schedule


@dataclasses.dataclass(frozen=True)
class CausalSchedule(Schedule):
    """Lower-triangular attention; trailing KV blocks are skipped entirely.

    With ``n_q < n_kv`` the triangle is right-aligned (query ``i`` sees keys
    ``j ≤ i + n_kv - n_q``), the convention used for decode steps.
    """

    @property
    def _offset(self) -> int:
        return self.n_kv - self.n_q

    def _last_step(self, i):
        # Last KV block index containing a visible key for Q block i.
        last_q = jnp.minimum((i + 1) * self.block_q - 1, self.n_q - 1)
        return (last_q + self._offset) // self.block_kv

    def kv_block_index(self, i, s):
        # _last_step is negative when n_q > n_kv and an early Q block sees
        # no keys at all; the index map is evaluated even for skipped steps
        # (the DMA is issued before the kernel body), so clamp into range.
        return jnp.clip(
            jnp.minimum(s, self._last_step(i)), 0, self.num_kv_blocks - 1
        )

    def step_needed(self, i, s):
        return s <= self._last_step(i)

    def _first_q_block(self, j):
        # First Q block containing a query that can see KV block j.
        return jnp.clip(
            (j * self.block_kv - self._offset) // self.block_q,
            0,
            self.num_q_blocks - 1,
        )

    def q_block_index(self, j, s):
        return jnp.minimum(self._first_q_block(j) + s, self.num_q_blocks - 1)

    def q_step_needed(self, j, s):
        return self._first_q_block(j) + s <= self.num_q_blocks - 1

    @property
    def has_mask(self) -> bool:
        return True

    def mask(self, q_pos, k_pos):
        return self._and_kv_pad(k_pos <= q_pos + self._offset, k_pos)

    def block_unmasked(self, i, s):
        # Every key of the tile visible to every *real* query of the tile:
        # k_hi ≤ q_lo + offset (padded q rows are sliced off, so only the
        # real-row condition matters).
        j = self.kv_block_index(i, s)
        full = (j + 1) * self.block_kv - 1 <= i * self.block_q + self._offset
        return jnp.logical_and(full, self._kv_pad_ok(j))


@dataclasses.dataclass(frozen=True)
class LocalSchedule(Schedule):
    """Sliding-window band: query ``i`` sees keys ``|i - j| ≤ radius``
    (clamped at sequence edges, no wraparound). ``causal=True`` additionally
    restricts to ``j ≤ i``."""

    radius: int = 0
    causal: bool = False

    def __post_init__(self):
        if self.radius < 0:
            raise ValueError("radius must be ≥ 0")

    def _first_step(self, i):
        return jnp.maximum(0, (i * self.block_q - self.radius) // self.block_kv)

    def _last_block(self, i):
        last_q = jnp.minimum((i + 1) * self.block_q - 1, self.n_q - 1)
        return jnp.minimum(
            self.num_kv_blocks - 1, (last_q + self.radius) // self.block_kv
        )

    @property
    def max_kv_steps(self) -> int:
        # Exact (not the cdiv(span)+1 bound): all quantities are Python
        # ints, so evaluate the per-block first/last formulas directly.
        # The slack "+1" bound cost a pure-bubble grid step per Q block
        # whenever the band happened to be block-aligned (25% of the grid
        # at bq=bkv=radius — VERDICT r1 item 3).
        best = 1
        for i in range(self.num_q_blocks):
            first = max(0, (i * self.block_q - self.radius) // self.block_kv)
            last_q = min((i + 1) * self.block_q - 1, self.n_q - 1)
            last = min(
                self.num_kv_blocks - 1, (last_q + self.radius) // self.block_kv
            )
            best = max(best, last - first + 1)
        return best

    def kv_block_index(self, i, s):
        return jnp.minimum(self._first_step(i) + s, self._last_block(i))

    def step_needed(self, i, s):
        return self._first_step(i) + s <= self._last_block(i)

    def _first_q_block(self, j):
        if self.causal:
            lo = j * self.block_kv  # q ≥ k under causality
        else:
            lo = j * self.block_kv - self.radius
        return jnp.clip(lo // self.block_q, 0, self.num_q_blocks - 1)

    def _last_q_block(self, j):
        hi = (j + 1) * self.block_kv - 1 + self.radius
        return jnp.minimum(self.num_q_blocks - 1, hi // self.block_q)

    @property
    def max_q_steps(self) -> int:
        best = 1
        for j in range(self.num_kv_blocks):
            if self.causal:
                lo = j * self.block_kv
            else:
                lo = j * self.block_kv - self.radius
            first = min(max(lo // self.block_q, 0), self.num_q_blocks - 1)
            hi = (j + 1) * self.block_kv - 1 + self.radius
            last = min(self.num_q_blocks - 1, hi // self.block_q)
            best = max(best, last - first + 1)
        return best

    def q_block_index(self, j, s):
        return jnp.minimum(self._first_q_block(j) + s, self._last_q_block(j))

    def q_step_needed(self, j, s):
        return self._first_q_block(j) + s <= self._last_q_block(j)

    @property
    def has_mask(self) -> bool:
        return True

    def mask(self, q_pos, k_pos):
        m = jnp.abs(q_pos - k_pos) <= self.radius
        if self.causal:
            m = jnp.logical_and(m, k_pos <= q_pos)
        return self._and_kv_pad(m, k_pos)

    def block_unmasked(self, i, s):
        # Tile fully inside the band: max |q − k| over the tile ≤ radius,
        # i.e. k_hi − q_lo ≤ r and q_hi − k_lo ≤ r (real q rows only).
        j = self.kv_block_index(i, s)
        q_lo = i * self.block_q
        q_hi = jnp.minimum((i + 1) * self.block_q - 1, self.n_q - 1)
        k_lo = j * self.block_kv
        k_hi = (j + 1) * self.block_kv - 1
        full = jnp.logical_and(
            k_hi - q_lo <= self.radius, q_hi - k_lo <= self.radius
        )
        if self.causal:
            full = jnp.logical_and(full, k_hi <= q_lo)
        return jnp.logical_and(full, self._kv_pad_ok(j))


@dataclasses.dataclass(frozen=True)
class BlockDiagonalSchedule(Schedule):
    """Disjoint block-diagonal attention with section size ``section``:
    query ``i`` sees keys in the same ``section``-sized chunk. This is the
    one-kernel form of the reference's ``block_fa`` (src/windowed.jl:1 —
    stride = windowsize, pad = 0), visiting only the diagonal blocks instead
    of materializing patches.

    Requires ``section % block_q == 0 and section % block_kv == 0`` (the
    wrapper picks conforming block sizes).
    """

    section: int = 0

    def __post_init__(self):
        if self.section <= 0:
            raise ValueError("section must be positive")
        if self.section % self.block_q or self.section % self.block_kv:
            raise ValueError(
                f"section {self.section} must be a multiple of block_q "
                f"{self.block_q} and block_kv {self.block_kv}"
            )

    @property
    def max_kv_steps(self) -> int:
        return self.section // self.block_kv

    def _kv_raw(self, i, s):
        section_idx = (i * self.block_q) // self.section
        return section_idx * (self.section // self.block_kv) + s

    def kv_block_index(self, i, s):
        return jnp.minimum(self._kv_raw(i, s), self.num_kv_blocks - 1)

    def step_needed(self, i, s):
        return self._kv_raw(i, s) < self.num_kv_blocks

    @property
    def max_q_steps(self) -> int:
        return self.section // self.block_q

    def _q_raw(self, j, s):
        section_idx = (j * self.block_kv) // self.section
        return section_idx * (self.section // self.block_q) + s

    def q_block_index(self, j, s):
        return jnp.minimum(self._q_raw(j, s), self.num_q_blocks - 1)

    def q_step_needed(self, j, s):
        return self._q_raw(j, s) < self.num_q_blocks

    @property
    def has_mask(self) -> bool:
        # Partial trailing section needs the padding mask.
        return self.kv_len % self.block_kv != 0 or self.n_q % self.section != 0

    def mask(self, q_pos, k_pos):
        if not self.has_mask:
            return None
        m = (q_pos // self.section) == (k_pos // self.section)
        return self._and_kv_pad(m, k_pos)


@dataclasses.dataclass(frozen=True)
class ShiftedMaskSchedule(Schedule):
    """Dense iteration with a mask over *globally shifted* coordinates —
    the ring-attention hop schedule.

    When K/V shards rotate around a mesh ring, the relative offset between
    the local Q shard and the hop's K/V shard is a compile-time constant
    (hop index × shard length, modulo the ring for wraparound bands), so
    every hop of causal / local / circulant ring attention is expressible
    as this schedule with static ``shift``:

    * ``q_global = q_pos + shift``, ``k_global = k_pos``;
    * ``radius ≥ 0`` restricts to the band ``|q_global − k_global| ≤ radius``
      (wrapped mod ``wrap_n`` when ``wrap_n > 0`` — the circulant case);
    * ``causal=True`` additionally requires ``k_global ≤ q_global``.

    Iteration is dense over the (small) hop shard; the big sparsity win in
    a ring is skipping whole hops (parallel/ring.py), not blocks within one.
    """

    shift: int = 0
    radius: int = -1
    wrap_n: int = 0
    causal: bool = False

    @property
    def has_mask(self) -> bool:
        return True

    def mask(self, q_pos, k_pos):
        qg = q_pos + self.shift
        m = None
        if self.radius >= 0:
            if self.wrap_n > 0:
                delta = jnp.mod(qg - k_pos, self.wrap_n)
                m = jnp.logical_or(
                    delta <= self.radius, delta >= self.wrap_n - self.radius
                )
            else:
                m = jnp.abs(qg - k_pos) <= self.radius
        if self.causal:
            c = k_pos <= qg
            m = c if m is None else jnp.logical_and(m, c)
        if m is None:
            m = jnp.ones(q_pos.shape, bool)
        return self._and_kv_pad(m, k_pos)

    def block_unmasked(self, i, s):
        j = self.kv_block_index(i, s)
        q_lo = i * self.block_q + self.shift
        q_hi = jnp.minimum((i + 1) * self.block_q - 1, self.n_q - 1) + self.shift
        k_lo = j * self.block_kv
        k_hi = (j + 1) * self.block_kv - 1
        full = self._kv_pad_ok(j)
        if isinstance(full, bool):
            full = jnp.asarray(full)
        if self.radius >= 0:
            if self.wrap_n > 0:
                # The tile's delta interval is [k_lo − q_hi, k_hi − q_lo]
                # (width bq+bkv−2); it lies inside the wrapped band
                # [−r, r] (mod wrap_n) iff shifting its low end to the
                # band's start keeps the whole width inside the band.
                lo = k_lo - q_hi
                width = (k_hi - k_lo) + (q_hi - q_lo)
                inside = jnp.mod(lo + self.radius, self.wrap_n) + width \
                    <= 2 * self.radius
                full = jnp.logical_and(full, inside)
            else:
                full = jnp.logical_and(
                    full,
                    jnp.logical_and(
                        k_hi - q_lo <= self.radius, q_hi - k_lo <= self.radius
                    ),
                )
        if self.causal:
            full = jnp.logical_and(full, k_hi <= q_lo)
        return full


@dataclasses.dataclass(frozen=True)
class CirculantSchedule(Schedule):
    """Wraparound band over halo-extended K/V.

    The kernel runs against ``k_ext = concat([k[-radius:], k, k[:radius]])``
    (length ``n_kv + 2·radius``); query ``i`` attends extended positions
    ``[i, i + 2·radius]`` — a contiguous band, so the mod-N seam of the
    reference's scalar-gather inner loop (src/circulant.jl:68-79) never
    materializes inside the kernel.
    """

    radius: int = 0

    def __post_init__(self):
        if self.radius < 0:
            raise ValueError("radius must be ≥ 0")
        if 2 * self.radius + 1 > self.n_kv:
            raise ValueError("circulant window larger than sequence")

    @property
    def kv_len(self) -> int:
        return self.n_kv + 2 * self.radius

    def _first_step(self, i):
        return (i * self.block_q) // self.block_kv

    def _last_block(self, i):
        last_q = jnp.minimum((i + 1) * self.block_q - 1, self.n_q - 1)
        return jnp.minimum(
            self.num_kv_blocks - 1, (last_q + 2 * self.radius) // self.block_kv
        )

    @property
    def max_kv_steps(self) -> int:
        # exact — see LocalSchedule.max_kv_steps
        best = 1
        for i in range(self.num_q_blocks):
            first = (i * self.block_q) // self.block_kv
            last_q = min((i + 1) * self.block_q - 1, self.n_q - 1)
            last = min(
                self.num_kv_blocks - 1,
                (last_q + 2 * self.radius) // self.block_kv,
            )
            best = max(best, last - first + 1)
        return best

    def kv_block_index(self, i, s):
        return jnp.minimum(self._first_step(i) + s, self._last_block(i))

    def step_needed(self, i, s):
        return self._first_step(i) + s <= self._last_block(i)

    def _first_q_block(self, j):
        # Extended KV position j is seen by queries i ∈ [j - 2r, j].
        return jnp.clip(
            (j * self.block_kv - 2 * self.radius) // self.block_q,
            0,
            self.num_q_blocks - 1,
        )

    def _last_q_block(self, j):
        hi = (j + 1) * self.block_kv - 1
        return jnp.clip(hi // self.block_q, 0, self.num_q_blocks - 1)

    @property
    def max_q_steps(self) -> int:
        best = 1
        for j in range(self.num_kv_blocks):
            first = min(
                max((j * self.block_kv - 2 * self.radius) // self.block_q, 0),
                self.num_q_blocks - 1,
            )
            last = min(
                max(((j + 1) * self.block_kv - 1) // self.block_q, 0),
                self.num_q_blocks - 1,
            )
            best = max(best, last - first + 1)
        return best

    def q_block_index(self, j, s):
        return jnp.minimum(self._first_q_block(j) + s, self._last_q_block(j))

    def q_step_needed(self, j, s):
        return self._first_q_block(j) + s <= self._last_q_block(j)

    @property
    def has_mask(self) -> bool:
        return True

    def mask(self, q_pos, k_pos):
        delta = k_pos - q_pos
        m = jnp.logical_and(delta >= 0, delta <= 2 * self.radius)
        return self._and_kv_pad(m, k_pos)

    def block_unmasked(self, i, s):
        # Extended-coordinate band: delta = k − q ∈ [0, 2r] for the whole
        # tile ⟺ k_lo ≥ q_hi and k_hi − q_lo ≤ 2r (real q rows only).
        j = self.kv_block_index(i, s)
        q_lo = i * self.block_q
        q_hi = jnp.minimum((i + 1) * self.block_q - 1, self.n_q - 1)
        k_lo = j * self.block_kv
        k_hi = (j + 1) * self.block_kv - 1
        full = jnp.logical_and(k_lo >= q_hi, k_hi - q_lo <= 2 * self.radius)
        return jnp.logical_and(full, self._kv_pad_ok(j))
