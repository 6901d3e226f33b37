"""Timing, analytic FLOP/byte models, and roofline accounting.

The reference timed with `@elapsed` accumulation loops (bench/compare.jl:25-26)
and a hand-rolled FLOP model `4N²(d+11/4)` that overflowed int32 for N≥8192
(src_cpp/FlashAttention.cpp:410-411). Here: median-of-reps wall time with
`block_until_ready`, 64-bit Python-int FLOP models per schedule (sparse
schedules count only unmasked work), and per-device peak tables so every
result carries a fraction-of-roofline number.
"""

from __future__ import annotations

import dataclasses
import math
import statistics
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Device peaks (dense MXU TFLOP/s and HBM GB/s), keyed by device_kind prefix.
# Public figures; used only for roofline *accounting*, never for correctness.
# ---------------------------------------------------------------------------
_PEAKS = {
    # kind prefix: (bf16 FLOP/s, int8 OP/s, HBM bytes/s)
    "TPU v6": (918e12, 1836e12, 1640e9),  # Trillium / v6e
    "TPU v5p": (459e12, 918e12, 2765e9),
    "TPU v5 lite": (197e12, 394e12, 819e9),  # v5e
    "TPU v5": (197e12, 394e12, 819e9),
    "TPU v4": (275e12, 275e12, 1228e9),
    "cpu": (1e12, 1e12, 100e9),  # nominal; CPU runs are correctness-only
}


def device_peaks(device: Optional[jax.Device] = None) -> dict:
    """Return {'bf16_flops', 'int8_ops', 'hbm_bytes'} for the device."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu")
    for prefix, (bf16, i8, hbm) in _PEAKS.items():
        if kind.startswith(prefix):
            return {"bf16_flops": bf16, "int8_ops": i8, "hbm_bytes": hbm,
                    "kind": kind}
    return {"bf16_flops": 1e12, "int8_ops": 1e12, "hbm_bytes": 100e9,
            "kind": kind}


# ---------------------------------------------------------------------------
# Analytic models
# ---------------------------------------------------------------------------
def attention_flops(
    batch: int,
    heads: int,
    n_q: int,
    n_kv: int,
    d: int,
    dv: Optional[int] = None,
    *,
    coverage: float = 1.0,
    backward: bool = False,
) -> int:
    """Matmul FLOPs of one attention call.

    Forward = QKᵀ (2·nq·nkv·d) + PV (2·nq·nkv·dv); backward adds the standard
    5 matmuls (dV, dP, dQ, dK + recomputed QKᵀ) ≈ 2.5× forward. ``coverage``
    is the unmasked fraction of the (nq, nkv) score matrix — the sparse
    schedules' whole point (reference block_fa ≪ dense_fa, logs/compare1.txt).
    """
    dv = d if dv is None else dv
    fwd = 2 * batch * heads * n_q * n_kv * (d + dv)
    total = fwd * (1 + 5 / 2) if backward else fwd
    return int(total * coverage)


def attention_bytes(
    batch: int,
    heads: int,
    n_q: int,
    n_kv: int,
    d: int,
    dv: Optional[int] = None,
    *,
    q_bytes: float = 2,
    kv_bytes: float = 2,
    o_bytes: float = 2,
) -> int:
    """Minimum HBM traffic: read Q/K/V once, write O (+lse) once."""
    dv = d if dv is None else dv
    return int(
        batch * heads * (
            n_q * d * q_bytes
            + n_kv * (d + dv) * kv_bytes
            + n_q * dv * o_bytes
            + n_q * 4  # lse f32
        )
    )


def schedule_coverage(schedule: str, n: int, *, radius: int = 0,
                      section: int = 0, causal: bool = False) -> float:
    """Unmasked fraction of the score matrix for a 1D schedule."""
    if schedule == "dense":
        return 0.5 if causal else 1.0
    if schedule in ("local", "sliding"):
        w = 2 * radius + 1
        cov = min(w / n, 1.0)
        return cov / 2 if causal else cov
    if schedule == "circulant":
        return min((2 * radius + 1) / n, 1.0)
    if schedule == "block":
        return min(section / n, 1.0)
    raise ValueError(f"unknown schedule {schedule!r}")


# ---------------------------------------------------------------------------
# Timing
# ---------------------------------------------------------------------------
def _sync(out) -> None:
    """Force a real device round trip.

    ``block_until_ready`` is a no-op under the async axon TPU tunnel, so the
    only reliable sync is fetching a value to the host.
    """
    leaf = jax.tree_util.tree_leaves(out)[0]
    jax.device_get(leaf.ravel()[:1])


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Wall seconds per call.

    Enqueues ``iters`` executions back-to-back and syncs once at the end;
    the one-call + sync latency (tunnel round trip, ~30 ms) is measured
    separately and subtracted, so the result is device execution time.
    The TPU runs enqueued programs in order — no cross-dispatch CSE — so
    no artificial data dependence is needed.
    """
    for _ in range(max(warmup, 1)):
        _sync(fn(*args))

    def _timed(k: int) -> float:
        t0 = time.perf_counter()
        out = None
        for _ in range(k):
            out = fn(*args)
        _sync(out)
        return time.perf_counter() - t0

    latency = min(_timed(1) for _ in range(3))
    total = _timed(iters + 1)
    est = max((total - latency) / iters, 1e-9)
    # Sub-millisecond kernels drown in the ~30 ms tunnel round trip: extend
    # the enqueued batch until device time dominates the subtracted latency.
    if total - latency < 8 * latency:
        iters2 = min(int(math.ceil(max(0.25, 10 * latency) / est)), 3000)
        if iters2 > iters:
            total2 = _timed(iters2 + 1)
            return max((total2 - latency) / iters2, 1e-9)
    return est


@dataclasses.dataclass
class BenchResult:
    name: str
    seconds: float
    flops: int
    bytes_moved: int
    max_abs_err: float
    config: dict
    peaks: dict

    @property
    def tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def gbps(self) -> float:
        return self.bytes_moved / self.seconds / 1e9

    def roofline_fraction(self, dtype: str = "bf16") -> float:
        """Achieved fraction of min(compute, memory) roofline."""
        peak_flops = (self.peaks["int8_ops"] if dtype in ("int8", "int4")
                      else self.peaks["bf16_flops"])
        compute_s = self.flops / peak_flops
        memory_s = self.bytes_moved / self.peaks["hbm_bytes"]
        light = max(compute_s, memory_s)
        return light / self.seconds

    def row(self, dtype: str = "bf16") -> dict:
        return {
            "name": self.name,
            "seconds": round(self.seconds, 6),
            "tflops": round(self.tflops, 3),
            "gbps": round(self.gbps, 2),
            "roofline_frac": round(self.roofline_fraction(dtype), 4),
            "max_abs_err": self.max_abs_err,
            **self.config,
        }


def measure(
    name: str,
    fn: Callable,
    args: tuple,
    *,
    flops: int,
    bytes_moved: int,
    oracle: Optional[Callable] = None,
    err_fn: Optional[Callable] = None,
    tol: Optional[float] = None,
    iters: int = 10,
    warmup: int = 2,
    config: Optional[dict] = None,
) -> BenchResult:
    """Gate on the oracle, then time. Raises if the gate fails — a benchmark
    of a wrong kernel is worse than no benchmark (bench/compare.jl:21).

    ``err_fn(got) -> float`` supersedes ``oracle`` when given: it receives
    the kernel output and returns the max-abs error itself — the hook the
    sweep uses to gate 16k–32k rows against the blockwise O(N)-memory
    oracle on query-row bands.
    """
    err = float("nan")
    if err_fn is not None:
        got = jax.block_until_ready(fn(*args))
        err = float(err_fn(got))
        if tol is not None and not (err <= tol):
            raise AssertionError(
                f"bench gate failed for {name}: max_abs_err={err} > tol={tol}"
            )
    elif oracle is not None:
        got = jax.block_until_ready(fn(*args))
        want = jax.block_until_ready(oracle(*args))
        got = got[0] if isinstance(got, tuple) else got
        want = want[0] if isinstance(want, tuple) else want
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
        )
        if tol is not None and not (err <= tol):
            raise AssertionError(
                f"bench gate failed for {name}: max_abs_err={err} > tol={tol}"
            )
    sec = time_fn(fn, *args, iters=iters, warmup=warmup)
    return BenchResult(
        name=name,
        seconds=sec,
        flops=flops,
        bytes_moved=bytes_moved,
        max_abs_err=err,
        config=config or {},
        peaks=device_peaks(),
    )
