"""Profiling & speed-of-light accounting.

The reference's only observability was wall-clock timing plus an analytic
GFLOP/s model (SURVEY.md §5 — `omp_get_wtime` pairs, `4N²(d+11/4)` FLOPs).
Here: a `jax.profiler` trace context for real device timelines, plus a
roofline report that combines the bench harness's analytic models with the
device peak table — the per-kernel speed-of-light accounting the north star
requires.

Usage::

    with trace("/tmp/tb"):           # view with tensorboard / xprof
        fn(*args)

    print(roofline_report("dense_fa", seconds=7.4e-3,
                          flops=..., bytes_moved=...))
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax

from tpu_flash.bench.harness import device_peaks


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope writing a TensorBoard/xprof trace."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def roofline_report(
    name: str,
    *,
    seconds: float,
    flops: int,
    bytes_moved: int,
    dtype: str = "bf16",
    device: Optional[jax.Device] = None,
) -> str:
    """One-line speed-of-light statement for a measured kernel."""
    peaks = device_peaks(device)
    peak_flops = peaks["int8_ops"] if dtype in ("int8", "int4") else peaks["bf16_flops"]
    compute_s = flops / peak_flops
    memory_s = bytes_moved / peaks["hbm_bytes"]
    light = max(compute_s, memory_s)
    bound = "compute" if compute_s >= memory_s else "memory"
    frac = light / seconds if seconds > 0 else 0.0
    return (
        f"{name}: {seconds*1e3:.3f} ms measured vs {light*1e6:.1f} µs "
        f"speed-of-light ({bound}-bound on {peaks['kind']}) — "
        f"{frac:.1%} of roofline, {flops/seconds/1e12:.2f} TFLOP/s, "
        f"{bytes_moved/seconds/1e9:.1f} GB/s"
    )
