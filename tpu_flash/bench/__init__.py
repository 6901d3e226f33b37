"""Benchmark harness — timing, FLOP/byte models, roofline accounting.

Plays the role of the reference's bench layer (bench/compare.jl,
bench/softmax.jl, src_cpp benchmark main, src_cpp/FlashAttention.cpp:358-471)
re-built TPU-first: every entry embeds a correctness gate against the f32
oracle before timing (the reference's `@test O1 ≈ O2` pattern,
bench/compare.jl:21,47,74), and throughput is reported against an explicit
MXU/HBM roofline instead of the reference's int32-overflowing analytic model
(src_cpp/FlashAttention.cpp:410-411).
"""

from tpu_flash.bench.harness import (
    BenchResult,
    attention_flops,
    attention_bytes,
    device_peaks,
    measure,
    time_fn,
)

__all__ = [
    "BenchResult",
    "attention_flops",
    "attention_bytes",
    "device_peaks",
    "measure",
    "time_fn",
]
