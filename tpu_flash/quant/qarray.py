"""Quantized tensor container + symmetric max-abs quantizers.

The north star extends the reference's f64/f32-only kernel family with
FP8/INT8 activation paths and INT8/INT4 KV-cache layouts, dequantized
in-register inside the Pallas kernels. This module owns the host-side
representation:

* ``QArray`` — a pytree of ``values`` (int8 / float8) + ``scales`` (f32),
  with the quantization granularity recorded statically.
* ``quantize``/``dequantize`` — symmetric max-abs quantization along a
  chosen axis. Per-token scales (axis=-1) for Q/K — the score
  ``s_ij = (q̂_i·k̂_j)·σq_i·σk_j`` dequantizes exactly on the MXU output;
  per-channel scales (axis=-2) for V — ``o = (P·V̂)·σv`` dequantizes after
  the PV matmul, so no in-loop element dequant is needed.

INT4 values are stored two-nibbles-per-int8 (pack/unpack helpers here;
in-kernel unpack uses VPU shifts) because TPU Mosaic has no native int4
array path in this stack.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

QMAX = {
    jnp.dtype(jnp.int8): 127.0,
    jnp.dtype(jnp.float8_e4m3fn): 448.0,
    jnp.dtype(jnp.float8_e5m2): 57344.0,
}
_EPS = 1e-12


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QArray:
    """values·scales ≈ original. ``axis`` (static) is the reduction axis the
    scales were computed over (scales have size 1 there)."""

    values: jnp.ndarray
    scales: jnp.ndarray
    axis: int = dataclasses.field(metadata=dict(static=True), default=-1)

    @property
    def shape(self):
        return self.values.shape

    @property
    def dtype(self):
        return self.values.dtype


def quantize(x: jnp.ndarray, dtype, axis=-1) -> QArray:
    """Symmetric max-abs quantization of ``x`` along ``axis``.

    axis=-1 → per-token (one scale per row); axis=-2 → per-channel;
    a tuple (e.g. ``(-2, -1)``) reduces over several dims — per-tensor
    granularity per leading index, the usual fp8 scaling mode.
    """
    dtype = jnp.dtype(dtype)
    qmax = QMAX[dtype]
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
    scales = jnp.maximum(amax, _EPS) / qmax
    scaled = x32 / scales
    if dtype == jnp.int8:
        values = jnp.clip(jnp.round(scaled), -qmax, qmax).astype(jnp.int8)
    else:
        values = scaled.astype(dtype)
    return QArray(values=values, scales=scales, axis=axis)


def dequantize(qa: QArray) -> jnp.ndarray:
    """f32 reconstruction — the 'matched bit-width' oracle input."""
    return qa.values.astype(jnp.float32) * qa.scales


def pack_int4(x: jnp.ndarray) -> jnp.ndarray:
    """Pack int values in [-8, 7] (int8 storage) pairwise along the last
    axis into one int8 per pair: low nibble = even index, high = odd."""
    if x.shape[-1] % 2:
        raise ValueError("last axis must be even to pack int4 pairs")
    lo = x[..., 0::2].astype(jnp.int8) & 0x0F
    hi = (x[..., 1::2].astype(jnp.int8) & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4`; sign-extends nibbles via shift pairs
    (the same arithmetic the kernel uses in-register)."""
    lo = (packed.astype(jnp.int8) << 4) >> 4  # arithmetic shifts sign-extend
    hi = packed.astype(jnp.int8) >> 4
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def pack_int4_halves(x: jnp.ndarray) -> jnp.ndarray:
    """Pack int4 values (int8 storage, [-8, 7]) into int8 with the feature
    dim split in halves: low nibbles hold x[..., :d/2], high nibbles
    x[..., d/2:]. Unlike pairwise interleave, the in-kernel unpack is two
    VPU shifts + one lane concat — no element shuffles."""
    d = x.shape[-1]
    if d % 2:
        raise ValueError("last axis must be even")
    lo = x[..., : d // 2].astype(jnp.int8) & 0x0F
    hi = (x[..., d // 2 :].astype(jnp.int8) & 0x0F) << 4
    return (lo | hi).astype(jnp.int8)


def unpack_int4_halves(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4_halves` (mirrors the in-kernel unpack)."""
    lo = (packed.astype(jnp.int8) << 4) >> 4
    hi = packed.astype(jnp.int8) >> 4
    return jnp.concatenate([lo, hi], axis=-1)


def _quantize_int4_vals(x: jnp.ndarray, axis: int):
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=axis, keepdims=True)
    scales = jnp.maximum(amax, _EPS) / 7.0
    vals = jnp.clip(jnp.round(x32 / scales), -8, 7).astype(jnp.int8)
    return vals, scales


def quantize_int4(x: jnp.ndarray, axis: int = -1) -> QArray:
    """INT4 symmetric quantization; values stored nibble-packed int8
    (half the last axis)."""
    vals, scales = _quantize_int4_vals(x, axis)
    return QArray(values=pack_int4(vals), scales=scales, axis=axis)


def dequantize_int4(qa: QArray) -> jnp.ndarray:
    return unpack_int4(qa.values).astype(jnp.float32) * qa.scales


def quantize_int4_halves(x: jnp.ndarray, axis: int = -1) -> QArray:
    """INT4 symmetric quantization with halves packing (the layout the
    paged-cache kernels unpack with two shifts + a lane concat)."""
    vals, scales = _quantize_int4_vals(x, axis)
    return QArray(values=pack_int4_halves(vals), scales=scales, axis=axis)
