"""Serving-mode attention (pre-quantized K/V, in-kernel Q quantize) vs the
f32 oracle and the activation-quant kernel family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops import oracle
from tpu_flash.quant.qarray import dequantize
from tpu_flash.quant.serving_attn import (
    quantize_kv_cache,
    serving_flash_attention,
)

_BLK = dict(block_q=128, block_kv=128)


def _qkv(rng, b, h, n, d, hkv=None):
    hkv = h if hkv is None else hkv
    q = jnp.asarray(rng.standard_normal((b, h, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, hkv, n, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("q_dtype,kv_dtype,kv_scale,tol", [
    ("int8", "int8", "token", 0.06),
    ("float8_e4m3fn", "float8_e4m3fn", "token", 0.2),
    ("float8_e4m3fn", "float8_e4m3fn", "tensor", 0.25),
    (None, "int8", "token", 0.05),           # weight-only
])
def test_serving_vs_oracle(rng, q_dtype, kv_dtype, kv_scale, tol):
    q, k, v = _qkv(rng, 1, 2, 384, 64)
    kq, vq = quantize_kv_cache(k, v, kv_dtype, kv_scale=kv_scale)
    o = serving_flash_attention(q, kq, vq, q_dtype=q_dtype, **_BLK)
    o_ref, _ = oracle.dense_dpa(q, k, v)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref)))
    assert err <= tol, err


def test_serving_matched_bitwidth_contract(rng):
    """≤1e-2 max-abs vs the f32 oracle evaluated on the DEQUANTIZED
    inputs (BASELINE.md contract), int8 path."""
    q, k, v = _qkv(rng, 1, 2, 256, 64)
    kq, vq = quantize_kv_cache(k, v, "int8", kv_scale="token")
    o = serving_flash_attention(q, kq, vq, q_dtype="int8", **_BLK)
    # dequantized-input oracle; Q dequantized the way the kernel rounds it
    qs = jnp.max(jnp.abs(q), axis=-1, keepdims=True) / 127.0
    q_deq = jnp.clip(jnp.round(q / qs), -127, 127) * qs
    kd = dequantize(kq).reshape(k.shape)
    vd = dequantize(vq).reshape(v.shape)
    o_ref, _ = oracle.dense_dpa(q_deq, kd, vd)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref)))
    assert err <= 1e-2, err


def test_serving_causal_and_gqa(rng):
    q, k, v = _qkv(rng, 1, 4, 384, 64, hkv=2)
    kq, vq = quantize_kv_cache(k, v, "int8")
    o = serving_flash_attention(
        q, kq, vq, q_dtype="int8", schedule="causal", **_BLK
    )
    o_ref, _ = oracle.dense_dpa(
        q, jnp.repeat(k, 2, axis=1), jnp.repeat(v, 2, axis=1), causal=True
    )
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - o_ref)))
    assert err <= 0.06, err


def test_serving_matches_flash_q(rng):
    """In-kernel Q quantization ≈ the outside-kernel activation-quant path
    (same grids, same scale algebra — only float-rounding order differs)."""
    from tpu_flash.quant.flash_q import quantized_flash_attention

    q, k, v = _qkv(rng, 1, 2, 256, 64)
    kq, vq = quantize_kv_cache(k, v, "int8", kv_scale="token")
    o1 = serving_flash_attention(q, kq, vq, q_dtype="int8", **_BLK)
    o2 = quantized_flash_attention(
        q, k, v, q_dtype="int8", kv_dtype="int8", **_BLK
    )
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32)
                                - o2.astype(jnp.float32))))
    assert err <= 2e-2, err


def test_serving_lse_matches_unquantized(rng):
    q, k, v = _qkv(rng, 1, 1, 256, 32)
    kq, vq = quantize_kv_cache(k, v, "int8", kv_scale="token")
    o, lse = serving_flash_attention(
        q, kq, vq, q_dtype="int8", return_lse=True, **_BLK
    )
    _, lse_ref = oracle.dense_dpa(q, k, v)
    np.testing.assert_allclose(
        np.asarray(lse), np.asarray(lse_ref), atol=0.05, rtol=0.01
    )


def test_serving_pv_quant_error(rng):
    """int8 PV-dot mode stays within the quantization error envelope on
    typical (gaussian) inputs and matches the bf16-PV serving path."""
    q, k, v = _qkv(rng, 1, 2, 384, 64)
    kq, vq = quantize_kv_cache(k, v, "int8", kv_scale="token")
    o_base = serving_flash_attention(q, kq, vq, q_dtype="int8", **_BLK)
    o_pv8 = serving_flash_attention(
        q, kq, vq, q_dtype="int8", pv_quant=True, **_BLK
    )
    err = float(jnp.max(jnp.abs(
        o_pv8.astype(jnp.float32) - o_base.astype(jnp.float32))))
    assert err <= 2e-2, err
    o_ref, _ = oracle.dense_dpa(q, k, v)
    err2 = float(jnp.max(jnp.abs(o_pv8.astype(jnp.float32) - o_ref)))
    assert err2 <= 0.08, err2


@pytest.mark.parametrize("q_dtype,kv_dtype", [
    ("int8", "int8"),
    ("float8_e4m3fn", "float8_e4m3fn"),
    (None, "int8"),
])
@pytest.mark.parametrize("schedule", ["dense", "causal"])
def test_serving_kv_split(rng, q_dtype, kv_dtype, schedule):
    """kv_split sub-tiling (MXU/VPU overlap) only reassociates the per-step
    PV sum — outputs match the unsplit kernel to f32 accumulation noise."""
    q, k, v = _qkv(rng, 1, 2, 512, 64)
    kq, vq = quantize_kv_cache(k, v, kv_dtype, kv_scale="token")
    blk = dict(block_q=128, block_kv=256)
    # kv_split is a standard-layout knob; pin transposed=False so the A/B
    # isolates the sub-tile reassociation (d=64 otherwise auto-routes
    # kv_split=1 to the transposed kernel, whose ones-row l carries bf16
    # p-rounding — a different, larger noise floor).
    kw = dict(q_dtype=q_dtype, schedule=schedule, transposed=False, **blk)
    o1 = serving_flash_attention(q, kq, vq, kv_split=1, **kw)
    o2 = serving_flash_attention(q, kq, vq, kv_split=2, **kw)
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32),
        atol=2e-3, rtol=1e-3,
    )
    with pytest.raises(ValueError):
        serving_flash_attention(q, kq, vq, kv_split=3, **kw)


@pytest.mark.parametrize("q_dtype,kv_dtype", [
    ("int8", "int8"),
    ("float8_e4m3fn", "float8_e4m3fn"),
])
@pytest.mark.parametrize("schedule", ["dense", "causal"])
def test_serving_bh_block(rng, q_dtype, kv_dtype, schedule):
    """bh_block packs independent batch·head rows into one grid step and
    software-pipelines them (row bb+1's MXU QKᵀ under row bb's VPU softmax
    — the _fwd_kernel staging applied to the serving kernel). Each row's
    math is untouched; only XLA's fusion/reassociation may differ, so
    outputs match the unpacked kernel to f32 accumulation noise (int8's
    integer QK dot measures bitwise-equal in practice)."""
    q, k, v = _qkv(rng, 2, 2, 512, 64)
    kq, vq = quantize_kv_cache(k, v, kv_dtype, kv_scale="token")
    kw = dict(q_dtype=q_dtype, schedule=schedule, transposed=False,
              block_q=128, block_kv=256)
    o1 = serving_flash_attention(q, kq, vq, bh_block=1, **kw)
    for bhb in (2, 4):
        o2 = serving_flash_attention(q, kq, vq, bh_block=bhb, **kw)
        np.testing.assert_allclose(
            np.asarray(o1, np.float32), np.asarray(o2, np.float32),
            atol=2e-3, rtol=1e-3,
        )
    with pytest.raises(ValueError):  # exclusive with kv_split
        serving_flash_attention(q, kq, vq, bh_block=2, kv_split=2, **kw)
    with pytest.raises(ValueError):  # MHA only
        qg, kg, vg = _qkv(rng, 1, 4, 256, 64, hkv=2)
        kqg, vqg = quantize_kv_cache(kg, vg, kv_dtype, kv_scale="token")
        serving_flash_attention(
            qg, kqg, vqg, bh_block=2, q_dtype=q_dtype, transposed=False,
            block_q=128, block_kv=256)


def test_serving_bh_block_lse(rng):
    q, k, v = _qkv(rng, 2, 2, 256, 64)
    kq, vq = quantize_kv_cache(k, v, "int8", kv_scale="token")
    kw = dict(q_dtype="int8", transposed=False, return_lse=True, **_BLK)
    o1, l1 = serving_flash_attention(q, kq, vq, bh_block=1, **kw)
    o2, l2 = serving_flash_attention(q, kq, vq, bh_block=2, **kw)
    np.testing.assert_allclose(
        np.asarray(o1, np.float32), np.asarray(o2, np.float32), atol=2e-3)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)


# ---------------------------------------------------------------------------
# transposed d≤64 layout (auto-dispatched): parity vs the standard kernel
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("q_dtype,kv_dtype,kv_scale", [
    ("int8", "int8", "token"),
    ("float8_e4m3fn", "float8_e4m3fn", "token"),
    ("float8_e4m3fn", "float8_e4m3fn", "tensor"),
    (None, "int8", "token"),
    (None, "float8_e4m3fn", "tensor"),
])
def test_transposed_matches_standard(rng, q_dtype, kv_dtype, kv_scale):
    """The K-major d≤64 kernel computes the same exact online softmax as
    the standard layout — identical numerics contract, to fp tolerance."""
    q, k, v = _qkv(rng, 1, 4, 384, 64, hkv=2)
    kq, vq = quantize_kv_cache(k, v, kv_dtype, kv_scale=kv_scale)
    kw = dict(q_dtype=q_dtype, **_BLK)
    o_t, lse_t = serving_flash_attention(
        q, kq, vq, transposed=True, return_lse=True, **kw)
    o_s, lse_s = serving_flash_attention(
        q, kq, vq, transposed=False, return_lse=True, **kw)
    np.testing.assert_allclose(
        np.asarray(o_t, np.float32), np.asarray(o_s, np.float32),
        atol=5e-3, rtol=1e-2)
    np.testing.assert_allclose(
        np.asarray(lse_t), np.asarray(lse_s), atol=1e-3, rtol=1e-4)


@pytest.mark.parametrize("schedule,kw", [
    ("causal", {}),
    ("local", {"radius": 64}),
    ("circulant", {"radius": 64, "wrap_n": 384}),
])
def test_transposed_schedules_match_standard(rng, schedule, kw):
    q, k, v = _qkv(rng, 1, 2, 384, 64)
    kq, vq = quantize_kv_cache(k, v, "int8")
    o_t = serving_flash_attention(
        q, kq, vq, q_dtype="int8", schedule=schedule, transposed=True,
        **kw, **_BLK)
    o_s = serving_flash_attention(
        q, kq, vq, q_dtype="int8", schedule=schedule, transposed=False,
        **kw, **_BLK)
    np.testing.assert_allclose(
        np.asarray(o_t, np.float32), np.asarray(o_s, np.float32),
        atol=5e-3, rtol=1e-2)


def test_transposed_bound_max_off_matches_on(rng):
    q, k, v = _qkv(rng, 1, 2, 256, 64)
    kq, vq = quantize_kv_cache(k, v, "int8")
    o_on = serving_flash_attention(
        q, kq, vq, q_dtype="int8", transposed=True, bound_max=True, **_BLK)
    o_off = serving_flash_attention(
        q, kq, vq, q_dtype="int8", transposed=True, bound_max=False, **_BLK)
    np.testing.assert_allclose(
        np.asarray(o_on, np.float32), np.asarray(o_off, np.float32),
        atol=2e-3, rtol=1e-2)
