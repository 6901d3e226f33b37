"""Quantized kernel error bounds vs the matched-bitwidth f32 oracle
(BASELINE.md: ≤1e-2 max-abs), plus quantizer round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops import oracle
from tpu_flash.quant import flash_q, qarray

_BLK = dict(block_q=128, block_kv=128)


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _qkv(rng, b, h, n, d):
    return _rand(rng, b, h, n, d), _rand(rng, b, h, n, d), _rand(rng, b, h, n, d)


def _matched_oracle(q, k, v, q_dtype, kv_dtype, scale, **oracle_kw):
    """f32 oracle on the dequantized inputs — same bit-width as the kernel."""
    b, h, n, d = q.shape
    qf = q * scale
    if q_dtype is not None:
        qf = qarray.dequantize(qarray.quantize(qf, q_dtype, axis=-1))
    kf = qarray.dequantize(qarray.quantize(k.astype(jnp.float32), kv_dtype, axis=-1))
    vf = qarray.dequantize(qarray.quantize(v.astype(jnp.float32), kv_dtype, axis=-2))
    return oracle.dense_dpa(qf, kf, vf, scale=1.0, **oracle_kw)[0]


@pytest.mark.parametrize("q_dtype,kv_dtype", [
    ("int8", "int8"),
    ("float8_e4m3fn", "float8_e4m3fn"),
    ("float8_e5m2", "float8_e4m3fn"),
    (None, "int8"),           # weight-only KV compression
    (None, "float8_e4m3fn"),
])
def test_quantized_dense_matches_matched_oracle(rng, q_dtype, kv_dtype):
    b, h, n, d = 1, 2, 256, 64
    q, k, v = _qkv(rng, b, h, n, d)
    scale = 1.0 / np.sqrt(d)
    o = flash_q.quantized_dense_fa(q, k, v, q_dtype=q_dtype, kv_dtype=kv_dtype, **_BLK)
    ref = _matched_oracle(q, k, v, q_dtype, kv_dtype, scale)
    err = float(jnp.max(jnp.abs(o - ref)))
    # weight-only path computes in bf16 q; allow slightly looser bound
    bound = 1e-2 if q_dtype is not None else 2e-2
    assert err <= bound, f"max-abs {err} vs matched oracle"


@pytest.mark.parametrize("q_dtype,kv_dtype", [
    ("int8", "int8"), (None, "int8"),
    # fp8 rows exercise the approximate-upcast branch of scaled_k_norms
    ("float8_e4m3fn", "float8_e4m3fn"), (None, "float8_e4m3fn"),
])
def test_quantized_bound_max_off_matches_on(rng, q_dtype, kv_dtype):
    """bound_max=False (measured score-tile max) and True (Cauchy–Schwarz
    norm bound) are both exact online softmax — same result to fp tolerance."""
    q, k, v = _qkv(rng, 1, 2, 256, 64)
    kw = dict(q_dtype=q_dtype, kv_dtype=kv_dtype, **_BLK)
    o_on = flash_q.quantized_dense_fa(q, k, v, bound_max=True, **kw)
    o_off = flash_q.quantized_dense_fa(q, k, v, bound_max=False, **kw)
    np.testing.assert_allclose(
        np.asarray(o_on, np.float32), np.asarray(o_off, np.float32),
        atol=2e-3, rtol=1e-2)


@pytest.mark.parametrize("q_dtype", ["float8_e4m3fn", None])
def test_quantized_dense_tensor_scale_matches_matched_oracle(rng, q_dtype):
    """kv_scale='tensor' (per-(batch,head) K scale folded into Q) must meet
    the same ≤1e-2 bound vs an oracle quantized at the SAME granularity."""
    b, h, n, d = 1, 2, 256, 64
    q, k, v = _qkv(rng, b, h, n, d)
    scale = 1.0 / np.sqrt(d)
    dt = "float8_e4m3fn"
    o = flash_q.quantized_dense_fa(q, k, v, q_dtype=q_dtype, kv_dtype=dt,
                                   kv_scale="tensor", **_BLK)
    qf = q * scale
    if q_dtype is not None:
        qf = qarray.dequantize(qarray.quantize(qf, q_dtype, axis=-1))
    kf = qarray.dequantize(qarray.quantize(k.astype(jnp.float32), dt, axis=(-2, -1)))
    vf = qarray.dequantize(qarray.quantize(v.astype(jnp.float32), dt, axis=-2))
    ref = oracle.dense_dpa(qf, kf, vf, scale=1.0)[0]
    err = float(jnp.max(jnp.abs(o - ref)))
    bound = 1e-2 if q_dtype is not None else 2e-2
    assert err <= bound, f"max-abs {err} vs matched oracle"


def test_quantized_vs_f32_oracle_int8(rng):
    """End-to-end quantization error vs the TRUE f32 oracle stays ≤1e-2 for
    unit-scale inputs (the north-star bound at matched bit-width is checked
    above; this documents total error)."""
    b, h, n, d = 1, 2, 256, 64
    q, k, v = _qkv(rng, b, h, n, d)
    o = flash_q.quantized_dense_fa(q, k, v, q_dtype="int8", kv_dtype="int8", **_BLK)
    ref, _ = oracle.dense_dpa(q, k, v)
    err = float(jnp.max(jnp.abs(o - ref)))
    assert err <= 5e-2, err  # int8 end-to-end, unit-normal inputs


@pytest.mark.parametrize("schedule,kw", [
    ("causal", {}),
    ("local", dict(radius=32)),
    ("circulant", dict(radius=32)),
    ("block", dict(section=64)),
])
def test_quantized_schedules(rng, schedule, kw):
    b, h, n, d = 1, 2, 256, 64
    q, k, v = _qkv(rng, b, h, n, d)
    o = flash_q.quantized_flash_attention(
        q, k, v, q_dtype="int8", kv_dtype="int8", schedule=schedule, **kw, **_BLK
    )
    # unquantized flash with same schedule as semantic reference
    from tpu_flash.ops import flash

    o_ref = flash.flash_attention(q, k, v, schedule=schedule, **kw, **_BLK)
    err = float(jnp.max(jnp.abs(o - o_ref)))
    assert err <= 5e-2, f"{schedule}: {err}"


def test_quantize_roundtrip_int8(rng):
    x = _rand(rng, 2, 64, 32)
    qa = qarray.quantize(x, jnp.int8, axis=-1)
    err = jnp.max(jnp.abs(qarray.dequantize(qa) - x))
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    assert float(err) <= float(jnp.max(amax)) / 127.0 + 1e-6


def test_quantize_roundtrip_fp8(rng):
    x = _rand(rng, 2, 64, 32)
    qa = qarray.quantize(x, jnp.float8_e4m3fn, axis=-1)
    rel = jnp.max(jnp.abs(qarray.dequantize(qa) - x) / jnp.maximum(jnp.abs(x), 1e-3))
    assert float(rel) <= 0.07  # e4m3: 3 mantissa bits ≈ 6% worst-case


def test_int4_pack_roundtrip(rng):
    vals = jnp.asarray(rng.integers(-8, 8, (4, 6, 16)), jnp.int8)
    packed = qarray.pack_int4(vals)
    assert packed.shape == (4, 6, 8)
    np.testing.assert_array_equal(qarray.unpack_int4(packed), vals)


def test_int4_quantize_roundtrip(rng):
    x = _rand(rng, 2, 32, 16)
    qa = qarray.quantize_int4(x, axis=-1)
    err = jnp.max(jnp.abs(qarray.dequantize_int4(qa) - x))
    amax = jnp.max(jnp.abs(x))
    assert float(err) <= float(amax) / 7.0 + 1e-6


@pytest.mark.parametrize("q_dtype", ["int8", "float8_e4m3fn"])
def test_quantized_wrappers_route_through_kernels(rng, q_dtype):
    """The public wrappers accept q_dtype/kv_dtype (BASELINE configs:
    'windowed_fa 1D/2D … FP8 Q/K/V') and stay close to the bf16 path —
    quantization error only, no schedule mixups."""
    from tpu_flash.ops import flash

    b, h, n, d = 1, 2, 256, 64
    q, k, v = _qkv(rng, b, h, n, d)

    cases = [
        ("dense", lambda **kw: flash.dense_fa(q, k, v, **kw)),
        ("causal", lambda **kw: flash.dense_fa(q, k, v, causal=True, **kw)),
        ("sliding", lambda **kw: flash.sliding_fa(q, k, v, 65, **kw)),
        ("circulant", lambda **kw: flash.circulant_fa(q, k, v, 65, **kw)),
        ("block", lambda **kw: flash.block_fa(q, k, v, 64, **kw)),
    ]
    for name, fn in cases:
        base = fn(**_BLK)
        quant = fn(q_dtype=q_dtype, kv_dtype=q_dtype, **_BLK)
        err = float(jnp.max(jnp.abs(base.astype(jnp.float32) - quant.astype(jnp.float32))))
        assert err <= 0.15, f"{name}: quantized wrapper diverged, err={err}"
        assert err > 0, f"{name}: quantized path identical — not routed?"


@pytest.mark.parametrize("q_dtype", ["int8", "float8_e4m3fn"])
def test_quantized_windowed_2d(rng, q_dtype):
    from tpu_flash.ops import flash

    s, h, d = 16, 2, 32
    q = _rand(rng, 1, s, s, h, d)
    k = _rand(rng, 1, s, s, h, d)
    v = _rand(rng, 1, s, s, h, d)
    base = flash.windowed_fa(q, k, v, (4, 4), stride=2, **_BLK)
    quant = flash.windowed_fa(q, k, v, (4, 4), stride=2,
                              q_dtype=q_dtype, kv_dtype=q_dtype, **_BLK)
    err = float(jnp.max(jnp.abs(base.astype(jnp.float32) - quant.astype(jnp.float32))))
    assert 0 < err <= 0.15, f"2D windowed quantized err={err}"


@pytest.mark.parametrize("q_dtype", ["int8", "float8_e4m3fn"])
def test_quantized_gqa_matches_repeated_kv(rng, q_dtype):
    """Quantized GQA (kv index maps) equals explicitly repeated K/V."""
    b, hq, hkv, n, d = 1, 6, 2, 192, 32
    q, k, v = (_rand(rng, b, hq, n, d), _rand(rng, b, hkv, n, d),
               _rand(rng, b, hkv, n, d))
    kr = jnp.repeat(k, hq // hkv, axis=1)
    vr = jnp.repeat(v, hq // hkv, axis=1)
    o = flash_q.quantized_flash_attention(
        q, k, v, q_dtype=q_dtype, kv_dtype=q_dtype, **_BLK)
    o_ref = flash_q.quantized_flash_attention(
        q, kr, vr, q_dtype=q_dtype, kv_dtype=q_dtype, **_BLK)
    assert jnp.array_equal(o, o_ref)


@pytest.mark.parametrize("dtype", ["float8_e4m3fn", "float8_e5m2"])
def test_fp8_upcast_exact_bit_exact(dtype):
    """_fp8_upcast_exact reproduces astype(float32) on all non-NaN bytes."""
    dt = jnp.dtype(dtype)
    all_bytes = jnp.arange(256, dtype=jnp.int32).astype(jnp.uint8)
    x = jax.lax.bitcast_convert_type(all_bytes, dt)
    want = x.astype(jnp.float32)
    got = flash_q._fp8_upcast_exact(x).astype(jnp.float32)
    ok = jnp.isfinite(want)  # quantizer never emits inf/NaN encodings
    assert bool(jnp.all(jnp.where(ok, got == want, True)))


@pytest.mark.parametrize("dtype", ["float8_e4m3fn", "float8_e5m2"])
def test_fp8_upcast_fast_bound(dtype):
    """Branch-free upcast: exact on normals; subnormal error within the
    documented 2^(1-bias) absolute bound."""
    dt = jnp.dtype(dtype)
    all_bytes = jnp.arange(256, dtype=jnp.int32).astype(jnp.uint8)
    x = jax.lax.bitcast_convert_type(all_bytes, dt)
    want = x.astype(jnp.float32)
    got = flash_q._fp8_upcast(x).astype(jnp.float32)
    ok = jnp.isfinite(want)  # quantizer never emits inf/NaN encodings
    bound = 2.0 ** -6 if dtype == "float8_e4m3fn" else 2.0 ** -14
    err = jnp.where(ok, jnp.abs(got - want), 0.0)
    assert float(jnp.max(err)) <= bound
    # normals must be bit-exact
    min_normal = 2.0 ** -6 if dtype == "float8_e4m3fn" else 2.0 ** -14
    normal = ok & (jnp.abs(want) >= min_normal)
    assert bool(jnp.all(jnp.where(normal, got == want, True)))
