"""The VMEM feasibility model (ops/vmem.py) must match Mosaic's measured
accept/reject behavior on the calibration configs from the round-3/4 TPU
sweeps (logs/r3_exp3.jsonl, r3_exp4.jsonl, r4_exp1.jsonl, r4_exp2.jsonl).

Every row here was actually submitted to the v5e compiler:
  - "ok" rows compiled and ran at the grant the old logic picked;
  - "reject" rows HTTP-500'd at a 96 MB grant — infeasible by arithmetic
    (their modeled demand exceeds the 104 MB ceiling);
  - "marginal" rows failed only at an under-sized 64 MB grant; the model
    must size their grant above 64 MB (they are re-probed on hardware by
    scripts/r4_exp3.py rather than asserted feasible here).

VERDICT r3 item 2: "a unit test asserts the prediction matches Mosaic's
accept/reject on, say, bq4096/bkv4096".
"""

import pytest

from tpu_flash.ops.vmem import (
    MB,
    VMEM_CEILING_BYTES,
    VmemInfeasibleError,
    estimate_bwd_vmem,
    estimate_fwd_vmem,
)

SERVING = dict(d=128, dv=128, q_mode="int8", kv_bytes=1, bound_max=True,
               k_scaled=True)


# (block_q, block_kv, bh_block) -> compiled on the v5e (a grant existed
# at which Mosaic accepted it, and it produced gated, timed rows)
MEASURED_OK = [
    (1024, 2048, 1),
    (2048, 2048, 1),
    (4096, 2048, 1),   # the shipped r3 default, int8 175.8 TFLOP/s
    (2048, 4096, 1),
    (8192, 512, 1),
    (1024, 2048, 4),   # int8 177.9 — r3's best measured
    (2048, 2048, 2),
    (512, 2048, 8),
    (1024, 1024, 8),
    (2048, 1024, 4),
]

# HTTP-500 at a 96 MB grant — beyond the envelope at any grant the
# hardware can honor.
MEASURED_REJECT = [
    (4096, 4096, 1),
    (2048, 4096, 2),   # same footprint class as 4096x4096
    (4096, 2048, 2),
    (8192, 2048, 1),
]

# HTTP-500 at the old coarse 64 MB grant only; the model must ask for
# more than 64 MB for these (under-granted, not provably infeasible).
MEASURED_MARGINAL = [
    (8192, 1024, 1),
    (4096, 1024, 2),
]


@pytest.mark.parametrize("bq,bkv,bhb", MEASURED_OK)
def test_measured_ok_configs_are_feasible(bq, bkv, bhb):
    est = estimate_fwd_vmem(block_q=bq, block_kv=bkv, bh_block=bhb,
                            **SERVING)
    assert est.feasible, (bq, bkv, bhb, est.detail)
    est.check()  # must not raise


@pytest.mark.parametrize("bq,bkv,bhb", MEASURED_REJECT)
def test_measured_rejects_are_pruned(bq, bkv, bhb):
    est = estimate_fwd_vmem(block_q=bq, block_kv=bkv, bh_block=bhb,
                            **SERVING)
    assert not est.feasible, (bq, bkv, bhb, est.detail)
    with pytest.raises(VmemInfeasibleError) as ei:
        est.check()
    assert "vmem" in str(ei.value).lower()
    assert ei.value.demand_bytes > VMEM_CEILING_BYTES


@pytest.mark.parametrize("bq,bkv,bhb", MEASURED_MARGINAL)
def test_undergranted_configs_get_bigger_grants(bq, bkv, bhb):
    est = estimate_fwd_vmem(block_q=bq, block_kv=bkv, bh_block=bhb,
                            **SERVING)
    assert est.feasible, (bq, bkv, bhb, est.detail)
    assert est.grant_bytes is not None and est.grant_bytes > 64 * MB, (
        est.grant_bytes, est.detail)


def test_grant_monotone_and_defaulted():
    small = estimate_fwd_vmem(block_q=512, block_kv=1024, **SERVING)
    assert small.grant_bytes is None  # under the 16 MB Pallas default
    big = estimate_fwd_vmem(block_q=4096, block_kv=2048, **SERVING)
    assert big.grant_bytes is not None
    assert big.grant_bytes <= VMEM_CEILING_BYTES
    assert big.demand_bytes > small.demand_bytes


def test_bf16_fwd_model_covers_measured_points():
    # bf16 dense_fa rows from logs/r4_exp1.jsonl: 8192x1024 compiled,
    # 8192x2048 rejected.
    ok = estimate_fwd_vmem(block_q=8192, block_kv=1024, d=128, dv=128)
    assert ok.feasible, ok.detail
    bad = estimate_fwd_vmem(block_q=8192, block_kv=2048, d=128, dv=128)
    assert not bad.feasible, bad.detail


def test_serving_kernel_raises_before_lowering():
    """The public API must refuse the infeasible config with the
    structured error (not a compiler 500) even on CPU."""
    import jax.numpy as jnp
    import numpy as np

    from tpu_flash.quant.serving_attn import (
        quantize_kv_cache,
        serving_flash_attention,
    )

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 1, 8192, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 1, 8192, 128)), jnp.bfloat16)
    kq, vq = quantize_kv_cache(k, k, jnp.int8)
    with pytest.raises(VmemInfeasibleError):
        serving_flash_attention(q, kq, vq, q_dtype=jnp.int8,
                                block_q=4096, block_kv=4096)


def test_bwd_estimate_sane():
    est = estimate_bwd_vmem(block_q=512, block_kv=1024, d=128, dv=128)
    assert est.demand_bytes > 0
    assert est.feasible
    huge = estimate_bwd_vmem(block_q=8192, block_kv=4096, d=128, dv=128)
    assert not huge.feasible
