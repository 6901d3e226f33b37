"""VMEM feasibility model for the forward attention kernels.

The big-tile sweeps of rounds 3-4 died as raw remote-compile HTTP 500s on
configs whose VMEM demand exceeded the scoped grant (logs/r3_exp3.jsonl,
logs/r4_exp1.jsonl: ~30 rows of `tpu_compile_helper exit code 1`). The
kernels already knew their score-tile arithmetic — this module turns it
into a *predictive* model so that

  1. the grant is sized to the config (not the coarse 64/96 MB steps that
     under-granted bq8192/bkv1024 and over-promised bq4096/bkv4096), and
  2. configs beyond the hardware envelope are refused with a structured
     ``VmemInfeasibleError`` BEFORE lowering, so sweeps log ``pruned: vmem``
     instead of a compiler stack trace and autotuners skip them for free.

Demand model (bytes), calibrated against every measured accept/reject in
logs/r3_exp3.jsonl, r3_exp4.jsonl, r4_exp1.jsonl, r4_exp2.jsonl:

  demand =   score_f32            (bhb x bq x bkv x 4 - the live QK tile)
           + p_tile               (exp2 output staged for PV: bf16 = /2,
                                   int8 under pv_quant = /4)
           + mask_extra           (masked schedules keep a second f32 copy
                                   live across the where-branch)
           + scratch              (m/l/acc/q_scr/qs/qb as allocated)
           + 2 x io_blocks        (every BlockSpec operand+output is
                                   double-buffered by the Pallas pipeline)

Observed calibration points (int8-token serving, d=dv=128, n=8k):
  bq4096/bkv2048/bhb1 -> ~66 MB demand : compiled at a 64 MB grant (OK)
  bq8192/bkv512 /bhb1 -> ~50 MB        : OK
  bq2048/bkv2048/bhb2 -> ~66 MB        : OK
  bq8192/bkv1024/bhb1 -> ~78 MB        : FAILED at the old 64 MB grant
                                         (under-granted, not infeasible)
  bq4096/bkv4096/bhb1 -> ~115 MB       : FAILED at a 96 MB grant
  bq4096/bkv2048/bhb2 -> ~125 MB       : FAILED at a 96 MB grant

The v5e core has 128 MB of VMEM; Mosaic needs headroom for its own
staging, so the default ceiling is 104 MB (tests/test_vmem_model.py pins
the model to the measured accept/reject table; scripts/r4_exp3.py probes
the marginal band empirically).

Reference parity: the reference hard-coded its cache size and paid 4-30x
swings for it (src/dense.jl:28 M=32_000; src_cpp cache sweep l1/l2/l3) —
SURVEY SS5 calls out "a config system should know its own envelope".
"""

from __future__ import annotations

import os
from dataclasses import dataclass

MB = 1 << 20

#: Largest scoped-VMEM grant this model will request. Beyond it, configs
#: are refused up front. Env-overridable for probing the envelope.
VMEM_CEILING_BYTES = int(
    os.environ.get("TPU_FLASH_VMEM_CEILING_MB", "104")) * MB

#: Fixed compiler-staging margin added on top of the modeled demand.
_GRANT_MARGIN = 6 * MB

#: Below this demand the Pallas default (16 MB scoped) is left alone.
_DEFAULT_SCOPED = 14 * MB


class VmemInfeasibleError(ValueError):
    """Raised before lowering when a block config cannot fit VMEM.

    Sweeps catch this and emit a structured ``{"pruned": "vmem"}`` row —
    distinguishing "impossible by arithmetic" from "broken kernel".
    """

    def __init__(self, demand_bytes: int, detail: str):
        self.demand_bytes = demand_bytes
        super().__init__(
            f"config needs ~{demand_bytes / MB:.0f} MB VMEM "
            f"(> {VMEM_CEILING_BYTES / MB:.0f} MB ceiling): {detail}")


@dataclass(frozen=True)
class VmemEstimate:
    demand_bytes: int      # modeled peak VMEM use
    grant_bytes: int | None  # vmem_limit_bytes to request (None: default)
    detail: str

    @property
    def feasible(self) -> bool:
        return self.demand_bytes <= VMEM_CEILING_BYTES

    def check(self) -> "VmemEstimate":
        if not self.feasible:
            raise VmemInfeasibleError(self.demand_bytes, self.detail)
        return self


def _grant(demand: int) -> int | None:
    if demand <= _DEFAULT_SCOPED:
        return None
    # round up to 8 MB so compilation-cache keys stay stable across
    # nearby shapes
    granted = min(((demand + _GRANT_MARGIN + 8 * MB - 1) // (8 * MB))
                  * 8 * MB, VMEM_CEILING_BYTES)
    return granted


def estimate_fwd_vmem(
    *,
    block_q: int,
    block_kv: int,
    d: int,
    dv: int,
    bh_block: int = 1,
    q_mode: str = "raw",       # "raw" | "fp8" | "int8" (serving kernel)
    kv_bytes: int = 2,          # element size of the cache/K/V operands
    bound_max: bool = False,
    k_scaled: bool = False,
    pv_quant: bool = False,
    masked: bool = False,
    has_bias_operand: bool = False,
    need_lse: bool = False,
    q_bytes: int = 2,
    out_bytes: int = 2,
    lanes: int = 128,
    kv_resident_steps: int = 0,
) -> VmemEstimate:
    """Model the standard-layout forward kernel's peak VMEM use.

    Covers both ``ops/flash.py:_fwd_kernel`` (q_mode="raw", kv_bytes=2,
    no q scratch quant extras) and ``quant/serving_attn.py:_sv_kernel``.
    """
    bhb, bq, bkv = bh_block, block_q, block_kv

    score = bhb * bq * bkv * 4                      # live f32 QK tile
    p = bhb * bq * bkv * (1 if pv_quant else 2)     # staged exp2 output
    mask_extra = bhb * bq * bkv * 4 if (masked and not has_bias_operand) \
        else 0

    scratch = 2 * bhb * bq * lanes * 4              # m, l
    scratch += bhb * bq * dv * 4                    # acc
    # The serving kernel (quantized K/V residents) stages Q and its
    # per-row score scales in scratch; the bf16 kernel (kv_bytes == 2)
    # has neither. bound_max itself allocates nothing extra: the constant
    # bound folds into m_scr at init (r4 §22 upgrade).
    is_serving = q_mode in ("fp8", "int8") or kv_bytes == 1
    if is_serving:
        scratch += bhb * bq * d * (1 if q_mode == "int8" else 2)  # q_scr
        if q_mode == "int8":
            scratch += bhb * bq * lanes * 4         # qs rows

    if kv_resident_steps:
        # staged bf16 upcast tiles persist for the whole q sweep
        # (serving_attn kv_resident — DESIGN §21)
        if q_mode != "int8":
            scratch += bhb * kv_resident_steps * bkv * d * 2
        scratch += bhb * kv_resident_steps * bkv * dv * 2

    io = bhb * bq * d * q_bytes                     # q block
    io += bhb * bkv * d * kv_bytes                  # k block
    io += bhb * bkv * dv * kv_bytes                 # v block
    if bound_max:
        io += bhb * 4                               # global-kmax scalars
    if k_scaled:
        io += bhb * bkv * 4                         # sk row
    if has_bias_operand:
        io += bq * bkv * 2  # streamed bf16 bias — ONE tile, shared by
        #                     every packed bh row ((1, bq, bkv) BlockSpec)
    io += bhb * bq * dv * out_bytes                 # o block
    io += bhb * (bq if need_lse else 1) * lanes * 4  # lse block
    io *= 2                                         # double buffering

    demand = score + p + mask_extra + scratch + io
    detail = (f"score={score / MB:.0f}MB p={p / MB:.0f}MB "
              f"scratch={scratch / MB:.0f}MB io(2x)={io / MB:.0f}MB"
              + (f" mask_extra={mask_extra / MB:.0f}MB" if mask_extra
                 else ""))
    return VmemEstimate(demand, _grant(demand), detail)


def estimate_bwd_vmem(
    *,
    block_q: int,
    block_kv: int,
    d: int,
    dv: int,
    bh_block: int = 1,
    n_live_tiles: int = 2,     # s/p/dp overlap; Mosaic streams the chain —
    #                            2048² bhb1 measured compiling at a 32 MB
    #                            grant (logs/r4_exp6.jsonl), so ~1.5 tiles
    #                            are effectively live; 2 leaves slack
    n_acc: int = 2,            # dk + dv (or dq) f32 accumulators
    io_operands_bytes: int | None = None,
    lanes: int = 128,
) -> VmemEstimate:
    """Model the backward kernels' peak VMEM (ops/flash_bwd.py).

    The backward holds more simultaneous (bq, bkv) tiles than the forward
    (the s → p → ds chain plus dp), but Mosaic streams the chain so the
    measured effective count is ~1.5 live f32 tiles; ``n_live_tiles``
    defaults to 2, which matched every observed accept/reject
    (tests/test_vmem_model.py).
    """
    bhb, bq, bkv = bh_block, block_q, block_kv
    tiles = bhb * bq * bkv * 4 * n_live_tiles
    acc = n_acc * bhb * max(bq, bkv) * max(d, dv) * 4
    if io_operands_bytes is None:
        # q, k, v, o, do blocks (bf16) + lse/delta rows ((bhb, 1, bq)
        # f32 BlockSpecs — NOT lane-broadcast), x2 buffers
        io_operands_bytes = 2 * (
            bhb * bq * d * 2 * 3 + bhb * bkv * d * 2 * 2
            + 2 * bhb * bq * 4
            + bhb * max(bq, bkv) * max(d, dv) * 4)
    demand = tiles + acc + io_operands_bytes
    detail = (f"tiles({n_live_tiles})={tiles / MB:.0f}MB "
              f"acc={acc / MB:.0f}MB io={io_operands_bytes / MB:.0f}MB")
    return VmemEstimate(demand, _grant(demand), detail)
