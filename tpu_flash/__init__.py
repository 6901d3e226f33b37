"""tpu_flash — TPU-native quantized flash-attention inference engine.

A brand-new JAX/XLA/Pallas framework with the capability surface of the
reference FlashAttention.jl study (see SURVEY.md): the fused attention kernel
family (dense / windowed / block / circulant, 1D/2D/3D, forward + backward),
f32 oracles, fused softmax primitives, and a benchmark harness — extended
TPU-first with FP8/INT8 quantized kernels, an INT8/INT4 paged KV-cache,
a continuous-batching decode engine, and ring attention over a device mesh.

Array convention: attention cores operate on ``(batch, heads, seq, head_dim)``;
N-d wrappers take ``(batch, *spatial, heads, head_dim)``. This deliberately
breaks with the reference's Julia column-major ``(N…, d, batch)`` layout
(reference src/FlashAttention.jl:13-27) in favour of the layout XLA tiles best.
"""

from tpu_flash.ops.oracle import (
    dense_dpa,
    windowed_dpa,
    block_dpa,
    blockwise_dpa,
    circulant_dpa,
    sliding_dpa,
)
from tpu_flash.ops.flash import (
    dense_fa,
    windowed_fa,
    block_fa,
    circulant_fa,
    sliding_fa,
    flash_attention,
)
from tpu_flash.ops.softmax import fused_softmax
from tpu_flash.ops.schedule import (
    Schedule,
    DenseSchedule,
    CausalSchedule,
    LocalSchedule,
    BlockDiagonalSchedule,
    CirculantSchedule,
)

__version__ = "0.1.0"

__all__ = [
    "dense_dpa",
    "windowed_dpa",
    "block_dpa",
    "blockwise_dpa",
    "circulant_dpa",
    "sliding_dpa",
    "dense_fa",
    "windowed_fa",
    "block_fa",
    "circulant_fa",
    "sliding_fa",
    "flash_attention",
    "fused_softmax",
    "Schedule",
    "DenseSchedule",
    "CausalSchedule",
    "LocalSchedule",
    "BlockDiagonalSchedule",
    "CirculantSchedule",
]
