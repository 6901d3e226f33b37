from tpu_flash.models.transformer import (
    ModelConfig,
    init_params,
    forward,
    prefill,
    decode_step,
    loss_fn,
    quantize_weights,
)
