from tpu_flash.quant.qarray import QArray, quantize, dequantize, QMAX
from tpu_flash.quant.flash_q import quantized_flash_attention, quantized_dense_fa
