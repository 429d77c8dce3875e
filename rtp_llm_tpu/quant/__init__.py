"""Load-time quantization + quantized matmul ops.

TPU-native analog of the reference's quant-weight module family
(rtp_llm/model_loader/*_quant_weight.py + QuantMethod enum,
cpp/model_utils/QuantInfo.h:6-19). Each scheme is a loader transform that
rewrites a canonical weight into quantized storage (+ scale entries) and a
matmul op whose HBM traffic is the quantized bytes — the dequant happens on
the way into the MXU (XLA fuses convert+scale into the matmul operand).
"""

from rtp_llm_tpu.quant.weight_only import (
    make_quant_transform,
    quantized_matmul,
    int8_quantize,
    int4_pack,
    int4_unpack,
)

__all__ = [
    "make_quant_transform",
    "quantized_matmul",
    "int8_quantize",
    "int4_pack",
    "int4_unpack",
]
