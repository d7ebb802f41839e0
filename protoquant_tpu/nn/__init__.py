from .awq import awq_params, awq_quantize, collect_norm_outputs
from .convert import dequantize_params, quantize_params, quantized_bytes
from .fuse import fuse_projections
from .gptq import collect_grams, gptq_params
from .lora import (
    attach_lora,
    attach_lora_stack,
    import_hf_lora,
    merge_lora,
    set_stack_adapter,
)
from .qlinear import QLinear
from .smooth import collect_activation_stats, smooth_params, smoothquant
from .static import attach_static_scales, calibrate_static, static_quantize

# The reference's conversion entry point is `qlinear_from_linear`; ours is the
# params-tree transform (model defs already use QLinear).
qlinear_from_params = quantize_params
quantize_model = quantize_params

__all__ = [
    "QLinear",
    "quantize_params",
    "quantize_model",
    "qlinear_from_params",
    "dequantize_params",
    "quantized_bytes",
    "fuse_projections",
    "collect_activation_stats",
    "smooth_params",
    "smoothquant",
    "calibrate_static",
    "attach_static_scales",
    "static_quantize",
    "collect_grams",
    "gptq_params",
    "awq_quantize",
    "awq_params",
    "collect_norm_outputs",
    "attach_lora",
    "attach_lora_stack",
    "set_stack_adapter",
    "import_hf_lora",
    "merge_lora",
]
