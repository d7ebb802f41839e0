"""Pallas kernel tier — the TPU-native equivalent of the reference's CUDA
extension (SURVEY.md §2.1 R5–R9). These kernels compile via Mosaic to TPU
MXU/VPU programs on TPU and run in interpret mode on CPU (test path)."""

from .dequant import dequant
from .qmatmul import dynamic_qlinear, qmatmul
from .rowquant import rowquant
from .wo4_matmul import weight_only_int4_matmul
from .wo_matmul import weight_only_matmul
from .xla_backend import (
    dynamic_qlinear_xla,
    weight_only_int4_matmul_xla,
    weight_only_matmul_xla,
)

# Linear-op backend: "pallas" (explicit kernels, bit-exact int32 path) or
# "xla" (compiler-fused bf16-lane formulations — faster where pallas_call
# custom-calls carry per-invocation overhead; same int8/int4 HBM traffic).
LINEAR_BACKEND = "pallas"

__all__ = [
    "rowquant",
    "qmatmul",
    "dynamic_qlinear",
    "weight_only_matmul",
    "weight_only_int4_matmul",
    "dequant",
    "dynamic_qlinear_xla",
    "weight_only_matmul_xla",
    "weight_only_int4_matmul_xla",
]
