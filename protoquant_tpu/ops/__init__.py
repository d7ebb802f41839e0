"""Pallas kernel tier — the TPU-native equivalent of the reference's CUDA
extension (SURVEY.md §2.1 R5–R9). These kernels compile via Mosaic to TPU
MXU/VPU programs on TPU and run in interpret mode on CPU (test path)."""

from .dequant import dequant
from .qmatmul import dynamic_qlinear, qmatmul
from .rowquant import rowquant
from .wo4_matmul import weight_only_int4_matmul
from .wo_matmul import weight_only_matmul

__all__ = [
    "rowquant",
    "qmatmul",
    "dynamic_qlinear",
    "weight_only_matmul",
    "weight_only_int4_matmul",
    "dequant",
]
