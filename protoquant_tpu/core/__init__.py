from . import numerics
from .qtensor import QTensor, QTensor4, QTensorF8, is_qtensor, quantize

__all__ = ["numerics", "QTensor", "QTensor4", "QTensorF8", "quantize", "is_qtensor"]
