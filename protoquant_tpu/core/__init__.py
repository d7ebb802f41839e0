from . import numerics
from .qtensor import QTensor, is_qtensor, quantize

__all__ = ["numerics", "QTensor", "quantize", "is_qtensor"]
