"""protoquant_tpu: a TPU-native INT8 quantized-inference framework.

Covers the capability surface of Meta's ``facebookexperimental/protoquant``
prototype (per-output-channel symmetric INT8 weight quantization + dynamic
per-token INT8 activation quantization feeding fused int8xint8->int32 matmuls
with fp32 rescale epilogues), redesigned TPU-first and extended into a full
serving path: Pallas MXU kernels, flax QLinear modules, Llama-family models,
an INT8 paged KV-cache with in-kernel-dequant flash attention, a
continuous-batching engine, and mesh-sharded multi-host execution.

Public API (the reference's surface — SURVEY.md §2.1 R1 — plus extensions):
  QTensor, quantize               — quantized-tensor layer (ref: qtensor.py)
  QLinear, qlinear_from_params    — drop-in linear (ref: qlinear.py)
  quantize_model                  — module-tree conversion (ref: qlinear_from_linear)
"""

from .core import QTensor, is_qtensor, quantize
from .version import __version__

__all__ = [
    "QTensor",
    "quantize",
    "is_qtensor",
    "__version__",
]


def __getattr__(name):
    # Lazy imports keep `import protoquant_tpu` light (no flax/pallas import
    # cost until the nn/ops tiers are actually used).
    if name in ("QLinear", "QuantMode", "quantize_model", "qlinear_from_params"):
        from . import nn as _nn

        return getattr(_nn, name)
    if name in ("Engine", "EngineConfig"):
        from . import engine as _engine

        return getattr(_engine, name)
    raise AttributeError(f"module 'protoquant_tpu' has no attribute {name!r}")
