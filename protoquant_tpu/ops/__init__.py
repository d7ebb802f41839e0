"""Pallas kernel tier — the TPU-native equivalent of the reference's CUDA
extension (SURVEY.md §2.1 R5–R9). These kernels compile via Mosaic to TPU
MXU/VPU programs on TPU and run in interpret mode on CPU (test path)."""

from .dequant import dequant
from .qmatmul import dynamic_qlinear, qmatmul
from .rowquant import rowquant
from .w4a8_matmul import w4a8_matmul
from .wo4_matmul import weight_only_int4_matmul
from .wo_matmul import weight_only_matmul
from .xla_backend import (
    dynamic_qlinear_xla,
    static_qlinear_xla,
    weight_only_fp8_group_matmul_xla,
    weight_only_int4_matmul_xla,
    weight_only_matmul_xla,
)

# Linear-op backend:
#   "auto"   (default) — measured-table routing, see resolve_linear_backend
#   "pallas" — explicit Mosaic kernels, the bit-exact-int32 contract path
#   "xla"    — compiler-fused formulations (int8 operands ride the MXU dot;
#              scales/casts fuse into operands/epilogue)
LINEAR_BACKEND = "auto"


def resolve_linear_backend(m: int | None = None,
                           k: int | None = None,
                           n: int | None = None) -> str:
    """Resolve the backend for one linear GEMM of shape [m,k]x[k,n].

    Under "auto" every linear routes to the XLA formulation on this
    hardware, by measurement (BASELINE.md round-2 formulation probe,
    bench/prefill_formulation_probe.py):

      * prefill (M>=512): XLA compiles the int8 dot onto the int8 MXU at
        0.69–0.78 of the 394 T-op/s peak — the same relative efficiency as
        XLA's own bf16 matmul (0.77–0.83 of its peak), i.e. roofline-class.
        The Pallas qmatmul kernel reaches 0.49–0.65 after block tuning.
      * decode (small M): memory-bound; the XLA form fuses into neighbours
        while each pallas_call carries fixed per-invocation overhead
        (measured end-to-end: 0.84x pallas vs 1.40x xla in round 1).

    The Pallas tier remains (a) the bit-exact int32-accumulator contract
    path ("pallas" override, used by the numerics tests) and (b) the ONLY
    path for ops XLA cannot express as well: the rowquant VPU kernel,
    flash/paged int8-KV attention, and int4 nibble handling. The m/k/n
    arguments exist so future hardware/runtimes can split the table by
    shape without touching call sites."""
    if LINEAR_BACKEND == "auto":
        return "xla"
    return LINEAR_BACKEND


# Producer-fused quantization (ops/fused_quant.py): fused RMSNorm->int8 /
# SwiGLU->int8 Pallas kernels that emit the dynamic projections' (int8,
# scale) in one HBM pass instead of XLA's three (norm write + amax pass +
# rescale pass). Decision record (measured on this chip, 2026-08-17,
# bench/prefill_overhead_probe.py + prefill_bench A/B): "auto" resolves OFF
# here because the ~128MB on-chip cache serves those extra activation
# passes at ~4.7TB/s — the fused kernels' HBM-side DMA reads (which bypass
# the cache) measure parity-to-slightly-negative at the model level (1.53x
# vs 1.54x at 512 prefill tokens). On cache-less TPU parts the saved passes
# are real (~80us/layer at M=512/7B); flip with FUSED_QUANT=on (env or
# module knob). Tests pin both paths.
import os as _os

FUSED_QUANT = _os.environ.get("FUSED_QUANT", "auto")


def resolve_fused_quant() -> bool:
    return FUSED_QUANT == "on"


# Dynamic rowquant backend, decoupled from the linear backend: the shared
# per-token quant pass ahead of the XLA int8 dots can run as the Pallas
# VPU kernel ("pallas") or as XLA elementwise ops ("xla"). Probe A/B on
# this chip (bench/prefill_overhead_probe.py, M=512: pallas-rowquant +
# XLA dot 154.2us vs all-XLA 163.3us — the kernel's one-pass amax+cast
# beats XLA's separate reduction+rescale); model-level A/B via the
# ROWQUANT_BACKEND knob over bench/prefill_bench.py decides "auto".
ROWQUANT_BACKEND = _os.environ.get("ROWQUANT_BACKEND", "auto")

# Token-count floor for routing the quant pass to the kernel under "auto":
# below this the regime is memory-bound decode, where pallas_call fixed
# overhead per projection group loses to XLA's fused elementwise quant
# (round-1 decode finding); at/above it the quant pass is a measurable
# slice of compute-bound prefill and the kernel's single pass wins.
_ROWQUANT_PALLAS_MIN_M = 256


def resolve_rowquant_backend(m: int | None = None) -> str:
    if ROWQUANT_BACKEND != "auto":
        return ROWQUANT_BACKEND
    import jax

    if jax.default_backend() != "tpu":
        # Off-TPU the kernel runs in interpret mode — follow the linear
        # backend so CPU tests exercise the XLA formulation by default.
        return resolve_linear_backend()
    if m is not None and m < _ROWQUANT_PALLAS_MIN_M:
        return "xla"
    return "pallas"


def shared_rowquant(x):
    """Per-token dynamic quant (x[..., K] -> (int8, f32 scales)) via the
    resolved rowquant backend. Both backends are bit-identical
    (ops/rowquant.py matches core.numerics.quantize_rowwise exactly)."""
    m = x.size // x.shape[-1]
    if resolve_rowquant_backend(m) == "pallas":
        return rowquant(x)
    from ..core import numerics

    return numerics.quantize_rowwise(x)


# W4A8 (dynamic_int4) kernel formulation: "group" = exact int4 semantics,
# per-group K=64 sub-dots (MXU-underfilled — 0.79x bf16 at M=512, measured
# r3); "two_level" = in-VMEM per-channel int8 requant of the nibbles + ONE
# big-K dot per block (ROADMAP 8 / VERDICT r3 item 4). Round-4 DEFAULT:
# two_level — the quality ladder v2 measured ZERO model-level cost vs
# group (identical ppl/cosine, BASELINE.md ladder decision 3) and the
# block sweep took it to 248 eff T-ops = 1.30x bf16 at M=512
# (bench/w4a8_sweep.py; group measures 0.79x). Set W4A8_FORMULATION=group
# to restore exact-int4 rounding semantics.
W4A8_FORMULATION = _os.environ.get("W4A8_FORMULATION", "two_level")


def resolve_w4a8_formulation() -> str:
    return W4A8_FORMULATION

__all__ = [
    "rowquant",
    "qmatmul",
    "dynamic_qlinear",
    "weight_only_matmul",
    "w4a8_matmul",
    "weight_only_int4_matmul",
    "dequant",
    "dynamic_qlinear_xla",
    "static_qlinear_xla",
    "weight_only_matmul_xla",
    "weight_only_int4_matmul_xla",
    "weight_only_fp8_group_matmul_xla",
]
