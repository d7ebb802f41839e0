"""XLA-fused formulations of the quantized linears (backend option).

Same HBM story as the Pallas kernels — weights stream as int8, scales/casts
fuse into the MXU operands — but expressed as XLA ops so the compiler owns
scheduling/fusion. On runtimes where pallas_call custom-calls carry fixed
per-invocation overhead inside a larger XLA program (measured on this
environment's TPU tunnel), these win at decode shapes; the Pallas tier
remains the explicit-control variant and the only bit-exact-int32 path.

Numerics note (dynamic): bf16 x bf16 multiplies are exact for int8-valued
operands (products <= 127^2 fit f32's mantissa via the f32 accumulator);
only the f32 accumulation rounds, and only beyond 2^24 magnitude — within
the reference's fp32-epilogue tolerance but not bit-exact vs the int32
accumulator. The contract tests pin the Pallas path; these are
perf-equivalent alternatives validated to fp tolerance.
"""

from __future__ import annotations

import jax.numpy as jnp


def dynamic_qlinear_xla(x, wq, s_w, bias=None, out_dtype=None, prequantized=None):
    """rowquant (XLA elementwise) -> bf16-lane int8 matmul -> fp32 epilogue."""
    from ..core import numerics

    out_dtype = out_dtype or x.dtype
    if prequantized is not None:
        xq, s_x = prequantized
    else:
        xq, s_x = numerics.quantize_rowwise(x)
    acc = jnp.matmul(
        xq.astype(jnp.bfloat16),
        wq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    y = acc * s_x[..., None] * s_w[None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def weight_only_matmul_xla(x, wq, s_w, bias=None, out_dtype=None):
    """int8 weight streamed from HBM; cast fuses into the dot operand; the
    per-channel scale factorizes into the f32 epilogue (exact)."""
    out_dtype = out_dtype or x.dtype
    acc = jnp.matmul(
        x.astype(jnp.bfloat16),
        wq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    y = acc * s_w[None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def weight_only_int4_matmul_xla(x, packed, scales, group, bias=None, out_dtype=None):
    """int4 nibbles streamed from HBM, unpacked+dequantized by XLA ops."""
    from ..core import numerics

    out_dtype = out_dtype or x.dtype
    q = numerics.unpack_int4(packed, group)
    k, n = q.shape
    w = (
        q.astype(jnp.float32).reshape(k // group, group, n) * scales[:, None, :]
    ).reshape(k, n)
    acc = jnp.matmul(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(out_dtype)
