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


def static_qlinear_xla(x, wq, s_w, s_act, bias=None, out_dtype=None):
    """W8A8 with a CALIBRATED per-tensor activation scale (vLLM-style
    static activation quantization; round 4, VERDICT r3 item 8 line of
    attack): the amax REDUCTION that makes dynamic rowquant an
    unoverlappable VPU pass (~15% of prefill, BASELINE.md decomposition)
    disappears — what remains is elementwise multiply+round+cast that XLA
    fuses into the dot's operand stream. s_act: scalar f32 from
    nn/static.py calibration."""
    out_dtype = out_dtype or x.dtype
    inv = 1.0 / jnp.maximum(s_act, 1e-12)
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv), -127, 127
    ).astype(jnp.int8)
    acc = jnp.matmul(
        xq.astype(jnp.bfloat16),
        wq.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    y = acc * (s_act * s_w)[None, :]
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


def weight_only_fp8_group_matmul_xla(x, w8, scales, group, bias=None,
                                     out_dtype=None):
    """fp8 e4m3 weights with per-(K-group, out-channel) scales.

    Same factorization as the native-s4 path below: for decode-sized M the
    group scales ride a [M, K/g, N] partial-sum einsum (e4m3 -> bf16 convert
    is exact — 3 mantissa bits fit bf16 — and rides the dot operand); for
    large M the materialized-dequant form wins compute-bound anyway."""
    import jax

    out_dtype = out_dtype or x.dtype
    lane = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    k, n = w8.shape
    m = x.reshape(-1, k).shape[0]
    if m <= 64:
        xg = x.reshape(-1, k // group, group)
        wg = w8.reshape(k // group, group, n).astype(lane)
        acc = jnp.einsum(
            "mgk,gkn->mgn", xg.astype(lane), wg,
            preferred_element_type=jnp.float32,
        )
        y = jnp.einsum("mgn,gn->mn", acc, scales)
        y = y.reshape(*x.shape[:-1], n)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(out_dtype)
    w = (
        w8.astype(jnp.float32).reshape(k // group, group, n)
        * scales[:, None, :]
    ).reshape(k, n)
    acc = jnp.matmul(
        x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(out_dtype)


def weight_only_int4_matmul_xla(x, packed, scales, group, bias=None, out_dtype=None):
    """int4 weights via XLA.

    Native-s4 storage (packed.dtype == jnp.int4, [K, N]): XLA:TPU stores s4
    packed in HBM (half the int8 bytes) and owns the nibble unpack, so the
    bf16 convert rides the dot operand. Group scales factorize EXACTLY by
    splitting the contraction per group — y = sum_g (x_g @ w4_g) * s[g] —
    a batched [K/group] x [M, g] @ [g, N] einsum instead of materializing a
    dequantized [K, N] copy. The [M, K/group, N] f32 partials stay fusable
    for decode-sized M; for large M (prefill) the materialized-dequant form
    wins compute-bound anyway, so we switch there.

    Byte-packed storage (int8 [K/2, N]): legacy path — unpack with shifts
    and materialize the dequantized weight (2x+ int8 traffic; the Pallas wo4
    kernel is the right consumer for this layout)."""
    from ..core import numerics

    out_dtype = out_dtype or x.dtype
    if packed.dtype == jnp.int4:
        import jax

        # bf16 lanes on TPU (native MXU rate, exact for int4 values); f32 on
        # CPU (XLA:CPU's dot thunk can't execute bf16 x bf16).
        lane = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        k, n = packed.shape
        m = x.reshape(-1, k).shape[0]
        if m <= 64:
            xg = x.reshape(-1, k // group, group)
            wg = packed.reshape(k // group, group, n).astype(lane)
            acc = jnp.einsum(
                "mgk,gkn->mgn",
                xg.astype(lane),
                wg,
                preferred_element_type=jnp.float32,
            )
            y = jnp.einsum("mgn,gn->mn", acc, scales)
            y = y.reshape(*x.shape[:-1], n)
            if bias is not None:
                y = y + bias.astype(jnp.float32)
            return y.astype(out_dtype)
        w = (
            packed.astype(jnp.float32).reshape(k // group, group, n)
            * scales[:, None, :]
        ).reshape(k, n)
    else:
        q = numerics.unpack_int4(packed, group)
        k, n = q.shape
        w = (
            q.astype(jnp.float32).reshape(k // group, group, n)
            * scales[:, None, :]
        ).reshape(k, n)
    acc = jnp.matmul(
        x.astype(jnp.bfloat16),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        acc = acc + bias.astype(jnp.float32)
    return acc.astype(out_dtype)
