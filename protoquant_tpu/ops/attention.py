"""Pallas kernel: attention over an INT8 KV-cache with in-kernel dequant.

Component A2 (SURVEY.md §2.3; pattern space: INT-FlashAttention, PAPERS.md).
The decode bottleneck is HBM bandwidth on the KV-cache read; storing K/V as
int8 with per-token-per-head scales halves the bytes, and this kernel
dequantizes in VMEM so no fp copy of the cache ever exists in HBM.

Numerics: the per-token scale factorizes out of both dots exactly —
  score[t, s] = ks[s] * (q[t] . kq[s])        (scale applied after the MXU dot)
  out[t]      = sum_s (p[t, s] * vs[s]) * vq[s]  (scale folded into the prob)
so int8 dequant costs no extra matmul precision.

Grid: (batch, kv_head). Each program computes all `group` query heads of one
(b, kv) pair over the full cache row with online masking by cache length.
Supports T >= 1 queries (chunked prefill uses T = chunk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import default_interpret

NEG_INF = -1e30


def _attn_kernel(
    len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, group, t_q, lane
):
    """One (b, kv_head) pair.

    q_ref:  (1, 1, TG, Dh)   TG = t_q * group query rows
    k_ref:  (1, 1, S, Dh)    int8
    ks_ref: (1, 1, 1, S)     f32 key scales
    v_ref:  (1, 1, S, Dh)    int8
    vs_ref: (1, 1, 1, S)     f32 value scales
    len_ref: (B, 1) SMEM     pre-update cache lengths (full array; indexed by
                             the batch grid coordinate — TPU SMEM blocks must
                             cover the whole array)
    """
    # MXU lanes: bf16 on TPU (native rate; exact for int8 values), f32 in
    # interpret mode off-TPU.
    q = q_ref[0, 0].astype(lane)  # (TG, Dh)
    k = k_ref[0, 0].astype(lane)  # (S, Dh)
    ks = ks_ref[0, 0]  # (1, S)
    dh = q.shape[-1]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (TG, S)
    scores = scores * ks * (1.0 / (dh**0.5))

    # Causal/length mask: query row r belongs to step t = r // group at
    # absolute position len + t; key slot s is valid iff s <= len + t.
    s_cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    t_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0) // group
    valid = s_cols <= (len_ref[pl.program_id(0), 0] + t_rows)
    scores = jnp.where(valid, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0, 0].astype(lane)  # (S, Dh)
    vs = vs_ref[0, 0]  # (1, S)
    out = jax.lax.dot_general(
        (p * vs).astype(lane), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = (out / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("group", "t_q", "interpret", "out_dtype"))
def _attend(q, kq, ks, vq, vs, lengths, *, group, t_q, interpret, out_dtype):
    B, KV, TG, Dh = q.shape
    S = kq.shape[2]
    ks4 = ks.reshape(B, KV, 1, S)
    vs4 = vs.reshape(B, KV, 1, S)
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)

    lane = jnp.float32 if interpret else jnp.bfloat16
    kernel = functools.partial(_attn_kernel, group=group, t_q=t_q, lane=lane)
    return pl.pallas_call(
        kernel,
        grid=(B, KV),
        in_specs=[
            pl.BlockSpec((B, 1), lambda b, h: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, TG, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, S, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, S), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TG, Dh), lambda b, h: (b, h, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, KV, TG, Dh), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(lengths2, q, kq, ks4, vq, vs4)


def int8_kv_attention(
    q: jnp.ndarray,  # [B, T, H, Dh] (post-RoPE)
    kq: jnp.ndarray,  # [B, KV, S, Dh] int8 cache (already updated with this step)
    ks: jnp.ndarray,  # [B, KV, S] f32
    vq: jnp.ndarray,  # [B, KV, S, Dh] int8
    vs: jnp.ndarray,  # [B, KV, S] f32
    lengths: jnp.ndarray,  # [B] int32 — cache length BEFORE this step's tokens
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [B, T, H, Dh] attention output in q.dtype."""
    if interpret is None:
        interpret = default_interpret()
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    group = H // KV
    # [B, T, KV, group, Dh] -> [B, KV, T*group, Dh] with row = t*group + g
    qh = q.reshape(B, T, KV, group, Dh).transpose(0, 2, 1, 3, 4).reshape(B, KV, T * group, Dh)
    out = _attend(
        qh,
        kq,
        ks,
        vq,
        vs,
        lengths,
        group=group,
        t_q=T,
        interpret=interpret,
        out_dtype=q.dtype,
    )
    return out.reshape(B, KV, T, group, Dh).transpose(0, 2, 1, 3, 4).reshape(B, T, H, Dh)


def int8_kv_attention_xla(q, kq, ks, vq, vs, lengths):
    """XLA-fused int8-KV attention: the dequant casts/scales fuse into the
    batched MXU matmuls, so HBM still streams int8 — and at decode shapes
    the single large batched GEMM beats the per-(b,head)-program Pallas grid
    (measured on v5e: ~8.7us vs 32.4us at B=8, 32 heads, S=512). This is the
    default product path; the Pallas kernel above remains for long-S shapes
    and as the fusion-controlled variant.

    Also serves as the test oracle for the kernel.

    Scales are factorized out of the per-element products (the same exact
    rank-1 factorization the kernel uses): the int8 operands hit the dots as
    bare bf16 casts (exact for int8 values) and the [S]-shaped scales touch
    the scores/probs once — 128x fewer multiplies than dequantizing the
    cache elementwise."""
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    group = H // KV
    # bf16 lanes are exact for int8 values; XLA:CPU's dot thunk can't run
    # bf16 x bf16 batched dots, so fall back to f32 lanes off-TPU.
    lane = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    qh = (q.astype(jnp.float32) * (Dh**-0.5)).reshape(B, T, KV, group, Dh)
    scores = jnp.einsum(
        "btkgd,bksd->bkgts",
        qh.astype(lane),
        kq.astype(lane),
        preferred_element_type=jnp.float32,
    )
    scores = scores * ks[:, :, None, None, :]
    s_pos = jnp.arange(kq.shape[2])
    t_pos = lengths[:, None] + jnp.arange(T)[None, :]  # [B, T]
    mask = s_pos[None, None, None, None, :] <= t_pos[:, None, None, :, None]
    scores = jnp.where(mask, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    pv = (probs * vs[:, :, None, None, :]).astype(lane)
    out = jnp.einsum(
        "bkgts,bksd->btkgd",
        pv,
        vq.astype(lane),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, H, Dh).astype(q.dtype)


# Backward-compatible oracle alias
int8_kv_attention_ref = int8_kv_attention_xla
