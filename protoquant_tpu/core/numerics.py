"""Pure-jnp reference implementation of the protoquant numerics contract.

This module is the *behavioral contract* of the whole framework: every Pallas
kernel in ``protoquant_tpu.ops`` must match these functions bit-exactly on the
integer path and to float tolerance on the epilogue.

Scheme (reference: facebookexperimental/protoquant — source unavailable in this
environment; contract reconstructed in SURVEY.md §1.2 and pinned against the
``torch._int_mm`` CPU oracle in tests/test_numerics.py):

  * Weight: per-output-channel symmetric INT8, static.
      s_w[n]  = max_k |W[k, n]| / 127
      Wq[k,n] = clamp(round(W[k,n] / s_w[n]), -127, 127)   (int8, zero-point 0)
  * Activation: per-token (per-row) symmetric INT8, dynamic.
      s_x[m]  = max_k |x[m, k]| / 127
      xq[m,k] = clamp(round(x[m,k] / s_x[m]), -127, 127)
  * GEMM + fused epilogue:
      acc[m,n] = sum_k xq[m,k] * Wq[k,n]          (int32 accumulation)
      y[m,n]   = acc[m,n] * s_x[m] * s_w[n] + b[n]

Rounding is round-half-to-even (numpy/jnp.round semantics — matches
torch.round, verified by the oracle test). Clamp range is symmetric
[-127, 127]. Zero rows are guarded with a tiny epsilon so scales never hit 0.
"""

from __future__ import annotations

import jax.numpy as jnp

# int8 symmetric range: [-127, 127] so that negation is closed and the scheme
# has no zero-points anywhere.
QMAX = 127
# Scale floor: guards all-zero rows/channels (amax == 0) from producing
# inf/NaN in x / s. Any value quantizes to 0 under this scale, which is the
# correct result for an all-zero row.
SCALE_EPS = 1e-12


def compute_scale(x: jnp.ndarray, axis, qmax: int = QMAX) -> jnp.ndarray:
    """absmax / qmax along ``axis`` (reduced away), floored at SCALE_EPS."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis, keepdims=False)
    return jnp.maximum(amax / qmax, SCALE_EPS)


def quantize(x: jnp.ndarray, scale: jnp.ndarray, axis, qmax: int = QMAX) -> jnp.ndarray:
    """Symmetric int8 quantization of ``x`` with precomputed ``scale``.

    ``scale`` has the shape of ``x`` reduced over ``axis``; it is re-expanded
    here for broadcasting.
    """
    s = jnp.expand_dims(scale, axis)
    q = jnp.round(x.astype(jnp.float32) / s)
    return jnp.clip(q, -qmax, qmax).astype(jnp.int8)


def quantize_rowwise(x: jnp.ndarray, qmax: int = QMAX):
    """Dynamic per-row (per-token) quantization: returns (xq int8, s_x f32).

    Rows are the leading dims; reduction is over the last (feature) axis.
    s_x has shape x.shape[:-1].
    """
    scale = compute_scale(x, axis=-1, qmax=qmax)
    return quantize(x, scale, axis=-1, qmax=qmax), scale


def quantize_channelwise(w: jnp.ndarray, axis: int = 0, qmax: int = QMAX):
    """Static per-channel weight quantization: returns (wq int8, s_w f32).

    For a [K, N] weight with per-output-channel scales, ``axis=0`` (reduce K),
    giving s_w of shape [N].
    """
    scale = compute_scale(w, axis=axis, qmax=qmax)
    return quantize(w, scale, axis=axis, qmax=qmax), scale


def dequantize(q: jnp.ndarray, scale: jnp.ndarray, axis) -> jnp.ndarray:
    """int8 + scale -> f32."""
    return q.astype(jnp.float32) * jnp.expand_dims(scale, axis)


def int_matmul(xq: jnp.ndarray, wq: jnp.ndarray) -> jnp.ndarray:
    """Exact int8 x int8 -> int32 matmul (reference; bit-exact vs _int_mm).

    Computed via int32 upcast so it is exact on every backend (XLA:TPU's
    native integer dot lowering is unusable — see SURVEY.md §0.3; the product
    path uses the Pallas kernel in ops/qmatmul.py instead).
    """
    return jnp.matmul(xq.astype(jnp.int32), wq.astype(jnp.int32))


def qmatmul_ref(
    xq: jnp.ndarray,
    wq: jnp.ndarray,
    s_x: jnp.ndarray,
    s_w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=jnp.float32,
) -> jnp.ndarray:
    """Integer GEMM + fused fp32 epilogue (the `fused_dq_addmm` contract).

    y[m, n] = (sum_k xq[m,k] wq[k,n]) * s_x[m] * s_w[n] + b[n]
    """
    acc = int_matmul(xq, wq).astype(jnp.float32)
    y = acc * s_x[..., :, None] * s_w[None, :]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def dynamic_qlinear_ref(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    s_w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Full dynamic-activation path: rowquant(x) -> int GEMM -> epilogue."""
    out_dtype = out_dtype or x.dtype
    xq, s_x = quantize_rowwise(x)
    return qmatmul_ref(xq, wq, s_x, s_w, bias, out_dtype=out_dtype)


# ---------------------------------------------------------------------------
# INT4 (group-wise, weight-only) — an extension beyond the reference's int8
# scheme: symmetric 4-bit weights with per-(K-group, out-channel) scales.
# ---------------------------------------------------------------------------

QMAX4 = 7


def quantize_groupwise_int4(w: jnp.ndarray, group: int = 128, clip: str = "mse"):
    """[K, N] -> (q int8 in [-7, 7], scales f32 [K/group, N]).

    K must divide by ``group``. Symmetric, zero-point-free like the int8
    scheme; scales are per contraction-group per output channel.

    ``clip``: "amax" uses the group max (never clips — but 4-bit steps are
    wide, rel-rmse ~0.118 on Gaussian groups at g=128); "mse" (default)
    searches per-group scale candidates r*amax, r in [0.5, 1], and keeps the
    reconstruction-MSE minimizer — trading a little clipping for ~25%
    narrower steps (rel-rmse ~0.089 measured; pure conversion-time cost,
    the runtime layout is identical).
    """
    k, n = w.shape
    if k % group:
        raise ValueError(f"K={k} not divisible by group={group}")
    wg = w.astype(jnp.float32).reshape(k // group, group, n)
    amax = jnp.max(jnp.abs(wg), axis=1)  # [G, N]
    if clip == "mse":
        ratios = [0.5 + 0.025 * i for i in range(21)]  # python floats: the
        # loop unrolls under jit (conversion runs once; 21 passes are cheap)
        best_scale = jnp.maximum(amax / QMAX4, SCALE_EPS)
        best_err = None
        for r in ratios:
            s = jnp.maximum(amax * (r / QMAX4), SCALE_EPS)
            qc = jnp.clip(jnp.round(wg / s[:, None, :]), -QMAX4, QMAX4)
            err = jnp.sum((qc * s[:, None, :] - wg) ** 2, axis=1)  # [G, N]
            if best_err is None:
                best_err, best_scale = err, s
            else:
                take = err < best_err
                best_err = jnp.where(take, err, best_err)
                best_scale = jnp.where(take, s, best_scale)
        scale = best_scale
    elif clip == "amax":
        scale = jnp.maximum(amax / QMAX4, SCALE_EPS)
    else:
        raise ValueError(f"unknown int4 clip mode {clip!r}")
    q = jnp.clip(jnp.round(wg / scale[:, None, :]), -QMAX4, QMAX4)
    return q.reshape(k, n).astype(jnp.int8), scale


def pack_int4(q: jnp.ndarray, group: int | None = None) -> jnp.ndarray:
    """Pack int4 values ([-7,7] stored as int8) two-per-byte along K.

    Packing is *group-local*: within each K-group of size ``group`` (default:
    all of K), packed row r holds k=r in the low nibble and k=r+group/2 in
    the high nibble. Groups stay contiguous, so a kernel reading one group's
    packed block [r*g/2, (r+1)*g/2) unpacks it with a concat — no sublane
    interleave, and the block's single scale row applies to all of it.
    """
    k, n = q.shape
    g = group or k
    if k % g or g % 2:
        raise ValueError(f"K={k} must divide into even groups of {g}")
    qg = q.reshape(k // g, g, n)
    low = qg[:, : g // 2].astype(jnp.uint8) & 0xF
    high = (qg[:, g // 2 :].astype(jnp.uint8) & 0xF) << 4
    return (low | high).astype(jnp.int8).reshape(k // 2, n)


def unpack_int4(packed: jnp.ndarray, group: int | None = None) -> jnp.ndarray:
    """Inverse of pack_int4: [K/2, N] int8 -> [K, N] int8 in [-8, 7]."""
    k2, n = packed.shape
    g = group or 2 * k2
    u = packed.astype(jnp.uint8).reshape(2 * k2 // g, g // 2, n)
    low = (u & 0xF).astype(jnp.int8)
    low = jnp.where(low >= 8, low - 16, low)
    high = (u >> 4).astype(jnp.int8)
    high = jnp.where(high >= 8, high - 16, high)
    return jnp.concatenate([low, high], axis=1).reshape(2 * k2, n)


def weight_only_int4_linear_ref(x, packed, scales, group, bias=None, out_dtype=None):
    """Reference int4 weight-only linear (dequant then fp matmul)."""
    out_dtype = out_dtype or x.dtype
    q = unpack_int4(packed, group)  # [K, N]
    k, n = q.shape
    w = (
        q.astype(jnp.float32).reshape(k // group, group, n)
        * scales[:, None, :]
    ).reshape(k, n)
    y = jnp.matmul(x.astype(jnp.float32), w)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def dynamic_int4_linear_ref(x, packed, scales, group, bias=None,
                            out_dtype=None):
    """Reference W4A8 linear: dynamic per-row int8 activations x group-wise
    int4 weights, integer dots per group, f32 scale-after-dot —
    y[m, n] = s_x[m] * sum_g s_w[g, n] * (xq[m, g] . q4[g, n]) + bias.
    The ops/w4a8_matmul.py Pallas kernel implements exactly this contract
    (int8 x int4 products are exact in int32; only the f32 group
    accumulation rounds)."""
    out_dtype = out_dtype or x.dtype
    xq, s_x = quantize_rowwise(x)
    q = unpack_int4(packed, group)  # [K, N] int in [-8, 7]
    k, n = q.shape
    m = xq.reshape(-1, k).shape[0]
    acc = jnp.einsum(
        "mgk,gkn->mgn",
        xq.reshape(-1, k).astype(jnp.int32).reshape(m, k // group, group),
        q.astype(jnp.int32).reshape(k // group, group, n),
    )  # [M, G, N] int32, exact
    y = jnp.sum(acc.astype(jnp.float32) * scales[None, :, :], axis=1)
    y = y * s_x.reshape(-1)[:, None]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.reshape(*x.shape[:-1], n).astype(out_dtype)


def weight_only_linear_ref(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    s_w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Weight-only path: dequantize W to x.dtype, matmul in float."""
    out_dtype = out_dtype or x.dtype
    w = dequantize(wq, s_w, axis=0).astype(x.dtype)
    y = jnp.matmul(x, w)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y.astype(out_dtype)
