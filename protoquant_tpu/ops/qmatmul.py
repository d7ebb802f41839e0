"""Pallas kernel: int8 x int8 -> int32 MXU matmul with fused fp32 epilogue.

TPU-native equivalent of the reference's CUTLASS int8 GEMM + fused dequant
epilogue (`fused_dq_addmm`, SURVEY.md §2.1 R6+R7). This kernel is the
bit-exact int32 CONTRACT path; the round-1 claim that XLA's
integer-accumulate dot was unusable was an artifact and is corrected in
SURVEY.md §0.3 / BASELINE.md's formulation probe — the product linears
route through ops.LINEAR_BACKEND="auto" (XLA), while this kernel remains
the exactness oracle and the base for the rowquant-fused variants.

Design:
  grid = (M/bm, N/bn, K/bk), k innermost ("arbitrary" semantics).
  int32 accumulator lives in VMEM scratch across the k loop; on the final k
  step the epilogue applies the rank-1 scale outer product
  ``acc * s_x[m] * s_w[n] + bias[n]`` and writes the output tile once in the
  target dtype — the int32 accumulator never round-trips through HBM, which
  is the whole perf thesis of the fused epilogue.

Also provides `dynamic_qlinear`: rowquant + qmatmul, the full
dynamic-activation linear (the reference's `QLinear.forward` data path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import cdiv, default_interpret, pad_dim, pick_block
from .rowquant import rowquant

_INT8_DIMS = (((1,), (0,)), ((), ()))


def _qmatmul_kernel(xq_ref, wq_ref, sx_ref, sw_ref, bias_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        xq_ref[:], wq_ref[:], _INT8_DIMS, preferred_element_type=jnp.int32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        acc = acc_ref[:].astype(jnp.float32)
        y = acc * sx_ref[:] * sw_ref[:]  # (bm,1) * (1,bn) rank-1 rescale
        if bias_ref is not None:
            y = y + bias_ref[:]
        out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def _qmatmul_2d(
    xq,
    wq,
    s_x,
    s_w,
    bias,
    *,
    out_dtype,
    block_m: int,
    block_n: int,
    block_k: int,
    interpret: bool,
):
    m, k = xq.shape
    _, n = wq.shape
    mp, np_, kp = (
        cdiv(m, block_m) * block_m,
        cdiv(n, block_n) * block_n,
        cdiv(k, block_k) * block_k,
    )
    # Zero-pad: int8 zeros contribute 0 to the accumulator, scale pads are
    # benign (their rows/cols are sliced away).
    xq = pad_dim(pad_dim(xq, 0, mp), 1, kp)
    wq = pad_dim(pad_dim(wq, 0, kp), 1, np_)
    s_x = pad_dim(s_x.reshape(m, 1), 0, mp, value=1.0)
    s_w = pad_dim(s_w.reshape(1, n), 1, np_, value=1.0)
    has_bias = bias is not None
    if has_bias:
        bias = pad_dim(bias.reshape(1, n).astype(jnp.float32), 1, np_)

    grid = (mp // block_m, np_ // block_n, kp // block_k)
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [xq, wq, s_x, s_w]
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = _qmatmul_kernel
    else:
        kernel = functools.partial(_bias_free_kernel, _qmatmul_kernel)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * jnp.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def _bias_free_kernel(base, xq_ref, wq_ref, sx_ref, sw_ref, out_ref, acc_ref):
    base(xq_ref, wq_ref, sx_ref, sw_ref, None, out_ref, acc_ref)


def _pick_blocks(m, n, k, block_m, block_n, block_k):
    # Auto blocks are M-aware. Every k-step DMAs (bm*bk + bk*bn) int8 bytes
    # for 2*bm*bn*bk int-ops; with the v5e's 394 T-ops MXU against 819 GB/s
    # HBM, the step only becomes compute-bound once the square block edge
    # clears ~480 (2*B*bk/819e9 <= 2*B*B*bk/394e12  =>  B >= 481). So
    # prefill/scoring shapes (M >= 512) take 512-edge tiles with a deep k
    # block (~4.5 MB VMEM with double-buffered operands), while decode
    # (tiny M) keeps flat, shallow tiles so the single M-row program still
    # streams the weight at full bandwidth.
    # Chip sweep (bench/block_sweep.py, 2048x4096x4096): 512x1024x1024 and
    # 512x2048x1024 tie for best (+70% over the old 256x256x512); wide N
    # also halves the xq re-stream count at N=11008 vs bn=512.
    if block_m is None:
        block_m = 512 if m >= 512 else 256
    if block_n is None:
        block_n = 1024 if m >= 512 else 256
    if block_k is None:
        block_k = 1024 if m >= 512 else 512
    # int8 tiles want sublane multiples of 32 and lane multiples of 128.
    bm = pick_block(m, block_m, 32)
    bn = pick_block(n, block_n, 128)
    bk = pick_block(k, block_k, 128)
    return bm, bn, bk


def qmatmul(
    xq: jnp.ndarray,
    wq: jnp.ndarray,
    s_x: jnp.ndarray,
    s_w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=jnp.float32,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    block_k: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused int8 GEMM: y = (xq @ wq) * s_x[:,None] * s_w[None,:] + bias.

    xq: int8 [..., M, K] (leading dims flattened), wq: int8 [K, N],
    s_x: f32 [..., M], s_w: f32 [N].
    Integer accumulation is bit-exact vs `core.numerics.int_matmul`.
    """
    if interpret is None:
        interpret = default_interpret()
    batch_shape = xq.shape[:-1]
    k, n = wq.shape
    xq2 = xq.reshape(-1, k)
    sx2 = s_x.reshape(-1)
    bm, bn, bk = _pick_blocks(xq2.shape[0], n, k, block_m, block_n, block_k)
    out = _qmatmul_2d(
        xq2,
        wq,
        sx2,
        s_w,
        bias,
        out_dtype=out_dtype,
        block_m=bm,
        block_n=bn,
        block_k=bk,
        interpret=interpret,
    )
    return out.reshape(*batch_shape, n)


def dynamic_qlinear(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    s_w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
    *,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Full dynamic-activation int8 linear: rowquant(x) -> fused qmatmul.

    The TPU equivalent of the reference's `QLinear.forward` hot path
    (SURVEY.md §3.2): quantize_per_row -> int8 GEMM -> fused dequant+bias.
    """
    out_dtype = out_dtype or x.dtype
    xq, s_x = rowquant(x, interpret=interpret)
    return qmatmul(xq, wq, s_x, s_w, bias, out_dtype=out_dtype, interpret=interpret)
