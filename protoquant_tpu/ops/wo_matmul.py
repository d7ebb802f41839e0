"""Pallas kernel: weight-only int8 matmul (in-kernel dequant -> bf16 MXU).

TPU-native equivalent of the reference's weight-only mode (SURVEY.md §1.2
mode 2, R8): the int8 weight is streamed from HBM (half the bytes of bf16 —
the decode-regime win), cast to the activation dtype inside VMEM, and fed to
the MXU; the per-output-channel scale factorizes out of the k-sum so it is
applied once in the fp32 epilogue, which is exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import cdiv, default_interpret, pad_dim, pick_block

_DIMS = (((1,), (0,)), ((), ()))


def _wo_kernel(x_ref, wq_ref, sw_ref, bias_ref, out_ref, acc_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 in [-127,127] is exactly representable in bf16; dequant-by-scale
    # happens in the epilogue (exact: s_w is per-n, independent of k).
    w = wq_ref[:].astype(x_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, _DIMS, preferred_element_type=jnp.float32
    )

    @pl.when(k == pl.num_programs(2) - 1)
    def _():
        y = acc_ref[:] * sw_ref[:]
        if bias_ref is not None:
            y = y + bias_ref[:]
        out_ref[:] = y.astype(out_ref.dtype)


def _bias_free(x_ref, wq_ref, sw_ref, out_ref, acc_ref):
    _wo_kernel(x_ref, wq_ref, sw_ref, None, out_ref, acc_ref)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_m", "block_n", "block_k", "interpret"),
)
def _wo_matmul_2d(
    x, wq, s_w, bias, *, out_dtype, block_m, block_n, block_k, interpret
):
    m, k = x.shape
    _, n = wq.shape
    mp, np_, kp = (
        cdiv(m, block_m) * block_m,
        cdiv(n, block_n) * block_n,
        cdiv(k, block_k) * block_k,
    )
    x = pad_dim(pad_dim(x, 0, mp), 1, kp)
    wq = pad_dim(pad_dim(wq, 0, kp), 1, np_)
    s_w = pad_dim(s_w.reshape(1, n), 1, np_, value=1.0)
    has_bias = bias is not None
    if has_bias:
        bias = pad_dim(bias.reshape(1, n).astype(jnp.float32), 1, np_)

    grid = (mp // block_m, np_ // block_n, kp // block_k)
    in_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_k, block_n), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
    ]
    args = [x, wq, s_w]
    kernel = _bias_free
    if has_bias:
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        args.append(bias)
        kernel = _wo_kernel

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * x.dtype.itemsize + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def weight_only_matmul(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    s_w: jnp.ndarray,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
    *,
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y = (x @ dequant(wq, s_w)) + bias with dequant fused into the kernel."""
    if interpret is None:
        interpret = default_interpret()
    out_dtype = out_dtype or x.dtype
    batch_shape = x.shape[:-1]
    k, n = wq.shape
    x2 = x.reshape(-1, k)
    sub = {jnp.dtype(jnp.float32): 8, jnp.dtype(jnp.bfloat16): 16}.get(
        jnp.dtype(x.dtype), 8
    )
    bm = pick_block(x2.shape[0], block_m, sub)
    bn = pick_block(n, block_n, 128)
    bk = pick_block(k, block_k, 128)
    out = _wo_matmul_2d(
        x2,
        wq,
        s_w,
        bias,
        out_dtype=out_dtype,
        block_m=bm,
        block_n=bn,
        block_k=bk,
        interpret=interpret,
    )
    return out.reshape(*batch_shape, n)
