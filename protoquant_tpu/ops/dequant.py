"""Pallas kernel: int8 + scales -> float dequantize (reference R8).

Pure bandwidth op; one VMEM pass. Supports per-output-channel (axis=0 scale
over [K, N] weights, i.e. scale indexed by the last axis) and per-row
(scale indexed by the leading axis) layouts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import cdiv, default_interpret, pad_dim, pick_block


def _dequant_cols_kernel(q_ref, s_ref, out_ref):
    # scale indexed by the last (lane) axis: s is (1, bn)
    out_ref[:] = (q_ref[:].astype(jnp.float32) * s_ref[:]).astype(out_ref.dtype)


def _dequant_rows_kernel(q_ref, s_ref, out_ref):
    # scale indexed by the leading (sublane) axis: s is (bm, 1)
    out_ref[:] = (q_ref[:].astype(jnp.float32) * s_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("scale_on_last", "out_dtype", "block_m", "block_n", "interpret")
)
def _dequant_2d(q, s, *, scale_on_last, out_dtype, block_m, block_n, interpret):
    m, n = q.shape
    mp, np_ = cdiv(m, block_m) * block_m, cdiv(n, block_n) * block_n
    q = pad_dim(pad_dim(q, 0, mp), 1, np_)
    if scale_on_last:
        s = pad_dim(s.reshape(1, n), 1, np_, value=0.0)
        s_spec = pl.BlockSpec((1, block_n), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        kernel = _dequant_cols_kernel
    else:
        s = pad_dim(s.reshape(m, 1), 0, mp, value=0.0)
        s_spec = pl.BlockSpec((block_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        kernel = _dequant_rows_kernel

    out = pl.pallas_call(
        kernel,
        grid=(mp // block_m, np_ // block_n),
        in_specs=[
            pl.BlockSpec((block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        interpret=interpret,
    )(q, s)
    return out[:m, :n]


def dequant(
    q: jnp.ndarray,
    scale: jnp.ndarray,
    axis: int,
    out_dtype=jnp.float32,
    *,
    block_m: int = 512,
    block_n: int = 512,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Dequantize 2D int8 ``q`` whose scale was reduced over ``axis``.

    axis=0 (per-column scales, e.g. [K,N] weight with s[N]) or axis=1
    (per-row scales, e.g. activations with s[M]).
    """
    if interpret is None:
        interpret = default_interpret()
    if q.ndim != 2:
        raise ValueError("dequant kernel expects 2D input")
    m, n = q.shape
    bm = pick_block(m, block_m, 32)
    bn = pick_block(n, block_n, 128)
    return _dequant_2d(
        q,
        scale,
        scale_on_last=(axis == 0),
        out_dtype=out_dtype,
        block_m=bm,
        block_n=bn,
        interpret=interpret,
    )
