"""Pallas kernel: dynamic per-row int8 quantization (reference R5).

TPU-native equivalent of the reference's CUDA ``quantize_per_row`` kernel
(SURVEY.md §2.1 R5 — one fused pass: row amax -> scale -> round/clamp/cast).
One VMEM-resident pass per row block: the activation tile is read once from
HBM, reduced and cast on the VPU, and int8 + scales written back — the op is
purely HBM-bandwidth-bound, which is its speed-of-light.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.numerics import QMAX, SCALE_EPS
from ._common import cdiv, default_interpret, pad_dim, pick_block


def _rowquant_kernel(x_ref, xq_ref, sx_ref):
    x = x_ref[:].astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
    s = jnp.maximum(amax / QMAX, SCALE_EPS)
    q = jnp.clip(jnp.round(x / s), -QMAX, QMAX)
    xq_ref[:] = q.astype(jnp.int8)
    sx_ref[:] = s


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def _rowquant_2d(x, *, block_m: int, interpret: bool):
    m, k = x.shape
    mp = cdiv(m, block_m) * block_m
    x = pad_dim(x, 0, mp)
    xq, sx = pl.pallas_call(
        _rowquant_kernel,
        grid=(mp // block_m,),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=[
            pl.BlockSpec((block_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_m, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return xq[:m], sx[:m]


def rowquant(x: jnp.ndarray, *, block_m: int = 256, interpret: bool | None = None):
    """Dynamic per-token quantization: x[..., K] -> (xq int8[..., K], s_x f32[...]).

    Matches `core.numerics.quantize_rowwise` bit-exactly.
    """
    if interpret is None:
        interpret = default_interpret()
    batch_shape = x.shape[:-1]
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    sub = {jnp.dtype(jnp.bfloat16): 16, jnp.dtype(jnp.float32): 8}.get(
        jnp.dtype(x.dtype), 8
    )
    # VMEM budget: the kernel holds the input tile, an f32 working copy (the
    # round/clamp math is f32 for oracle bit-exactness), and the int8 output
    # — ~11 bytes/element live at peak. Cap block_m so a wide-K tile (e.g.
    # the 11008-wide down_proj input) stays under the ~16MB scoped VMEM.
    budget = 12 * 1024 * 1024
    bm_cap = max(sub, (budget // (11 * k)) // sub * sub)
    bm = pick_block(x2.shape[0], min(block_m, bm_cap), sub)
    xq, sx = _rowquant_2d(x2, block_m=bm, interpret=interpret)
    return xq.reshape(*batch_shape, k), sx.reshape(batch_shape)
