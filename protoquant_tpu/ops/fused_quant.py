"""Pallas kernels: producer ops fused with dynamic int8 row quantization.

Prefill (M >= ~64) is compute-bound on the int8 GEMMs, but the rowquant
between producer and GEMM cannot overlap the MXU — XLA runs it as separate
VPU fusions that re-read the producer's output from HBM (norm: read+write;
quant: amax pass + rescale pass = 3 more activation-sized transfers). At
M=512/7B geometry that is ~80us/layer of pure HBM traffic
(bench/prefill_overhead_probe.py). These kernels emit int8 + scales
straight out of the producer in ONE HBM read:

  rms_norm_quant(x, w, eps)    — RMSNorm -> bf16 round-trip -> rowquant
  swiglu_quant(gate, up, act)  — act(gate) * up -> rowquant  (SwiGLU/GeGLU)

Exactness: the quantization math (amax/scale/round/clamp) is the
core/numerics.py contract verbatim, and the module path's intermediate
bf16 cast is reproduced. Float reductions (RMS mean) may associate
differently than the unfused composition, so int8 codes can flip by +-1 on
exact rounding boundaries (measured <0.1% of elements); the int8 GEMM
consuming the codes remains oracle-exact for whatever codes it is given.
(Reference R5 + SURVEY §8.3.3 'fuse rowquant into the producer'.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.numerics import QMAX, SCALE_EPS
from ._common import cdiv, default_interpret, pad_dim, pick_block


def _quantize_rows(y):
    """f32 rows -> (int8, f32 scale[:, None]); numerics-contract math."""
    amax = jnp.max(jnp.abs(y), axis=1, keepdims=True)
    s = jnp.maximum(amax / QMAX, SCALE_EPS)
    q = jnp.clip(jnp.round(y / s), -QMAX, QMAX)
    return q.astype(jnp.int8), s


def _rms_norm_quant_kernel(x_ref, w_ref, xq_ref, sx_ref, *, eps, cast_dtype):
    x = x_ref[:].astype(jnp.float32)
    var = jnp.mean(x * x, axis=1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps) * w_ref[:].astype(jnp.float32)
    # The module path materializes the normed activation in the model dtype
    # before quantizing; reproduce that rounding for bit-exactness.
    y = y.astype(cast_dtype).astype(jnp.float32)
    q, s = _quantize_rows(y)
    xq_ref[:] = q
    sx_ref[:] = s


def _swiglu_quant_kernel(g_ref, u_ref, xq_ref, sx_ref, *, act, cast_dtype):
    g = g_ref[:].astype(jnp.float32)
    if act == "silu":
        a = jax.nn.silu(g)
    else:  # gelu, tanh approximation (Gemma)
        a = jax.nn.gelu(g, approximate=True)
    # Module path: act(g_f32).astype(dtype) * up  — a *dtype-precision*
    # product — then rowquant casts back to f32.
    h = (a.astype(cast_dtype) * u_ref[:].astype(cast_dtype)).astype(jnp.float32)
    q, s = _quantize_rows(h)
    xq_ref[:] = q
    sx_ref[:] = s


def _row_block(m: int, k: int, dtype, n_inputs: int) -> int:
    sub = {jnp.dtype(jnp.bfloat16): 16, jnp.dtype(jnp.float32): 8}.get(
        jnp.dtype(dtype), 8
    )
    # Live bytes/element: n_inputs input tiles + f32 working copy + int8 out.
    budget = 12 * 1024 * 1024
    per_elem = 2 * n_inputs + 8 + 1
    bm_cap = max(sub, (budget // (per_elem * k)) // sub * sub)
    return pick_block(m, min(256, bm_cap), sub)


@functools.partial(jax.jit, static_argnames=("eps", "interpret", "cast_dtype"))
def _rms_norm_quant_2d(x, w, *, eps, interpret, cast_dtype):
    m, k = x.shape
    bm = _row_block(m, k, x.dtype, n_inputs=1)
    mp = cdiv(m, bm) * bm
    x = pad_dim(x, 0, mp)
    kernel = functools.partial(
        _rms_norm_quant_kernel, eps=eps, cast_dtype=cast_dtype)
    xq, sx = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, w.reshape(1, k))
    return xq[:m], sx[:m]


def rms_norm_quant(x, w, *, eps: float, interpret: bool | None = None,
                   cast_dtype=jnp.bfloat16):
    """RMSNorm fused with per-token int8 quantization.

    x: [..., K] activations; w: [K] f32 effective norm weight (callers fold
    Gemma's (1 + w) offset in). Returns (xq int8[..., K], s_x f32[...]);
    bit-exact to ``quantize_rowwise(RMSNorm(x).astype(cast_dtype))``.
    """
    if interpret is None:
        interpret = default_interpret()
    batch_shape = x.shape[:-1]
    k = x.shape[-1]
    xq, sx = _rms_norm_quant_2d(
        x.reshape(-1, k), w.astype(jnp.float32), eps=eps, interpret=interpret,
        cast_dtype=cast_dtype,
    )
    return xq.reshape(*batch_shape, k), sx.reshape(batch_shape)


@functools.partial(jax.jit, static_argnames=("act", "interpret", "cast_dtype"))
def _swiglu_quant_2d(g, u, *, act, interpret, cast_dtype):
    m, k = g.shape
    bm = _row_block(m, k, g.dtype, n_inputs=2)
    mp = cdiv(m, bm) * bm
    g = pad_dim(g, 0, mp)
    u = pad_dim(u, 0, mp)
    kernel = functools.partial(
        _swiglu_quant_kernel, act=act, cast_dtype=cast_dtype)
    xq, sx = pl.pallas_call(
        kernel,
        grid=(mp // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, k), jnp.int8),
            jax.ShapeDtypeStruct((mp, 1), jnp.float32),
        ],
        interpret=interpret,
    )(g, u)
    return xq[:m], sx[:m]


def swiglu_quant(gate, up, *, act: str = "silu", interpret: bool | None = None,
                 cast_dtype=jnp.bfloat16):
    """act(gate) * up fused with per-token int8 quantization.

    gate/up: [..., I]. Returns (hq int8[..., I], s_h f32[...]); matches
    ``quantize_rowwise(act(gate_f32).astype(cast_dtype) * up)`` up to 1 bf16
    ulp in the gate transcendental (codes flip at most +-1).
    """
    if interpret is None:
        interpret = default_interpret()
    batch_shape = gate.shape[:-1]
    k = gate.shape[-1]
    xq, sx = _swiglu_quant_2d(
        gate.reshape(-1, k), up.reshape(-1, k), act=act, interpret=interpret,
        cast_dtype=cast_dtype,
    )
    return xq.reshape(*batch_shape, k), sx.reshape(batch_shape)
