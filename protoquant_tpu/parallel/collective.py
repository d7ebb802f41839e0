"""Collective qmatmul: comm/compute-overlapped matmuls for TP (SURVEY.md
§5.8 mechanism 2; component A4).

The exposed collective in Megatron-style TP is the all-reduce after
row-parallel projections (o_proj / down_proj). This module implements the
canonical TPU "collective matmul" decomposition instead: a ring
reduce-scatter fused with the matmul — the local GEMM is split into
output-column chunks, and each chunk's ppermute hop rides the ICI while the
next chunk multiplies on the MXU (XLA's async collective-permute + the
latency-hiding scheduler do the overlap; enable via
utils.profiling.enable_overlap_flags).

All functions run *inside* shard_map over a mesh axis ``axis`` of size tp.

Ring schedule (tp devices, chunk e terminates at device e):
  the partial for chunk e starts at device (e+1) % tp and hops +1 each step;
  device d at step s holds the partial for chunk e = (d - 1 - s) mod tp and
  adds its local contribution A_d[:, chunk_e] before forwarding. After tp-1
  hops the accumulated chunk d arrives home at device d.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from .. import ops

# Ring-tier selection (SURVEY.md §5.8 mechanism 2's two tiers):
#   "ppermute" — lax.ppermute hops; XLA's async collective-permute +
#                latency-hiding scheduler do the comm/compute overlap.
#   "dma"      — ops/collective_matmul.py: ONE Pallas kernel drives the
#                inter-chip copies with make_async_remote_copy; semaphores
#                pin the schedule explicitly (dynamic-int8, non-SP path).
#   "auto"     — resolves to "ppermute". Decision record: both tiers are
#                integer-exact-matched on the simulated mesh; the explicit-
#                DMA tier's advantage is a *guaranteed* overlap schedule,
#                which can only be measured against XLA's scheduler on real
#                multi-chip ICI — unavailable here (single tunneled chip).
#                Until that profile exists, the XLA tier stays the default:
#                it tiles large shapes through the normal matmul pipeline,
#                while the DMA kernel is whole-operand VMEM (decode-shape
#                scope). Flip with RING_BACKEND="dma" (env PQ_RING_BACKEND).
import os as _os

RING_BACKEND = _os.environ.get("PQ_RING_BACKEND", "auto")


def resolve_ring_backend() -> str:
    return "ppermute" if RING_BACKEND == "auto" else RING_BACKEND


def _ring_perm(tp: int):
    return [(i, (i + 1) % tp) for i in range(tp)]


def collective_matmul_reduce_scatter(
    chunk_matmul: Callable, axis: str, tp: int
):
    """Generic ring reduce-scatter matmul.

    chunk_matmul(c) must return the local partial product for output chunk c
    (shape [..., N/tp]); c is a traced chunk index (dynamic_slice handles it
    with static sizes). Returns this device's fully-reduced chunk
    (== psum(full_local_product)[..., my_chunk]).
    """
    d = jax.lax.axis_index(axis)
    acc = chunk_matmul((d - 1) % tp)
    for s in range(1, tp):
        acc = jax.lax.ppermute(acc, axis, _ring_perm(tp))
        acc = acc + chunk_matmul((d - 1 - s) % tp)
    return acc


def qmatmul_reduce_scatter(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    s_w: jnp.ndarray,
    axis: str,
    tp: int,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """Row-parallel dynamic-int8 linear with fused ring reduce-scatter.

    x: local [..., K/tp]; wq: local int8 [K/tp, N]; s_w: f32 [N].
    Returns the local output chunk [..., N/tp] (sequence-parallel layout);
    equals psum(dynamic_qlinear(x, wq, s_w))[..., my_chunk] up to int8
    rounding (activations are quantized once, against the local K rows).
    """
    n = wq.shape[1]
    nc = n // tp
    xq, s_x = ops.rowquant(x, interpret=interpret)

    def chunk(c):
        wq_c = jax.lax.dynamic_slice_in_dim(wq, c * nc, nc, axis=1)
        sw_c = jax.lax.dynamic_slice_in_dim(s_w, c * nc, nc, axis=0)
        return ops.qmatmul(
            xq, wq_c, s_x, sw_c, out_dtype=jnp.float32, interpret=interpret
        )

    out = collective_matmul_reduce_scatter(chunk, axis, tp)
    return out.astype(out_dtype)


def dynamic_qlinear_collective(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    s_w: jnp.ndarray,
    axis: str,
    tp: int,
    *,
    scatter_tokens: bool = False,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
):
    """Product-path row-parallel dynamic-int8 linear with an overlapped ring
    reduction (wired into QLinear via ``collective=True`` — VERDICT round-1
    item 3 / SURVEY.md §5.8 mechanism 2).

    x: local [B, T, K/tp]; wq: int8 [K/tp, N]; s_w: f32 [N].
    * scatter_tokens=False: ring reduce-scatter over output-feature chunks
      + all_gather => the overlapped equivalent of psum(local_matmul).
      Returns [B, T, N].
    * scatter_tokens=True (SP): ring reduce-scatter over TOKEN chunks so the
      output lands directly in the token-sharded layout of the surrounding
      norm region. Returns [B, T/tp, N]. Requires T % tp == 0.

    Each ring step's ppermute hop rides ICI while the next chunk's matmul
    runs on the MXU (async collective-permute + latency-hiding scheduler) —
    or, under RING_BACKEND="dma", a single Pallas kernel schedules the hops
    itself with explicit remote DMAs (ops/collective_matmul.py).
    """
    from .. import ops

    if resolve_ring_backend() == "dma" and not scatter_tokens:
        from ..core import numerics
        from ..ops.collective_matmul import qmatmul_reduce_scatter_dma

        B, T, _ = x.shape
        if ops.resolve_linear_backend() == "xla":
            xq, s_x = numerics.quantize_rowwise(x)
        else:
            xq, s_x = ops.rowquant(x, interpret=interpret)
        part = qmatmul_reduce_scatter_dma(
            xq.reshape(B * T, -1), s_x.reshape(B * T), wq, s_w,
            axis=axis, tp=tp, interpret=interpret,
        ).reshape(B, T, -1)
        out = jax.lax.all_gather(part, axis, axis=part.ndim - 1, tiled=True)
        return out.astype(out_dtype)

    if ops.resolve_linear_backend() == "xla":
        from ..core import numerics

        xq, s_x = numerics.quantize_rowwise(x)

        def mm(xq_c, sx_c, wq_c, sw_c):
            acc = jnp.matmul(
                xq_c.astype(jnp.bfloat16),
                wq_c.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return acc * sx_c[..., None] * sw_c[None, :]

    else:
        xq, s_x = ops.rowquant(x, interpret=interpret)

        def mm(xq_c, sx_c, wq_c, sw_c):
            return ops.qmatmul(
                xq_c, wq_c, sx_c, sw_c, out_dtype=jnp.float32, interpret=interpret
            )

    if scatter_tokens:
        t = x.shape[1]
        tc = t // tp

        def chunk(c):
            xq_c = jax.lax.dynamic_slice_in_dim(xq, c * tc, tc, axis=1)
            sx_c = jax.lax.dynamic_slice_in_dim(s_x, c * tc, tc, axis=1)
            return mm(xq_c, sx_c, wq, s_w)

        out = collective_matmul_reduce_scatter(chunk, axis, tp)
    else:
        n = wq.shape[1]
        nc = n // tp

        def chunk(c):
            wq_c = jax.lax.dynamic_slice_in_dim(wq, c * nc, nc, axis=1)
            sw_c = jax.lax.dynamic_slice_in_dim(s_w, c * nc, nc, axis=0)
            return mm(xq, s_x, wq_c, sw_c)

        part = collective_matmul_reduce_scatter(chunk, axis, tp)
        out = jax.lax.all_gather(part, axis, axis=part.ndim - 1, tiled=True)
    return out.astype(out_dtype)


def weight_only_qlinear_collective(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    s_w: jnp.ndarray,
    axis: str,
    tp: int,
    *,
    scatter_tokens: bool = False,
    out_dtype=jnp.float32,
    interpret: bool | None = None,
):
    """Row-parallel weight-only-int8 linear with the same overlapped ring
    reduction as :func:`dynamic_qlinear_collective`."""
    from .. import ops

    if ops.resolve_linear_backend() == "xla":

        def mm(x_c, wq_c, sw_c):
            acc = jnp.matmul(
                x_c.astype(jnp.bfloat16),
                wq_c.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return acc * sw_c[None, :]

    else:

        def mm(x_c, wq_c, sw_c):
            return ops.weight_only_matmul(
                x_c, wq_c, sw_c, out_dtype=jnp.float32, interpret=interpret
            )

    if scatter_tokens:
        t = x.shape[1]
        tc = t // tp

        def chunk(c):
            x_c = jax.lax.dynamic_slice_in_dim(x, c * tc, tc, axis=1)
            return mm(x_c, wq, s_w)

        out = collective_matmul_reduce_scatter(chunk, axis, tp)
    else:
        n = wq.shape[1]
        nc = n // tp

        def chunk(c):
            wq_c = jax.lax.dynamic_slice_in_dim(wq, c * nc, nc, axis=1)
            sw_c = jax.lax.dynamic_slice_in_dim(s_w, c * nc, nc, axis=0)
            return mm(x, wq_c, sw_c)

        part = collective_matmul_reduce_scatter(chunk, axis, tp)
        out = jax.lax.all_gather(part, axis, axis=part.ndim - 1, tiled=True)
    return out.astype(out_dtype)


def qmatmul_allreduce_overlapped(
    x: jnp.ndarray,
    wq: jnp.ndarray,
    s_w: jnp.ndarray,
    axis: str,
    tp: int,
    out_dtype=jnp.bfloat16,
    interpret: bool | None = None,
):
    """Reduce-scatter matmul + all_gather == overlapped all-reduce matmul.

    Drop-in for the psum path of a row-parallel projection when the full
    output is needed on every shard.
    """
    chunk = qmatmul_reduce_scatter(
        x, wq, s_w, axis, tp, out_dtype=jnp.float32, interpret=interpret
    )
    full = jax.lax.all_gather(chunk, axis, axis=chunk.ndim - 1, tiled=True)
    # all_gather concatenates in device order; chunk c lives on device c, so
    # tiled concat reconstructs the natural column order.
    return full.astype(out_dtype)
