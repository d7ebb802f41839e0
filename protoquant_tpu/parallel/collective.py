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
