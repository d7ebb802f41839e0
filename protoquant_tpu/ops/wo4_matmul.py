"""Pallas kernel: INT4 group-wise weight-only matmul.

Extension beyond the reference's int8 scheme: weights stream from HBM as
packed nibbles (quarter the bytes of bf16), get unpacked and dequantized in
VMEM with per-(K-group, out-channel) scales, and feed the bf16 MXU. The
K-block size equals the quantization group so each grid step touches exactly
one scale row.

Packing layout (core.numerics.pack_int4): within each K-group block of the
*packed* operand, byte row r holds k=r (low nibble) and k=r+g/2 (high
nibble) of that group — unpack is a concat, no sublane interleave.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import cdiv, default_interpret, pad_dim, pick_block

_DIMS = (((1,), (0,)), ((), ()))


def _unpack_block(p):
    """(g/2, bn) packed int8 -> (g, bn) int32 in [-8, 7].

    Mosaic's VPU legalizes neither int8 compares nor int8 shifts, so the
    nibble extraction runs in i32 lanes: sign-extend the byte into i32, then
    arithmetic-shift the wanted nibble into place.
    """
    u = p.astype(jnp.int32)
    low = (u << 28) >> 28
    high = (u << 24) >> 28
    return jnp.concatenate([low, high], axis=0)


def _wo4_kernel(x_ref, wp_ref, sc_ref, bias_ref, out_ref, acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # sc_ref carries ALL group rows (TPU blocks must tile the array); pick
    # this k-step's group dynamically.
    sc = sc_ref[pl.ds(kk, 1), :]  # (1, bn)
    w = _unpack_block(wp_ref[:]).astype(jnp.float32) * sc  # (g, bn)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.float32), w, _DIMS, preferred_element_type=jnp.float32
    )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        y = acc_ref[:]
        if bias_ref is not None:
            y = y + bias_ref[:]
        out_ref[:] = y.astype(out_ref.dtype)


def _wo4_split_kernel(kb, g, x_ref, wp_ref, sc_ref, bias_ref, out_ref,
                      acc_ref):
    """Scale-after-dot formulation (the round-3 break-even redesign).

    The round-2 kernel measured 0.12 of HBM bandwidth at decode — bound not
    by the VPU unpack but by GRID-STEP OVERHEAD: one (group x block_n) step
    per grid point is ~32KB of payload for ~300ns of fixed per-step cost
    (measured, bench/wo4_probe.py). This variant:

      * processes ``kb`` quantization groups per grid step (static unroll)
        over a wide block_n — tens of times more payload per step;
      * keeps the scale OUT of the weight tile: y_n = sum_g sc[g,n] *
        (x_g @ nib_g[:,n]) — the multiply lands on the (bm, bn) partial,
        a g/bm-fold VPU reduction (16x at decode bm=8, g=128);
      * converts raw nibbles (exact 4-bit ints) to bf16 and runs the dots
        on the bf16 MXU at full rate — bf16 x bf16 products are exact in
        the f32 accumulator, so precision is not worse than the legacy
        f32 dequant-then-dot;
      * skips the (g, bn) concat relayout: the pack layout puts low nibbles
        at k < g/2 and high at k >= g/2, so two half-K dots against the x
        block's matching column halves accumulate the same sum.
    """
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.bfloat16)  # (bm, kb*g)
    acc = acc_ref[:]
    for t in range(kb):  # static unroll over the step's groups
        u = wp_ref[pl.ds(t * (g // 2), g // 2), :].astype(jnp.int32)
        low = ((u << 28) >> 28).astype(jnp.bfloat16)
        high = ((u << 24) >> 28).astype(jnp.bfloat16)
        xg = x[:, t * g : (t + 1) * g]
        p = jax.lax.dot_general(
            xg[:, : g // 2], low, _DIMS, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            xg[:, g // 2 :], high, _DIMS, preferred_element_type=jnp.float32
        )
        sc = sc_ref[pl.ds(kk * kb + t, 1), :]  # (1, bn): group's scale row
        acc = acc + p * sc
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        y = acc_ref[:]
        if bias_ref is not None:
            y = y + bias_ref[:]
        out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group", "out_dtype", "block_m", "block_n", "block_groups",
        "interpret", "formulation",
    ),
)
def _wo4_2d(x, packed, scales, bias, *, group, out_dtype, block_m, block_n,
            block_groups, interpret, formulation="split"):
    m, k = x.shape
    n = packed.shape[1]
    g = group
    n_groups = k // g
    split = formulation == "split"
    kb = min(block_groups, n_groups) if split else 1
    while n_groups % kb:
        kb -= 1
    mp, np_ = cdiv(m, block_m) * block_m, cdiv(n, block_n) * block_n
    x = pad_dim(x, 0, mp)
    packed = pad_dim(packed, 1, np_)
    scales = pad_dim(scales, 1, np_, value=1.0)
    has_bias = bias is not None
    if has_bias:
        bias = pad_dim(bias.reshape(1, n).astype(jnp.float32), 1, np_)

    grid = (mp // block_m, np_ // block_n, n_groups // kb)
    in_specs = [
        pl.BlockSpec((block_m, kb * g), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kb * g // 2, block_n), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (n_groups, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM
        ),
    ]
    args = [x, packed, scales]
    if split:
        base = functools.partial(_wo4_split_kernel, kb, g)
    else:
        base = _wo4_kernel
    if has_bias:
        kernel = base
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM)
        )
        args.append(bias)
    else:
        def kernel(x_ref, wp_ref, sc_ref, out_ref, acc_ref, base=base):
            base(x_ref, wp_ref, sc_ref, None, out_ref, acc_ref)

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
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def weight_only_int4_matmul(
    x: jnp.ndarray,
    packed: jnp.ndarray,  # [K/2, N] int8 (pack_int4 layout, per K-group)
    scales: jnp.ndarray,  # [K/group, N] f32
    group: int = 128,
    bias: jnp.ndarray | None = None,
    out_dtype=None,
    *,
    block_m: int = 256,
    block_n: int = 2048,
    block_groups: int = 16,
    interpret: bool | None = None,
    formulation: str = "split",
) -> jnp.ndarray:
    """y = x @ dequant_int4(packed, scales) + bias, unpack+dequant in VMEM.

    ``formulation``: "split" (default — scale-after-dot on the bf16 MXU,
    see _wo4_split_kernel; the decode-perf formulation) or "legacy" (f32
    dequant-then-dot; kept for A/B probes and as the conservative-precision
    reference).

    NOTE the packed operand here must be packed *per K-group* (the QTensor4
    layout stores groups contiguously: group r occupies packed rows
    [r*g/2, (r+1)*g/2), holding that group's k = 0..g/2 low / g/2..g high).
    """
    if interpret is None:
        interpret = default_interpret()
    out_dtype = out_dtype or x.dtype
    batch_shape = x.shape[:-1]
    k = x.shape[-1]
    if k % group:
        raise ValueError(f"K={k} not divisible by group={group}")
    x2 = x.reshape(-1, k)
    sub = {jnp.dtype(jnp.bfloat16): 16}.get(jnp.dtype(x.dtype), 8)
    bm = pick_block(x2.shape[0], block_m, sub)
    bn = pick_block(packed.shape[1], block_n, 128)
    out = _wo4_2d(
        x2, packed, scales, bias,
        group=group, out_dtype=out_dtype, block_m=bm, block_n=bn,
        block_groups=block_groups, interpret=interpret,
        formulation=formulation,
    )
    return out.reshape(*batch_shape, out.shape[-1])
