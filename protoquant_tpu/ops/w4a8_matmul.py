"""Pallas kernel: W4A8 — int4 group-wise weights x dynamic int8 activations
on the INT8 MXU.

The missing corner of the mode matrix: ``weight_only_int4`` streams quarter
bytes but runs the bf16 MXU (half the int8 rate), while ``dynamic`` runs the
int8 MXU but streams int8 weights. W4A8 takes both: packed-nibble weights
(quarter bytes — the decode bandwidth win) unpack in VMEM to exact int8
values and feed int8 x int8 -> int32 dots (the 2x MXU rate — the prefill
compute win).

Formulation follows ops/wo4_matmul.py's split kernel (the round-3
break-even redesign): kb quantization groups per grid step, scale AFTER the
dot — y[m, n] = s_x[m] * sum_g s_w[g, n] * (xq[m, g] . nib[g, n]) — and the
pack layout's low/high nibble halves get separate dots against the matching
x column halves (no (g, bn) concat relayout). The group dots accumulate in
int32 on the MXU; the per-group scale lands on the (bm, bn) f32 partial;
the rank-1 s_x rescale + bias ride the fused epilogue.

Numerics: int8 x int4 products are exact in int32; the only rounding is the
f32 scale/accumulate across groups — the same contract as the pure-jnp
reference (core.numerics.dynamic_int4_linear_ref), tested bit-close.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import cdiv, default_interpret, pad_dim, pick_block

_DIMS = (((1,), (0,)), ((), ()))


def _w4a8_kernel(kb, g, xq_ref, wp_ref, sc_ref, sx_ref, bias_ref, out_ref,
                 acc_ref):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xq = xq_ref[:]  # (bm, kb*g) int8
    acc = acc_ref[:]
    for t in range(kb):  # static unroll over the step's groups
        u = wp_ref[pl.ds(t * (g // 2), g // 2), :].astype(jnp.int32)
        low = ((u << 28) >> 28).astype(jnp.int8)
        high = ((u << 24) >> 28).astype(jnp.int8)
        xg = xq[:, t * g : (t + 1) * g]
        p = jax.lax.dot_general(
            xg[:, : g // 2], low, _DIMS, preferred_element_type=jnp.int32
        ) + jax.lax.dot_general(
            xg[:, g // 2 :], high, _DIMS, preferred_element_type=jnp.int32
        )
        sc = sc_ref[pl.ds(kk * kb + t, 1), :]  # (1, bn): group's scale row
        acc = acc + p.astype(jnp.float32) * sc
    acc_ref[:] = acc

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        y = acc_ref[:] * sx_ref[:]  # (bm, 1) rank-1 activation rescale
        if bias_ref is not None:
            y = y + bias_ref[:]
        out_ref[:] = y.astype(out_ref.dtype)


def _w4a8_2l_kernel(kb, g, chunks, xq_ref, wp_ref, r16_ref, scol_ref, sx_ref,
                    bias_ref, out_ref, acc_ref, w8_ref):
    """Two-level-scale formulation (ROADMAP 8 / VERDICT r3 item 4): requant
    the nibbles to int8 in VMEM — w8 = round(nib * 16 * s_g/s_col), one
    f32 multiply+round per loaded weight — then ONE big-K int8 dot per
    (bm, bn) grid step (K = kb*g, e.g. 2048) instead of 2*kb K=64 sub-dots.
    The group scale moves INTO the int8 weight (4 fractional bits of
    headroom: |nib| <= 8, ratio <= 1 -> |w8| <= 128), so the MXU pipeline
    sees one deep dot and the epilogue is rank-1 x rank-1
    (s_x[m] * s_col[n] / 16). Accumulation is exact int32 across grid
    steps; the only extra rounding vs the group formulation is the requant
    (<= 1/32 of an int4 LSB for the max-scale group, 1/(32 r) for ratio r —
    measured on the quality ladder).

    ``chunks`` > 1 splits the step's kb groups into that many
    requant-then-dot pieces: dot(chunk c) has no dependency on the requant
    of chunk c+1, so Mosaic's scheduler can run the VPU requant pass of the
    next chunk UNDER the MXU dot of the current one (the requant is ~5 VPU
    ops/weight — comparable to the dot time at these shapes — so hiding it
    is worth up to ~30%; measured A/B in bench/w4a8_sweep.py). int32
    accumulation is exact in any chunk order: numerics are identical."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    tc = kb // chunks  # groups per chunk (kb % chunks enforced == 0)
    for c in range(chunks):
        for t in range(c * tc, (c + 1) * tc):  # requant chunk c's groups
            u = wp_ref[pl.ds(t * (g // 2), g // 2), :].astype(jnp.int32)
            low = ((u << 28) >> 28).astype(jnp.float32)
            high = ((u << 24) >> 28).astype(jnp.float32)
            r = r16_ref[pl.ds(kk * kb + t, 1), :]  # (1, bn): 16*s_g/s_col
            w8_ref[pl.ds(t * g, g // 2), :] = jnp.round(
                low * r
            ).astype(jnp.int8)
            w8_ref[pl.ds(t * g + g // 2, g // 2), :] = jnp.round(
                high * r
            ).astype(jnp.int8)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            xq_ref[:, pl.ds(c * tc * g, tc * g)],
            w8_ref[pl.ds(c * tc * g, tc * g), :],
            _DIMS,
            preferred_element_type=jnp.int32,
        )

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        y = (
            acc_ref[:].astype(jnp.float32)
            * (sx_ref[:] * (1.0 / 16.0))
            * scol_ref[:]
        )
        if bias_ref is not None:
            y = y + bias_ref[:]
        out_ref[:] = y.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group", "out_dtype", "block_m", "block_n", "block_groups",
        "dot_chunks", "interpret",
    ),
)
def _w4a8_2l_2d(xq, s_x, packed, scales, bias, *, group, out_dtype, block_m,
                block_n, block_groups, dot_chunks, interpret):
    m, k = xq.shape
    n = packed.shape[1]
    g = group
    n_groups = k // g
    kb = min(block_groups, n_groups)
    while n_groups % kb:
        kb -= 1
    chunks = kb if dot_chunks <= 0 else max(1, min(dot_chunks, kb))
    while kb % chunks:
        chunks -= 1
    mp, np_ = cdiv(m, block_m) * block_m, cdiv(n, block_n) * block_n
    xq = pad_dim(xq, 0, mp)
    s_x = pad_dim(s_x.reshape(m, 1), 0, mp, value=1.0)
    packed = pad_dim(packed, 1, np_)
    scales = pad_dim(scales, 1, np_, value=1.0)
    # Two-level decomposition: column scale = the column's max group scale
    # (ratio <= 1 keeps the requantized nibbles inside int8).
    scol = jnp.max(scales, axis=0, keepdims=True)  # (1, N)
    r16 = scales * jnp.where(scol > 0, 16.0 / scol, 0.0)
    has_bias = bias is not None
    if has_bias:
        bias = pad_dim(bias.reshape(1, n).astype(jnp.float32), 1, np_)

    grid = (mp // block_m, np_ // block_n, n_groups // kb)
    in_specs = [
        pl.BlockSpec((block_m, kb * g), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kb * g // 2, block_n), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xq, packed, r16, scol, s_x]
    base = functools.partial(_w4a8_2l_kernel, kb, g, chunks)
    if has_bias:
        kernel = base
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)
    else:
        def kernel(xq_ref, wp_ref, r16_ref, scol_ref, sx_ref, out_ref,
                   acc_ref, w8_ref, base=base):
            base(xq_ref, wp_ref, r16_ref, scol_ref, sx_ref, None, out_ref,
                 acc_ref, w8_ref)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, kk: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((block_m, block_n), jnp.int32),
            pltpu.VMEM((kb * g, block_n), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k + k * np_ // 2 + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n]


@functools.partial(
    jax.jit,
    static_argnames=(
        "group", "out_dtype", "block_m", "block_n", "block_groups",
        "interpret",
    ),
)
def _w4a8_2d(xq, s_x, packed, scales, bias, *, group, out_dtype, block_m,
             block_n, block_groups, interpret):
    m, k = xq.shape
    n = packed.shape[1]
    g = group
    n_groups = k // g
    kb = min(block_groups, n_groups)
    while n_groups % kb:
        kb -= 1
    mp, np_ = cdiv(m, block_m) * block_m, cdiv(n, block_n) * block_n
    xq = pad_dim(xq, 0, mp)
    s_x = pad_dim(s_x.reshape(m, 1), 0, mp, value=1.0)
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
        pl.BlockSpec((n_groups, block_n), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_m, 1), lambda i, j, kk: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [xq, packed, scales, s_x]
    base = functools.partial(_w4a8_kernel, kb, g)
    if has_bias:
        kernel = base
        in_specs.append(
            pl.BlockSpec((1, block_n), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)
    else:
        def kernel(xq_ref, wp_ref, sc_ref, sx_ref, out_ref, acc_ref,
                   base=base):
            base(xq_ref, wp_ref, sc_ref, sx_ref, None, out_ref, acc_ref)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, kk: (i, j),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k + k * np_ // 2 + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return out[:m, :n]


def w4a8_matmul(
    xq: jnp.ndarray,  # [.., K] int8 (rowquant output)
    s_x: jnp.ndarray,  # [..] f32 per-row scales
    packed: jnp.ndarray,  # [K/2, N] int8 (pack_int4 per-group layout)
    scales: jnp.ndarray,  # [K/group, N] f32
    group: int = 128,
    bias: jnp.ndarray | None = None,
    out_dtype=jnp.bfloat16,
    *,
    block_m: int | None = None,
    block_n: int | None = None,
    block_groups: int | None = None,
    formulation: str = "group",
    dot_chunks: int | None = None,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """y = (s_x * xq) @ dequant_int4(packed, scales) + bias, int8 MXU dots
    with in-VMEM nibble unpack.

    ``formulation``: "group" scales AFTER each group's K=64 sub-dots (exact
    int4 semantics, but the short dots underfill the MXU pipeline);
    "two_level" requants the nibbles to int8 against the column's max group
    scale and runs ONE big-K dot per block (full MXU depth; adds <= 1/(32 r)
    of an int4 LSB of weight rounding for a group at scale-ratio r)."""
    if interpret is None:
        interpret = default_interpret()
    batch_shape = xq.shape[:-1]
    k = xq.shape[-1]
    if k % group:
        raise ValueError(f"K={k} not divisible by group={group}")
    if formulation not in ("group", "two_level"):
        raise ValueError(f"unknown w4a8 formulation {formulation!r}")
    if block_m is None:
        # two_level: the nibble requant reruns for EVERY m-block (grid
        # order m, j, kk), so take the deepest m/K blocks VMEM allows —
        # measured sweep (bench/w4a8_sweep.py, M=512): 256/1024/16 = 171
        # eff T-ops, 512/1024/32 = 248 (1.30x bf16); 512/2048 overflows.
        block_m = 512 if formulation == "two_level" else 256
    if block_n is None:
        block_n = 1024
    if block_groups is None:
        # two_level: bg=16 + per-group interleave measured fastest AND most
        # stable (bench/w4a8_sweep.py chunk A/B, 3 repeats: 1302-1327us vs
        # the r4 bg=32 monolithic-dot default's 1422-1562us at M=512 —
        # ~13% median kernel win, 1.50x bf16 prefill).
        block_groups = 16
    if dot_chunks is None:
        # VPU/MXU overlap split for two_level (see _w4a8_2l_kernel): env
        # W4A8_2L_CHUNKS overrides (0 = per-group, the measured default;
        # 1 = the r4 monolithic dot).
        import os

        dot_chunks = int(os.environ.get("W4A8_2L_CHUNKS", "0"))
    xq2 = xq.reshape(-1, k)
    sx2 = s_x.reshape(-1).astype(jnp.float32)
    bm = pick_block(xq2.shape[0], block_m, 32)  # int8 sublane tile
    bn = pick_block(packed.shape[1], block_n, 128)
    if formulation == "group":
        out = _w4a8_2d(
            xq2, sx2, packed, scales, bias,
            group=group, out_dtype=out_dtype, block_m=bm, block_n=bn,
            block_groups=block_groups, interpret=interpret,
        )
    else:
        out = _w4a8_2l_2d(
            xq2, sx2, packed, scales, bias,
            group=group, out_dtype=out_dtype, block_m=bm, block_n=bn,
            block_groups=block_groups, dot_chunks=dot_chunks,
            interpret=interpret,
        )
    return out.reshape(*batch_shape, out.shape[-1])
