"""In-place decode-step KV-cache scatter as a Pallas custom call.

Why this exists (measured on v5e, bench/kv_update_probe.py): the XLA scatter
formulation of ``Int8KVCache.update`` is itself in-place and ~free, but when
its result feeds the Pallas attention kernel XLA inserts defensive copies of
the whole cache around the custom call (~236us at B=8, KV=32, S=2048 —
dwarfing the 138us attend). Expressing the scatter AS a Pallas call with
``input_output_aliases`` makes the in-place contract explicit end-to-end:
the cache buffer is pinned, only the new token's block is written, and the
downstream attend kernel reads the same buffer.

Mechanism: grid over batch; each program reads the one cache block that
contains this row's write position (S-block 8 for int8 payloads, 128 for f32
scales — Mosaic's minimum tile), inserts the new token at ``length % block``
via dynamic_update_slice, and writes the block back to the same buffer
(outputs alias the cache inputs; blocks the grid never touches remain the
buffer's own bytes). Block positions come from the scalar-prefetched
``lengths`` through the BlockSpec index maps. No manual DMA, no semaphores.

Decode (T == 1) only: for chunked prefill (T > 1) the XLA scatter amortizes
its copies over the whole chunk and stays the right tool.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SBLK = 8  # S-block for int8 payload writes (Mosaic sublane minimum)
_SBLK_SCALE = 128  # S-block for f32 scale writes (Mosaic lane minimum)


def _scatter_kernel(len_ref, k8_ref, ksn_ref, v8_ref, vsn_ref,
                    kq_in, ks_in, vq_in, vs_in,
                    kq_out, ks_out, vq_out, vs_out, *, max_seq):
    b = pl.program_id(0)
    ln = jnp.maximum(len_ref[b, 0], 0)
    # A slot at capacity (length == S) must DROP the write — matching the
    # XLA scatter's out-of-bounds semantics — not clobber the last block.
    valid = ln < max_seq
    row8 = ln % _SBLK
    row128 = ln % _SBLK_SCALE

    def _insert(blk, new, axis, row):
        # Row-select insert (Mosaic has no value-level dynamic_update_slice).
        rows = jax.lax.broadcasted_iota(jnp.int32, blk.shape, axis)
        return jnp.where((rows == row) & valid,
                         jnp.broadcast_to(new, blk.shape), blk)

    kq_out[...] = _insert(kq_in[...], k8_ref[...], 2, row8)
    vq_out[...] = _insert(vq_in[...], v8_ref[...], 2, row8)
    ks_out[...] = _insert(ks_in[...], ksn_ref[...], 2, row128)
    vs_out[...] = _insert(vs_in[...], vsn_ref[...], 2, row128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_scatter_decode(kq, ks, vq, vs, lengths, k8, ks_new, v8, vs_new,
                      *, interpret: bool = False):
    """Write one decode token per batch row into the int8 cache, in place.

    kq/vq: [B, KV, S, Dh] int8;  ks/vs: [B, KV, S] f32;  lengths: [B] int32
    k8/v8: [B, KV, 1, Dh] int8;  ks_new/vs_new: [B, KV, 1] f32
    Returns the four updated cache arrays (same buffers when donated).
    """
    B, KV, S, Dh = kq.shape
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)

    def _ln(ref, b):
        return jnp.clip(ref[b, 0], 0, S - 1)

    payload_blk = pl.BlockSpec((1, KV, 1, Dh), lambda b, ln: (b, 0, 0, 0))
    scale_blk = pl.BlockSpec((1, KV, 1), lambda b, ln: (b, 0, 0))
    cache_payload_blk = pl.BlockSpec(
        (1, KV, _SBLK, Dh), lambda b, ln: (b, 0, _ln(ln, b) // _SBLK, 0))
    cache_scale_blk = pl.BlockSpec(
        (1, KV, _SBLK_SCALE), lambda b, ln: (b, 0, _ln(ln, b) // _SBLK_SCALE))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            payload_blk,  # k8
            scale_blk,    # ks_new
            payload_blk,  # v8
            scale_blk,    # vs_new
            cache_payload_blk,  # kq (alias donor + current block bytes)
            cache_scale_blk,    # ks
            cache_payload_blk,  # vq
            cache_scale_blk,    # vs
        ],
        out_specs=[
            cache_payload_blk,
            cache_scale_blk,
            cache_payload_blk,
            cache_scale_blk,
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter_kernel, max_seq=S),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        # Indices are positions in the full pallas_call operand list, where
        # the scalar-prefetch operand (lengths) is index 0.
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(lengths2, k8, ks_new, v8, vs_new, kq, ks, vq, vs)


def _paged_scatter_kernel(pt_ref, len_ref, k8_ref, ksn_ref, v8_ref, vsn_ref,
                          kq_in, ks_in, vq_in, vs_in,
                          kq_out, ks_out, vq_out, vs_out, *, page_size):
    b = pl.program_id(0)
    off = jnp.maximum(len_ref[b, 0], 0) % page_size
    row8 = off % _SBLK

    def _insert(blk, new, axis, row):
        rows = jax.lax.broadcasted_iota(jnp.int32, blk.shape, axis)
        return jnp.where(rows == row, jnp.broadcast_to(new, blk.shape), blk)

    kq_out[...] = _insert(kq_in[...], k8_ref[...], 2, row8)
    vq_out[...] = _insert(vq_in[...], v8_ref[...], 2, row8)
    # Scale blocks cover the page's whole [1, ps] row; insert on the lane axis.
    ks_out[...] = _insert(ks_in[...], ksn_ref[...][..., None], 3, off)
    vs_out[...] = _insert(vs_in[...], vsn_ref[...][..., None], 3, off)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_kv_scatter_decode(kq, ks, vq, vs, page_table, lengths,
                            k8, ks_new, v8, vs_new, *, interpret: bool = False):
    """Write one decode token per batch row into the mapped page, in place.

    kq/vq: [P, KV, ps, Dh] int8 pools;  ks/vs: [P, KV, 1, ps] f32
    page_table: [B, maxP] int32 (-1 unmapped); lengths: [B] int32
    k8/v8: [B, KV, 1, Dh] int8;  ks_new/vs_new: [B, KV, 1] f32
    Unmapped rows and rows past the table window write to the reserved
    trash page (pool row P-1), matching the XLA scatter's semantics.
    """
    P, KV, ps, Dh = kq.shape
    B, width = page_table.shape
    assert ps % _SBLK == 0, "page_size must be a multiple of 8"
    trash = P - 1
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)
    pt = page_table.astype(jnp.int32)

    def _page(pt_ref, ln_ref, b):
        pi = jnp.maximum(ln_ref[b, 0], 0) // ps
        pg = pt_ref[b, jnp.minimum(pi, width - 1)]
        return jnp.where((pg < 0) | (pi >= width), trash, pg)

    def _row8(ln_ref, b):
        return (jnp.maximum(ln_ref[b, 0], 0) % ps) // _SBLK

    payload_blk = pl.BlockSpec((1, KV, 1, Dh), lambda b, pt, ln: (b, 0, 0, 0))
    scale_blk = pl.BlockSpec((1, KV, 1), lambda b, pt, ln: (b, 0, 0))
    pool_payload_blk = pl.BlockSpec(
        (1, KV, _SBLK, Dh),
        lambda b, pt, ln: (_page(pt, ln, b), 0, _row8(ln, b), 0))
    pool_scale_blk = pl.BlockSpec(
        (1, KV, 1, ps), lambda b, pt, ln: (_page(pt, ln, b), 0, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            payload_blk,   # k8
            scale_blk,     # ks_new
            payload_blk,   # v8
            scale_blk,     # vs_new
            pool_payload_blk,  # kq (alias donor + current block bytes)
            pool_scale_blk,    # ks
            pool_payload_blk,  # vq
            pool_scale_blk,    # vs
        ],
        out_specs=[
            pool_payload_blk,
            pool_scale_blk,
            pool_payload_blk,
            pool_scale_blk,
        ],
    )
    return pl.pallas_call(
        functools.partial(_paged_scatter_kernel, page_size=ps),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        # Operand list: pt=0, lengths=1, new data 2-5, pools 6-9.
        input_output_aliases={6: 0, 7: 1, 8: 2, 9: 3},
        interpret=interpret,
    )(pt, lengths2, k8, ks_new, v8, vs_new, kq, ks, vq, vs)


def _scatter4_kernel(len_ref, k4_ref, ksn_ref, v4_ref, vsn_ref,
                     kq_in, ks_in, vq_in, vs_in,
                     kq_out, ks_out, vq_out, vs_out, *, max_seq):
    """INT4 variant: the write is a READ-MODIFY-WRITE of one packed byte row
    (token 2r in the low nibble, 2r+1 in the high — models/kv_cache.py
    Int4KVCache), merged in i32 lanes (Mosaic legalizes no int8 shifts)."""
    b = pl.program_id(0)
    ln = jnp.maximum(len_ref[b, 0], 0)
    valid = ln < max_seq
    parity = ln % 2
    row8 = (ln // 2) % _SBLK
    col = (ln // 2) % _SBLK_SCALE

    def _merge(blk, nib):
        cur = blk.astype(jnp.int32)
        n = nib.astype(jnp.int32) & 0x0F
        lo_merge = (cur & ~0x0F) | n
        hi_merge = (cur & 0x0F) | (n << 4)
        return jnp.where(parity == 0, lo_merge, hi_merge).astype(jnp.int8)

    def _insert_payload(blk, nib):
        rows = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 2)
        return jnp.where((rows == row8) & valid,
                         _merge(blk, jnp.broadcast_to(nib, blk.shape)), blk)

    def _insert_scale(blk, new):
        # blk (1, KV, 2, 128): sublane = parity plane, lane = packed row.
        planes = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 2)
        lanes = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 3)
        sel = (planes == parity) & (lanes == col) & valid
        return jnp.where(sel, jnp.broadcast_to(new[..., None], blk.shape), blk)

    kq_out[...] = _insert_payload(kq_in[...], k4_ref[...])
    vq_out[...] = _insert_payload(vq_in[...], v4_ref[...])
    ks_out[...] = _insert_scale(ks_in[...], ksn_ref[...])
    vs_out[...] = _insert_scale(vs_in[...], vsn_ref[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv4_scatter_decode(kq, ks, vq, vs, lengths, k4, ks_new, v4, vs_new,
                       *, interpret: bool = False):
    """Write one decode token per batch row into the PACKED int4 cache, in
    place (same defensive-copy story as kv_scatter_decode — without the
    aliased custom call, XLA copies the whole cache around the Pallas
    attend; measured 2x step time at B=8, KV=32, S=2048).

    kq/vq: [B, KV, S/2, Dh] int8 packed;  ks/vs: [B, KV, 2, S/2] f32
    k4/v4: [B, KV, 1, Dh] int8 nibble values in [-7, 7]
    ks_new/vs_new: [B, KV, 1] f32; lengths: [B] int32.
    """
    B, KV, S2, Dh = kq.shape
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)

    def _r8(ref, b):
        return jnp.clip(ref[b, 0] // 2, 0, S2 - 1) // _SBLK

    def _r128(ref, b):
        return jnp.clip(ref[b, 0] // 2, 0, S2 - 1) // _SBLK_SCALE

    payload_blk = pl.BlockSpec((1, KV, 1, Dh), lambda b, ln: (b, 0, 0, 0))
    scale_blk = pl.BlockSpec((1, KV, 1), lambda b, ln: (b, 0, 0))
    cache_payload_blk = pl.BlockSpec(
        (1, KV, _SBLK, Dh), lambda b, ln: (b, 0, _r8(ln, b), 0))
    cache_scale_blk = pl.BlockSpec(
        (1, KV, 2, _SBLK_SCALE), lambda b, ln: (b, 0, 0, _r128(ln, b)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            payload_blk, scale_blk, payload_blk, scale_blk,
            cache_payload_blk, cache_scale_blk,
            cache_payload_blk, cache_scale_blk,
        ],
        out_specs=[
            cache_payload_blk, cache_scale_blk,
            cache_payload_blk, cache_scale_blk,
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter4_kernel, max_seq=S2 * 2),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(lengths2, k4, ks_new, v4, vs_new, kq, ks, vq, vs)


def _scatter_mixed_kernel(len_ref, k8_ref, ksn_ref, v4_ref, vsn_ref,
                          kq_in, ks_in, vq_in, vs_in,
                          kq_out, ks_out, vq_out, vs_out, *, max_seq):
    """MIXED K8V4 variant: K-side = the int8 insert (_scatter_kernel),
    V-side = the packed-nibble RMW merge (_scatter4_kernel)."""
    b = pl.program_id(0)
    ln = jnp.maximum(len_ref[b, 0], 0)
    valid = ln < max_seq
    # K (int8, natural order)
    row8 = ln % _SBLK
    row128 = ln % _SBLK_SCALE

    def _insert(blk, new, axis, row):
        rows = jax.lax.broadcasted_iota(jnp.int32, blk.shape, axis)
        return jnp.where((rows == row) & valid,
                         jnp.broadcast_to(new, blk.shape), blk)

    kq_out[...] = _insert(kq_in[...], k8_ref[...], 2, row8)
    ks_out[...] = _insert(ks_in[...], ksn_ref[...], 2, row128)

    # V (packed nibbles, token-pair order)
    parity = ln % 2
    vrow8 = (ln // 2) % _SBLK
    vcol = (ln // 2) % _SBLK_SCALE

    def _merge(blk, nib):
        cur = blk.astype(jnp.int32)
        n = nib.astype(jnp.int32) & 0x0F
        lo_merge = (cur & ~0x0F) | n
        hi_merge = (cur & 0x0F) | (n << 4)
        return jnp.where(parity == 0, lo_merge, hi_merge).astype(jnp.int8)

    rows_v = jax.lax.broadcasted_iota(jnp.int32, vq_in.shape, 2)
    vq_out[...] = jnp.where(
        (rows_v == vrow8) & valid,
        _merge(vq_in[...], jnp.broadcast_to(v4_ref[...], vq_in.shape)),
        vq_in[...],
    )
    planes = jax.lax.broadcasted_iota(jnp.int32, vs_in.shape, 2)
    lanes = jax.lax.broadcasted_iota(jnp.int32, vs_in.shape, 3)
    sel = (planes == parity) & (lanes == vcol) & valid
    vs_out[...] = jnp.where(
        sel, jnp.broadcast_to(vsn_ref[...][..., None], vs_in.shape),
        vs_in[...],
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def kv_mixed_scatter_decode(kq, ks, vq, vs, lengths, k8, ks_new, v4, vs_new,
                            *, interpret: bool = False):
    """Write one decode token per batch row into the K8V4 mixed cache, in
    place (same defensive-copy rationale as kv_scatter_decode).

    kq: [B, KV, S, Dh] int8;     ks: [B, KV, S] f32
    vq: [B, KV, S/2, Dh] int8 packed;  vs: [B, KV, 2, S/2] f32
    k8: [B, KV, 1, Dh] int8;  v4: [B, KV, 1, Dh] int8 nibbles in [-7, 7]
    ks_new/vs_new: [B, KV, 1] f32;  lengths: [B] int32.
    """
    B, KV, S, Dh = kq.shape
    S2 = vq.shape[2]
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)

    def _ln8(ref, b):
        return jnp.clip(ref[b, 0], 0, S - 1) // _SBLK

    def _ln128(ref, b):
        return jnp.clip(ref[b, 0], 0, S - 1) // _SBLK_SCALE

    def _vr8(ref, b):
        return jnp.clip(ref[b, 0] // 2, 0, S2 - 1) // _SBLK

    def _vr128(ref, b):
        return jnp.clip(ref[b, 0] // 2, 0, S2 - 1) // _SBLK_SCALE

    payload_blk = pl.BlockSpec((1, KV, 1, Dh), lambda b, ln: (b, 0, 0, 0))
    scale_blk = pl.BlockSpec((1, KV, 1), lambda b, ln: (b, 0, 0))
    k_payload_blk = pl.BlockSpec(
        (1, KV, _SBLK, Dh), lambda b, ln: (b, 0, _ln8(ln, b), 0))
    k_scale_blk = pl.BlockSpec(
        (1, KV, _SBLK_SCALE), lambda b, ln: (b, 0, _ln128(ln, b)))
    v_payload_blk = pl.BlockSpec(
        (1, KV, _SBLK, Dh), lambda b, ln: (b, 0, _vr8(ln, b), 0))
    v_scale_blk = pl.BlockSpec(
        (1, KV, 2, _SBLK_SCALE), lambda b, ln: (b, 0, 0, _vr128(ln, b)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            payload_blk, scale_blk, payload_blk, scale_blk,
            k_payload_blk, k_scale_blk, v_payload_blk, v_scale_blk,
        ],
        out_specs=[
            k_payload_blk, k_scale_blk, v_payload_blk, v_scale_blk,
        ],
    )
    return pl.pallas_call(
        functools.partial(_scatter_mixed_kernel, max_seq=S),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(kq.shape, kq.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(vq.shape, vq.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(lengths2, k8, ks_new, v4, vs_new, kq, ks, vq, vs)
