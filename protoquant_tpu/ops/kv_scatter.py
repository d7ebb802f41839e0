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


def _kivi4_flush_kernel(len_ref, pk_ref, sch_ref, pv_ref, svp_ref,
                        kq_in, kchs_in, vq_in, vs_in,
                        kq_out, kchs_out, vq_out, vs_out,
                        *, group, max_seq, vs_win, chs_rows):
    """KIVI int4 decode flush writer: when the new token completes a
    G-chunk, write the pre-packed nibbles + scales (computed in XLA by
    kivi4_decode_update — small elementwise math) into the int4 store, in
    place. Expressing only the WRITE as an aliased Pallas call keeps the
    flush math in one place (bit-identical to the prefill path's) while
    pinning the big cache buffers — an XLA scatter here would wrap them in
    whole-cache defensive copies around the Pallas attend (the round-2 int8
    lesson).

    pk/pv: (1, HB, G/2, Dh) packed nibbles;  sch: (1, HB, 1, Dh) K scales;
    svp: (1, HB, 2, G/2) parity-split V scales. The V-scale lanes land at
    offset (c * G/2) % vs_win inside the window via an exact 0/1 placement
    dot (P[r, l] = 1 iff l == off + r) — Mosaic has no dynamic lane scatter.
    """
    b = pl.program_id(0)
    G = group
    ln = jnp.maximum(len_ref[b, 0], 0)
    new_len = jnp.clip(len_ref[b, 1], 0, max_seq)
    # Flush iff THIS step confirms the chunk boundary (speculative scoring
    # writes with advance=0: the token lands in the tail but its chunk only
    # flushes once lengths actually cross the boundary — Int4KVCache.advance
    # handles commits).
    c = ln // G
    flush = ((c + 1) * G <= new_len) & ((c + 1) * G > ln)

    kq_out[...] = jnp.where(flush, pk_ref[...], kq_in[...])
    vq_out[...] = jnp.where(flush, pv_ref[...], vq_in[...])
    # kchs window is chs_rows sublanes (Mosaic min-tile); select row c.
    rows = jax.lax.broadcasted_iota(jnp.int32, kchs_in.shape, 2)
    kchs_out[...] = jnp.where(
        (rows == c % chs_rows) & flush,
        jnp.broadcast_to(sch_ref[...], kchs_in.shape), kchs_in[...])

    HB = vs_in.shape[1]
    off = (c * (G // 2)) % vs_win
    r_io = jax.lax.broadcasted_iota(jnp.int32, (HB, G // 2, vs_win), 1)
    l_io = jax.lax.broadcasted_iota(jnp.int32, (HB, G // 2, vs_win), 2)
    place = (l_io == off + r_io).astype(jnp.float32)
    vals = jax.lax.dot_general(
        svp_ref[0], place, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (HB, 2, vs_win) — HIGHEST: the MXU's default single-bf16-pass f32
    # dot would round the copied scale mantissas (measured 5e-4 drift
    # on-chip); the 3-pass decomposition moves them exactly.
    lane_w = jax.lax.broadcasted_iota(jnp.int32, vs_in.shape, 3)
    in_win = (lane_w >= off) & (lane_w < off + G // 2) & flush
    vs_out[...] = jnp.where(in_win, vals[None], vs_in[...])


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def kivi4_decode_update(kq, kchs, vq, vs, ktail, kts, vtail, vts, lengths,
                        k8, ks_new, v8, vs_new, *, group: int,
                        adv=None, interpret: bool = False):
    """One decode token per batch row into the KIVI int4 cache.

    Tail inserts and the chunk-flush MATH (requantization, packing) run in
    XLA — the tails and flush tensors are small ([B, KV, G, Dh]) and the
    formulas stay bit-identical to Int4KVCache._xla_update's prefill path —
    while the flush WRITES into the big packed arrays go through an aliased
    Pallas window kernel (_kivi4_flush_kernel) so the cache buffers stay
    pinned for the downstream Pallas attend.

    kq/vq: [B, KV, S/2, Dh] int8 packed;  kchs: [B, KV, S/G, Dh] f32;
    vs: [B, KV, 2, S/2] f32;  ktail/vtail: [B, KV, G, Dh] int8;
    kts/vts: [B, KV, G] f32;  k8/v8: [B, KV, 1, Dh] int8;
    ks_new/vs_new: [B, KV, 1] f32;  lengths: [B] int32.
    Returns the eight updated cache arrays.
    """
    B, KV, S2, Dh = kq.shape
    G = group
    NC = kchs.shape[2]
    max_seq = S2 * 2
    if adv is None:
        adv = jnp.ones((B,), jnp.int32)
    lengths2 = jnp.stack(
        [lengths.astype(jnp.int32), (lengths + adv).astype(jnp.int32)], 1)

    # ---- XLA: tail inserts (tail rows = position mod 2G) -------------------
    TC = 2 * G
    ln = jnp.maximum(lengths, 0)
    valid = (ln < max_seq)[:, None, None]
    row = (ln % TC)[:, None, None]
    g_io = jnp.arange(TC)[None, None, :]

    def _ins_payload(tail, new):
        sel = ((g_io == row) & valid)[..., None]
        return jnp.where(sel, new, tail)

    def _ins_scale(ts, new):
        return jnp.where((g_io == row) & valid, new, ts)

    ktail_u = _ins_payload(ktail, k8)
    vtail_u = _ins_payload(vtail, v8)
    kts_u = _ins_scale(kts, ks_new)
    vts_u = _ins_scale(vts, vs_new)

    # ---- XLA: flush math (the SHARED helper — bit-identical to prefill) ---
    from ..models.kv_cache import kivi_chunk_quantize

    # The completed chunk's G rows sit at tail rows (c*G) % 2G .. +G.
    crow = (((ln // G) * G) % TC)[:, None] + jnp.arange(G)[None, :]  # [B, G]
    ck8 = jnp.take_along_axis(ktail_u, crow[:, None, :, None], axis=2)
    cks = jnp.take_along_axis(kts_u, crow[:, None, :], axis=2)
    cv8 = jnp.take_along_axis(vtail_u, crow[:, None, :, None], axis=2)
    cvs = jnp.take_along_axis(vts_u, crow[:, None, :], axis=2)
    packed_k, s_ch, packed_v, s_v = kivi_chunk_quantize(ck8, cks, cv8, cvs)
    svp = jnp.stack([s_v[:, :, 0::2], s_v[:, :, 1::2]], 2)  # [B, KV, 2, G/2]

    # ---- Pallas: aliased window writes -------------------------------------
    vs_win = 128 if (S2 % 128 == 0 and G // 2 <= 128) else S2

    def _c(ref, b):
        return jnp.clip(ref[b, 0] // G, 0, NC - 1)

    pk_blk = pl.BlockSpec((1, KV, G // 2, Dh), lambda b, ln: (b, 0, 0, 0))
    sch_blk = pl.BlockSpec((1, KV, 1, Dh), lambda b, ln: (b, 0, 0, 0))
    svp_blk = pl.BlockSpec((1, KV, 2, G // 2), lambda b, ln: (b, 0, 0, 0))
    kq_blk = pl.BlockSpec(
        (1, KV, G // 2, Dh), lambda b, ln: (b, 0, _c(ln, b), 0))
    # Mosaic needs >= 8 sublanes (or the whole dim) per block: the kchs
    # write targets an 8-row window and selects row c % 8 in-kernel.
    chs_rows = 8 if NC % 8 == 0 else NC
    kchs_blk = pl.BlockSpec(
        (1, KV, chs_rows, Dh), lambda b, ln: (b, 0, _c(ln, b) // chs_rows, 0))
    vs_blk = pl.BlockSpec(
        (1, KV, 2, vs_win),
        lambda b, ln: (b, 0, 0, (_c(ln, b) * (G // 2)) // vs_win))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pk_blk, sch_blk, pk_blk, svp_blk,
                  kq_blk, kchs_blk, kq_blk, vs_blk],
        out_specs=[kq_blk, kchs_blk, kq_blk, vs_blk],
    )
    kq2, kchs2, vq2, vs2 = pl.pallas_call(
        functools.partial(
            _kivi4_flush_kernel, group=G, max_seq=max_seq, vs_win=vs_win,
            chs_rows=chs_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (kq, kchs, vq, vs)
        ],
        # Operand list: lengths=0, flush tensors 1-4, cache arrays 5-8.
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(lengths2, packed_k, s_ch[:, :, None], packed_v, svp,
      kq, kchs, vq, vs)
    return kq2, kchs2, vq2, vs2, ktail_u, kts_u, vtail_u, vts_u


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


def _k4v8_write_kernel(len_ref, pk_ref, sch_ref, v8_ref, vsn_ref,
                       kq_in, kchs_in, vq_in, vs_in,
                       kq_out, kchs_out, vq_out, vs_out,
                       *, group, max_seq, chs_rows):
    """K4V8 decode writer: the K half of _kivi4_flush_kernel (conditional
    packed-chunk + chunk-scale writes) combined with the int8 V insert of
    _scatter_kernel — one aliased Pallas call pins all four big buffers
    for the downstream attend."""
    b = pl.program_id(0)
    G = group
    ln = jnp.maximum(len_ref[b, 0], 0)
    new_len = jnp.clip(len_ref[b, 1], 0, max_seq)
    valid = ln < max_seq

    # ---- K: conditional chunk flush ---------------------------------------
    c = ln // G
    flush = ((c + 1) * G <= new_len) & ((c + 1) * G > ln)
    kq_out[...] = jnp.where(flush, pk_ref[...], kq_in[...])
    rows = jax.lax.broadcasted_iota(jnp.int32, kchs_in.shape, 2)
    kchs_out[...] = jnp.where(
        (rows == c % chs_rows) & flush,
        jnp.broadcast_to(sch_ref[...], kchs_in.shape), kchs_in[...])

    # ---- V: plain int8 insert at ln ---------------------------------------
    row8 = ln % _SBLK
    row128 = ln % _SBLK_SCALE

    def _insert(blk, new, axis, row):
        r = jax.lax.broadcasted_iota(jnp.int32, blk.shape, axis)
        return jnp.where((r == row) & valid,
                         jnp.broadcast_to(new, blk.shape), blk)

    vq_out[...] = _insert(vq_in[...], v8_ref[...], 2, row8)
    vs_out[...] = _insert(vs_in[...], vsn_ref[...], 2, row128)


@functools.partial(jax.jit, static_argnames=("group", "interpret"))
def k4v8_decode_update(kq, kchs, vq, vs, ktail, kts, vtail, vts, lengths,
                       k8, ks_new, v8, vs_new, *, group: int,
                       adv=None, interpret: bool = False):
    """One decode token per batch row into the K4V8 cache (same split as
    kivi4_decode_update: XLA tail inserts + K flush math, aliased Pallas
    writes into the big arrays).

    kq: [B, KV, S/2, Dh] packed K;  kchs: [B, KV, S/G, Dh] f32;
    vq: [B, KV, S, Dh] int8;  vs: [B, KV, S] f32;
    ktail/vtail: [B, KV, 2G, Dh] int8;  kts/vts: [B, KV, 2G] f32;
    k8/v8: [B, KV, 1, Dh] int8;  ks_new/vs_new: [B, KV, 1] f32.
    Returns (kq, kchs, vq, vs, ktail, kts, vtail, vts).
    """
    B, KV, S2, Dh = kq.shape
    G = group
    NC = kchs.shape[2]
    max_seq = S2 * 2
    if adv is None:
        adv = jnp.ones((B,), jnp.int32)
    lengths2 = jnp.stack(
        [lengths.astype(jnp.int32), (lengths + adv).astype(jnp.int32)], 1)

    # ---- XLA: tail inserts (K + V mirror; row = position mod 2G) ----------
    TC = 2 * G
    ln = jnp.maximum(lengths, 0)
    valid = (ln < max_seq)[:, None, None]
    row = (ln % TC)[:, None, None]
    g_io = jnp.arange(TC)[None, None, :]

    def _ins_payload(tail, new):
        sel = ((g_io == row) & valid)[..., None]
        return jnp.where(sel, new, tail)

    def _ins_scale(ts, new):
        return jnp.where((g_io == row) & valid, new, ts)

    ktail_u = _ins_payload(ktail, k8)
    vtail_u = _ins_payload(vtail, v8)
    kts_u = _ins_scale(kts, ks_new)
    vts_u = _ins_scale(vts, vs_new)

    # ---- XLA: K flush math (shared helper; V outputs DCE'd) ---------------
    from ..models.kv_cache import kivi_chunk_quantize

    crow = (((ln // G) * G) % TC)[:, None] + jnp.arange(G)[None, :]
    ck8 = jnp.take_along_axis(ktail_u, crow[:, None, :, None], axis=2)
    cks = jnp.take_along_axis(kts_u, crow[:, None, :], axis=2)
    packed_k, s_ch, _, _ = kivi_chunk_quantize(ck8, cks, ck8, cks)

    # ---- Pallas: aliased writes -------------------------------------------
    def _c(ref, b):
        return jnp.clip(ref[b, 0] // G, 0, NC - 1)

    def _vr8(ref, b):
        return jnp.clip(ref[b, 0], 0, max_seq - 1) // _SBLK

    def _vr128(ref, b):
        return jnp.clip(ref[b, 0], 0, max_seq - 1) // _SBLK_SCALE

    pk_blk = pl.BlockSpec((1, KV, G // 2, Dh), lambda b, ln: (b, 0, 0, 0))
    sch_blk = pl.BlockSpec((1, KV, 1, Dh), lambda b, ln: (b, 0, 0, 0))
    v_new_blk = pl.BlockSpec((1, KV, 1, Dh), lambda b, ln: (b, 0, 0, 0))
    vs_new_blk = pl.BlockSpec((1, KV, 1), lambda b, ln: (b, 0, 0))
    kq_blk = pl.BlockSpec(
        (1, KV, G // 2, Dh), lambda b, ln: (b, 0, _c(ln, b), 0))
    chs_rows = 8 if NC % 8 == 0 else NC
    kchs_blk = pl.BlockSpec(
        (1, KV, chs_rows, Dh), lambda b, ln: (b, 0, _c(ln, b) // chs_rows, 0))
    vq_blk = pl.BlockSpec(
        (1, KV, _SBLK, Dh), lambda b, ln: (b, 0, _vr8(ln, b), 0))
    vs_blk = pl.BlockSpec(
        (1, KV, _SBLK_SCALE), lambda b, ln: (b, 0, _vr128(ln, b)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[pk_blk, sch_blk, v_new_blk, vs_new_blk,
                  kq_blk, kchs_blk, vq_blk, vs_blk],
        out_specs=[kq_blk, kchs_blk, vq_blk, vs_blk],
    )
    kq2, kchs2, vq2, vs2 = pl.pallas_call(
        functools.partial(
            _k4v8_write_kernel, group=G, max_seq=max_seq,
            chs_rows=chs_rows),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(a.shape, a.dtype)
            for a in (kq, kchs, vq, vs)
        ],
        # Operand list: lengths=0, new tensors 1-4, cache arrays 5-8.
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        interpret=interpret,
    )(lengths2, packed_k, s_ch[:, :, None], v8, vs_new,
      kq, kchs, vq, vs)
    return kq2, kchs2, vq2, vs2, ktail_u, kts_u, vtail_u, vts_u
