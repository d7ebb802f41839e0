"""Pallas kernel: attention over an INT8 KV-cache with in-kernel dequant.

Component A2 (SURVEY.md §2.3; pattern space: INT-FlashAttention, PAPERS.md).
The decode bottleneck is HBM bandwidth on the KV-cache read; storing K/V as
int8 with per-token-per-head scales halves the bytes, and this kernel
dequantizes in VMEM so no fp copy of the cache ever exists in HBM.

Numerics: the per-token scale factorizes out of both dots exactly —
  score[t, s] = ks[s] * (q[t] . kq[s])        (scale applied after the MXU dot)
  out[t]      = sum_s (p[t, s] * vs[s]) * vq[s]  (scale folded into the prob)
so int8 dequant costs no extra matmul precision.

Grid: (batch, kv_head, S/block_s) — flash-style: each (b, kv) pair streams
the cache row through VMEM in S-blocks with online softmax (m, l, acc
scratch), so the kernel never holds the whole window in VMEM and scales to
arbitrary context lengths; blocks past the valid window are clamped away by
the scalar-prefetched length (dead fetches elided). Supports T >= 1 queries
(chunked prefill uses T = chunk).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import default_interpret

NEG_INF = -1e30


def _flash_block_s(s: int, want: int = 512) -> int:
    """Largest S-block that divides S (no cache-copying pad), >= 32 sublanes
    for the int8 tiles when possible."""
    for bs in (want, 256, 128, 64, 32):
        if s % bs == 0 and bs <= s:
            return bs
    return s  # odd window: single block (the old whole-window behavior)


def _head_block(KV: int, TG: int, Dh: int, bs: int, budget: int = 12 << 20) -> int:
    """Largest divisor HB of KV whose per-program VMEM footprint fits.

    Head-blocking is the decode-perf lever: at (B=8, KV=32, S=2048) the
    HB=1 grid is 1024 programs and per-program overhead caps the kernel at
    0.34 of HBM bandwidth, while HB=32 (32 programs, 2MB k/v blocks) streams
    both caches at ~1.0 of HBM bandwidth — 2.3x faster than the XLA-fused
    formulation at the same shape (bench/flash_hb_probe.py, measured on v5e).

    Footprint: double-buffered in/out blocks + f32 scratch + the (HB,TG,bs)
    f32 scores/probs intermediates.
    """
    for hb in range(KV, 0, -1):
        if KV % hb:
            continue
        tg8 = max(TG, 8)
        blocks = hb * (TG * Dh * 2 + bs * Dh + bs * 4 + bs * Dh + bs * 4 + TG * Dh * 2)
        scratch = hb * tg8 * (128 + 128 + Dh) * 4
        scores = 2 * hb * TG * bs * 4
        if 2 * blocks + scratch + scores <= budget:
            return hb
    return 1


def _attn_kernel(
    len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, *rest,
    group, block_s, lane, window, sm, softcap, has_sinks, has_positions,
    static_sinks,
):
    """S-blocked flash attention over the int8 cache, HB kv-heads per
    program, online softmax across the S-block axis.

    q_ref:  (1, HB, TG, Dh)  TG = t_q * group query rows (constant over s)
    k_ref:  (1, HB, bs, Dh)  int8 — S-block selected by the index map, which
                             clamps past the valid window so Pallas elides
                             the dead fetches (same trick as the paged kernel)
    ks_ref: (1, HB, 1, bs)   f32 key scales
    m/l:    VMEM (HB, >=8, 128) f32 scratch (running max / denom)
    acc:    VMEM (HB, >=8, Dh) f32 scratch

    Static variants (all exact vs int8_kv_attention_xla):
      window  > 0: sliding-window mask (Mistral/Gemma-2/3); blocks entirely
                   below the window are skipped — DMA clamped away by the
                   index map, math skipped by the pl.when guard — so windowed
                   decode cost is O(window), not O(S).
      sm:          static score multiplier (Gemma query scaling; default
                   head_dim**-0.5).
      softcap > 0: Gemma-2 logit soft-capping, applied pre-mask.
      has_sinks:   GPT-OSS learned per-head sink logits join the softmax via
                   the online-softmax initial state (m0 = sink, l0 = 1,
                   acc0 = 0) — the sink holds denominator mass but no value.
      has_positions: ring-buffer caches (RingInt8KVCache) — column c holds
                   absolute position pos_ref[c] (negative = never written),
                   so masking keys off positions instead of the column iota.
                   No block skipping: ring capacity is already O(window).
      static_sinks: StreamingLLM — positions < static_sinks stay visible
                   to every query regardless of the sliding window.
    """
    rest = list(rest)
    sink_ref = rest.pop(0) if has_sinks else None
    pos_ref = rest.pop(0) if has_positions else None
    o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    s = pl.program_id(2)
    HB, TG = q_ref.shape[1], q_ref.shape[2]
    t_max = (TG - 1) // group

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)
        if has_sinks:
            m_ref[:, :TG] = sink_ref[...]
            l_ref[:, :TG] = jnp.ones_like(l_ref[:, :TG])

    length = len_ref[b, 0]

    # Blocks entirely beyond the last valid column (len + t_max) — or, for
    # sliding-window, entirely before the earliest in-window column — hold
    # nothing: skip their math (their DMA was already clamped away). Ring
    # caches (has_positions) scatter positions across columns, so every
    # block may hold live keys — but capacity is O(window), so nothing is
    # lost by visiting all of them.
    if has_positions:
        active = s >= 0
    else:
        active = s * block_s <= length + t_max
        if window > 0:
            lo_col = jnp.maximum(length - window + 1, 0)
            active &= (s + 1) * block_s > lo_col

    @pl.when(active)
    def _():
        # MXU lanes: bf16 on TPU (native rate; exact for int8 values), f32 in
        # interpret mode off-TPU.
        q = q_ref[0].astype(lane)  # (HB, TG, Dh)
        k = k_ref[0].astype(lane)  # (HB, bs, Dh)
        ks = ks_ref[0]  # (HB, 1, bs)

        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HB, TG, bs)
        scores = scores * ks * sm
        if softcap > 0.0:
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))

        # Causal/length mask: query row r belongs to step t = r // group at
        # absolute position len + t; key column c is valid iff its absolute
        # position p_c <= len + t (and, windowed, p_c > len + t - window,
        # except StreamingLLM sink positions p_c < static_sinks). Contiguous
        # caches have p_c = c; ring caches supply per-column positions
        # (negative = never written).
        t_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // group
        if has_positions:
            pos = jnp.broadcast_to(
                pos_ref[...].reshape(1, 1, block_s), scores.shape
            )
            valid = (pos >= 0) & (pos <= length + t_rows)
        else:
            pos = s * block_s + jax.lax.broadcasted_iota(
                jnp.int32, scores.shape, 2
            )
            valid = pos <= (length + t_rows)
        if window > 0:
            in_window = pos > (length + t_rows - window)
            if static_sinks > 0:
                in_window |= pos < static_sinks
            valid &= in_window
        scores = jnp.where(valid, scores, NEG_INF)

        # Online-softmax update. A row whose every column in this block is
        # masked while m is still NEG_INF would see exp(NEG_INF - NEG_INF)
        # = 1 — the `valid` guard on p zeroes those lanes exactly (this
        # arises under sliding windows at T > 1, where different query rows
        # have disjoint windows; full-causal block 0 never hits it).
        m_old = m_ref[:, :TG, :1]  # (HB, TG, 1)
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # (HB, TG, bs)

        vs = vs_ref[0]  # (HB, 1, bs)
        v = v_ref[0].astype(lane)  # (HB, bs, Dh)
        pv = jax.lax.dot_general(
            (p * vs).astype(lane), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (HB, TG, Dh)

        l_new = l_ref[:, :TG, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:, :TG] = acc_ref[:, :TG] * corr + pv
        m_ref[:, :TG] = jnp.broadcast_to(m_new, (HB, TG, m_ref.shape[2]))
        l_ref[:, :TG] = jnp.broadcast_to(l_new, (HB, TG, l_ref.shape[2]))

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (
            acc_ref[:, :TG] / jnp.maximum(l_ref[:, :TG, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group", "t_q", "window", "scale", "softcap", "static_sinks",
        "interpret", "out_dtype",
    ),
)
def _attend(q, kq, ks, vq, vs, lengths, sink_rows, positions, *, group, t_q,
            window, scale, softcap, static_sinks, interpret, out_dtype):
    B, KV, TG, Dh = q.shape
    S = kq.shape[2]
    bs = _flash_block_s(S)
    HB = _head_block(KV, TG, Dh, bs)
    ks4 = ks.reshape(B, KV, 1, S)
    vs4 = vs.reshape(B, KV, 1, S)
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)
    t_max = (TG - 1) // group
    sm = scale if scale > 0.0 else Dh**-0.5
    ring = positions is not None

    def s_eff(s, ln_b):
        # Clamp past the last needed block — and, windowed, before the first
        # needed block — so dead fetches are elided (repeat indices = no DMA).
        # Ring caches scatter positions over columns: no clamping possible.
        if ring:
            return s
        ln_b = jnp.maximum(ln_b, 0)
        hi = (ln_b + t_max) // bs
        if window > 0:
            lo = jnp.maximum(ln_b - window + 1, 0) // bs
            return jnp.clip(s, lo, hi)
        return jnp.minimum(s, hi)

    def kv_index(b, h, s, ln):
        return (b, h, s_eff(s, ln[b, 0]), 0)

    def kscale_index(b, h, s, ln):
        return (b, h, 0, s_eff(s, ln[b, 0]))

    in_specs = [
        pl.BlockSpec((1, HB, TG, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, bs, Dh), kv_index),
        pl.BlockSpec((1, HB, 1, bs), kscale_index),
        pl.BlockSpec((1, HB, bs, Dh), kv_index),
        pl.BlockSpec((1, HB, 1, bs), kscale_index),
    ]
    operands = [lengths2, q, kq, ks4, vq, vs4]
    if sink_rows is not None:
        # (KV, TG, 128) f32 — per-query-row learned sink logit, lane-
        # broadcast to match the m-scratch layout it initializes.
        in_specs.append(pl.BlockSpec((HB, TG, 128), lambda b, h, s, ln: (h, 0, 0)))
        operands.append(sink_rows)
    if ring:
        # (B, 1, S) int32 — per-column absolute positions (ring caches).
        in_specs.append(
            pl.BlockSpec((1, 1, bs), lambda b, h, s, ln: (b, 0, s))
        )
        operands.append(positions.reshape(B, 1, S).astype(jnp.int32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KV // HB, S // bs),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HB, TG, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((HB, max(TG, 8), 128), jnp.float32),
            pltpu.VMEM((HB, max(TG, 8), 128), jnp.float32),
            pltpu.VMEM((HB, max(TG, 8), Dh), jnp.float32),
        ],
    )
    lane = jnp.float32 if interpret else jnp.bfloat16
    kernel = functools.partial(
        _attn_kernel, group=group, block_s=bs, lane=lane, window=window,
        sm=sm, softcap=softcap, has_sinks=sink_rows is not None,
        has_positions=ring, static_sinks=static_sinks,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, TG, Dh), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)


def int8_kv_attention(
    q: jnp.ndarray,  # [B, T, H, Dh] (post-RoPE)
    kq: jnp.ndarray,  # [B, KV, S, Dh] int8 cache (already updated with this step)
    ks: jnp.ndarray,  # [B, KV, S] f32
    vq: jnp.ndarray,  # [B, KV, S, Dh] int8
    vs: jnp.ndarray,  # [B, KV, S] f32
    lengths: jnp.ndarray,  # [B] int32 — cache length BEFORE this step's tokens
    *,
    window: int = 0,
    scale: float = 0.0,
    softcap: float = 0.0,
    sink_logits: jnp.ndarray | None = None,  # [H] learned sinks (GPT-OSS)
    k_positions: jnp.ndarray | None = None,  # [B, S] ring-cache positions
    sinks: int = 0,  # StreamingLLM: positions < sinks always visible
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [B, T, H, Dh] attention output in q.dtype."""
    if interpret is None:
        interpret = default_interpret()
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    group = H // KV
    # [B, T, KV, group, Dh] -> [B, KV, T*group, Dh] with row = t*group + g
    qh = q.reshape(B, T, KV, group, Dh).transpose(0, 2, 1, 3, 4).reshape(B, KV, T * group, Dh)
    sink_rows = None
    if sink_logits is not None:
        # Row r = t*group + g of kv-head kv reads q-head kv*group + g.
        srow = jnp.broadcast_to(
            sink_logits.astype(jnp.float32).reshape(KV, 1, group), (KV, T, group)
        ).reshape(KV, T * group)
        sink_rows = jnp.broadcast_to(srow[:, :, None], (KV, T * group, 128))
    out = _attend(
        qh,
        kq,
        ks,
        vq,
        vs,
        lengths,
        sink_rows,
        k_positions,
        group=group,
        t_q=T,
        window=int(window),
        scale=float(scale),
        softcap=float(softcap),
        static_sinks=int(sinks),
        interpret=interpret,
        out_dtype=q.dtype,
    )
    return out.reshape(B, KV, T, group, Dh).transpose(0, 2, 1, 3, 4).reshape(B, T, H, Dh)


def int8_kv_attention_xla(q, kq, ks, vq, vs, lengths, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          k_positions=None, sinks: int = 0,
                          sink_logits=None, tree_mask=None):
    """XLA-fused int8-KV attention: the dequant casts/scales fuse into the
    batched dots, so HBM still streams int8. Off-TPU (and under
    ATTENTION_BACKEND="xla") this is the product path; on TPU the
    head-blocked Pallas kernel above is ~2.1x faster at decode (XLA's
    batched-matvec fusions stream the cache at 0.46-0.63 of HBM bandwidth
    vs ~1.0 for the kernel — bench/attend_decomp_probe.py, v5e).

    Also serves as the test oracle for the kernel.

    Scales are factorized out of the per-element products (the same exact
    rank-1 factorization the kernel uses): the int8 operands hit the dots as
    bare bf16 casts (exact for int8 values) and the [S]-shaped scales touch
    the scores/probs once — 128x fewer multiplies than dequantizing the
    cache elementwise."""
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    group = H // KV
    # bf16 lanes are exact for int8 values; XLA:CPU's dot thunk can't run
    # bf16 x bf16 batched dots, so fall back to f32 lanes off-TPU.
    lane = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    sm = scale if scale > 0.0 else Dh**-0.5
    qh = (q.astype(jnp.float32) * sm).reshape(B, T, KV, group, Dh)
    scores = jnp.einsum(
        "btkgd,bksd->bkgts",
        qh.astype(lane),
        kq.astype(lane),
        preferred_element_type=jnp.float32,
    )
    scores = scores * ks[:, :, None, None, :]
    if softcap > 0.0:
        # Gemma-2 attention-logit soft-capping (pre-mask; masked slots go to
        # NEG_INF after, so the cap never resurrects them).
        scores = softcap * jnp.tanh(scores / softcap)
    t_pos = lengths[:, None] + jnp.arange(T)[None, :]  # [B, T]
    if k_positions is None:
        # Contiguous cache: column c holds absolute position c.
        s_pos = jnp.broadcast_to(jnp.arange(kq.shape[2])[None, :], (B, kq.shape[2]))
    else:
        # Ring cache: the caller reconstructs per-column absolute positions
        # (negative = never written).
        s_pos = k_positions
    mask = s_pos[:, None, None, None, :] <= t_pos[:, None, None, :, None]
    mask &= s_pos[:, None, None, None, :] >= 0
    if tree_mask is not None:
        # Tree speculation (SURVEY §3.4 ext): the T in-flight queries are
        # nodes of a candidate TREE written at slots lengths..lengths+T-1.
        # Inside that window the slot-causal relation is replaced by the
        # ancestor relation tree_mask[t, j] (query node t may see node j);
        # everything before the window stays fully visible (guaranteed by
        # the base mask: those s_pos < lengths <= t_pos).
        j = s_pos - lengths[:, None]  # [B, S] in-window node index
        in_win = (j >= 0) & (j < tree_mask.shape[1])
        tm = jnp.take(
            tree_mask, jnp.clip(j, 0, tree_mask.shape[1] - 1), axis=1
        )  # [T, B, S]
        tm = jnp.transpose(tm, (1, 0, 2))  # [B, T, S]
        mask = jnp.where(
            in_win[:, None, None, None, :],
            tm[:, None, None, :, :],
            mask,
        )
    if window > 0:
        # Sliding-window (Mistral): keys more than window-1 behind are out —
        # except the first `sinks` positions (StreamingLLM attention sinks),
        # which stay visible forever.
        in_window = (
            s_pos[:, None, None, None, :]
            > t_pos[:, None, None, :, None] - window
        )
        if sinks > 0:
            in_window |= s_pos[:, None, None, None, :] < sinks
        mask &= in_window
    scores = jnp.where(mask, scores, NEG_INF)
    if sink_logits is None:
        probs = jax.nn.softmax(scores, axis=-1)
    else:
        # GPT-OSS learned sinks: one trainable logit per head joins the
        # softmax; its probability mass is dropped (models/llama.py
        # _softmax_with_sinks semantics).
        sl = sink_logits.astype(jnp.float32).reshape(1, KV, group, 1, 1)
        sink_col = jnp.broadcast_to(sl, scores.shape[:-1] + (1,))
        probs = jax.nn.softmax(
            jnp.concatenate([scores, sink_col], axis=-1), axis=-1
        )[..., :-1]
    pv = (probs * vs[:, :, None, None, :]).astype(lane)
    out = jnp.einsum(
        "bkgts,bksd->btkgd",
        pv,
        vq.astype(lane),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B, T, H, Dh).astype(q.dtype)


# Backward-compatible oracle alias
int8_kv_attention_ref = int8_kv_attention_xla


# -- INT4 KV flash attention (round 3) ---------------------------------------


def _attn4_kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, group, block_sp, lane, sm):
    """Flash attention over the PACKED int4 cache (full-causal tier).

    k_ref: (1, HB, bs_p, Dh) int8 bytes — packed row r holds token 2r (low
    nibble) and 2r+1 (high), so one S-grid block covers 2*bs_p tokens.
    ks_ref: (1, HB, 2, bs_p) f32 — parity-split per-token scales.
    The block runs TWO online-softmax sub-updates (even tokens from the low
    nibbles, odd from the high), each with its own position iota — no
    in-kernel interleave/relayout, and the nibble extraction is the same
    full-tile i32 shift trick as ops/wo4_matmul.py's split kernel.
    """
    b = pl.program_id(0)
    s = pl.program_id(2)
    HB, TG = q_ref.shape[1], q_ref.shape[2]
    t_max = (TG - 1) // group

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b, 0]
    active = s * 2 * block_sp <= length + t_max

    @pl.when(active)
    def _():
        q = q_ref[0].astype(lane)  # (HB, TG, Dh)
        # Full-tile nibble extraction (the wo4 split-kernel trick). The two
        # parity halves are NEVER concatenated as (2*bs_p, Dh) tiles — that
        # materializes ~1MB of i32 VMEM copies per program (measured 0.29
        # HBM frac); instead each half gets its own dot, and only the SMALL
        # (TG, bs_p) score tiles concatenate for one shared softmax update.
        # i32 widen-then-shift is the ONLY formulation Mosaic compiles:
        # int8-native shifts ((b << 4) >> 4 in i8, 4x VPU lanes/op) fail to
        # legalize — `arith.shli : vector<...xi8>` has no TPU lowering
        # (probed on-chip this round; see BASELINE.md int4 KV status).
        ku = k_ref[0].astype(jnp.int32)  # (HB, bs_p, Dh)
        vu = v_ref[0].astype(jnp.int32)
        k_lo = ((ku << 28) >> 28).astype(lane)
        k_hi = ((ku << 24) >> 28).astype(lane)
        v_lo = ((vu << 28) >> 28).astype(lane)
        v_hi = ((vu << 24) >> 28).astype(lane)
        ks_e = ks_ref[0, :, 0, :].reshape(HB, 1, block_sp)
        ks_o = ks_ref[0, :, 1, :].reshape(HB, 1, block_sp)
        vs_e = vs_ref[0, :, 0, :].reshape(HB, 1, block_sp)
        vs_o = vs_ref[0, :, 1, :].reshape(HB, 1, block_sp)

        dims = (((2,), (2,)), ((0,), (0,)))
        s_lo = jax.lax.dot_general(
            q, k_lo, dims, preferred_element_type=jnp.float32) * ks_e
        s_hi = jax.lax.dot_general(
            q, k_hi, dims, preferred_element_type=jnp.float32) * ks_o
        scores = jnp.concatenate([s_lo, s_hi], axis=-1) * sm  # (HB, TG, 2bs_p)
        t_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // group
        idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        # Column c < bs_p holds token 2*(s*bs_p + c); column bs_p + c holds
        # 2*(s*bs_p + c) + 1.
        pos = jnp.where(
            idx < block_sp,
            2 * (s * block_sp + idx),
            2 * (s * block_sp + idx - block_sp) + 1,
        )
        valid = pos <= (length + t_rows)
        scores = jnp.where(valid, scores, NEG_INF)

        m_old = m_ref[:, :TG, :1]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        pdims = (((2,), (1,)), ((0,), (0,)))
        pv = jax.lax.dot_general(
            (p[:, :, :block_sp] * vs_e).astype(lane), v_lo, pdims,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            (p[:, :, block_sp:] * vs_o).astype(lane), v_hi, pdims,
            preferred_element_type=jnp.float32,
        )
        l_new = l_ref[:, :TG, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:, :TG] = acc_ref[:, :TG] * corr + pv
        m_ref[:, :TG] = jnp.broadcast_to(m_new, (HB, TG, m_ref.shape[2]))
        l_ref[:, :TG] = jnp.broadcast_to(l_new, (HB, TG, l_ref.shape[2]))

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (
            acc_ref[:, :TG] / jnp.maximum(l_ref[:, :TG, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "t_q", "scale", "interpret", "out_dtype"),
)
def _attend4(q, kq, ks, vq, vs, lengths, *, group, t_q, scale, interpret,
             out_dtype):
    B, KV, TG, Dh = q.shape
    S2 = kq.shape[2]  # packed rows = tokens / 2
    bs_p = _flash_block_s(S2, want=256)
    HB = _head_block(KV, TG, Dh, 2 * bs_p)
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)
    t_max = (TG - 1) // group
    sm = scale if scale > 0.0 else Dh**-0.5

    def s_eff(s, ln_b):
        hi = (jnp.maximum(ln_b, 0) + t_max) // (2 * bs_p)
        return jnp.minimum(s, hi)

    def kv_index(b, h, s, ln):
        return (b, h, s_eff(s, ln[b, 0]), 0)

    def kscale_index(b, h, s, ln):
        return (b, h, 0, s_eff(s, ln[b, 0]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KV // HB, S2 // bs_p),
        in_specs=[
            pl.BlockSpec((1, HB, TG, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
            pl.BlockSpec((1, HB, bs_p, Dh), kv_index),
            pl.BlockSpec((1, HB, 2, bs_p), kscale_index),
            pl.BlockSpec((1, HB, bs_p, Dh), kv_index),
            pl.BlockSpec((1, HB, 2, bs_p), kscale_index),
        ],
        out_specs=pl.BlockSpec((1, HB, TG, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((HB, max(TG, 8), 128), jnp.float32),
            pltpu.VMEM((HB, max(TG, 8), 128), jnp.float32),
            pltpu.VMEM((HB, max(TG, 8), Dh), jnp.float32),
        ],
    )
    lane = jnp.float32 if interpret else jnp.bfloat16
    kernel = functools.partial(
        _attn4_kernel, group=group, block_sp=bs_p, lane=lane, sm=sm,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, TG, Dh), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths2, q, kq, ks, vq, vs)


def int4_kv_attention(
    q: jnp.ndarray,  # [B, T, H, Dh] (post-RoPE)
    kq: jnp.ndarray,  # [B, KV, S/2, Dh] int8 PACKED nibbles (Int4KVCache)
    ks: jnp.ndarray,  # [B, KV, 2, S/2] f32 parity-split scales
    vq: jnp.ndarray,
    vs: jnp.ndarray,
    lengths: jnp.ndarray,  # [B] int32 — length BEFORE this step's tokens
    *,
    scale: float = 0.0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Flash attention over the packed INT4 KV cache (full-causal only;
    exact vs unpack + int8_kv_attention_xla on the same nibble values).
    Returns [B, T, H, Dh] in q.dtype."""
    if interpret is None:
        interpret = default_interpret()
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    group = H // KV
    qh = q.reshape(B, T, KV, group, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, KV, T * group, Dh)
    out = _attend4(
        qh, kq, ks, vq, vs, lengths,
        group=group, t_q=T, scale=float(scale), interpret=interpret,
        out_dtype=q.dtype,
    )
    return out.reshape(B, KV, T, group, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, T, H, Dh)


# -- MIXED K8V4 KV flash attention (round 3) ----------------------------------


def _attn_mixed_kernel(len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                       m_ref, l_ref, acc_ref, *, group, block_s, lane, sm):
    """Flash attention over the MIXED cache: K int8 per-token (score
    fidelity — attention logits see full int8 keys), V packed int4
    (token-pair nibbles — the byte saving lands on the value read).

    k_ref:  (1, HB, bs, Dh) int8, natural token order
    ks_ref: (1, HB, 1, bs) f32
    v_ref:  (1, HB, bs/2, Dh) int8 packed (row r = tokens 2r lo / 2r+1 hi,
            block-local)
    vs_ref: (1, HB, 2, bs/2) f32 parity-split value scales

    Scores and the online softmax run in the int8 kernel's natural token
    order; the probability tile splits into even/odd token columns via two
    CONSTANT 0/1 selection matrices on the MXU (exact permutation — no
    strided lane ops, which Mosaic cannot legalize), then each parity half
    dots against its nibble plane exactly as the int4 kernel does."""
    b = pl.program_id(0)
    s = pl.program_id(2)
    HB, TG = q_ref.shape[1], q_ref.shape[2]
    t_max = (TG - 1) // group
    half = block_s // 2

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b, 0]
    active = s * block_s <= length + t_max

    @pl.when(active)
    def _():
        q = q_ref[0].astype(lane)  # (HB, TG, Dh)
        k = k_ref[0].astype(lane)  # (HB, bs, Dh)
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * ks_ref[0] * sm  # (HB, TG, bs)

        t_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // group
        pos = s * block_s + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 2
        )
        valid = pos <= (length + t_rows)
        scores = jnp.where(valid, scores, NEG_INF)

        m_old = m_ref[:, :TG, :1]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)  # (HB, TG, bs)

        # Exact even/odd token selection as f32 MXU dots with constant 0/1
        # matrices: E[c, r] = (c == 2r), O[c, r] = (c == 2r + 1).
        rows = jax.lax.broadcasted_iota(jnp.int32, (block_s, half), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (block_s, half), 1)
        sel_e = (rows == 2 * cols).astype(jnp.float32)
        sel_o = (rows == 2 * cols + 1).astype(jnp.float32)
        pdims = (((2,), (0,)), ((), ()))
        pe = jax.lax.dot_general(
            p, sel_e, pdims, preferred_element_type=jnp.float32
        )  # (HB, TG, half)
        po = jax.lax.dot_general(
            p, sel_o, pdims, preferred_element_type=jnp.float32
        )

        # Nibble unpack (i32 widen-then-shift — the only Mosaic-legal form).
        vu = v_ref[0].astype(jnp.int32)  # (HB, half, Dh)
        v_lo = ((vu << 28) >> 28).astype(lane)
        v_hi = ((vu << 24) >> 28).astype(lane)
        vs_e = vs_ref[0, :, 0, :].reshape(HB, 1, half)
        vs_o = vs_ref[0, :, 1, :].reshape(HB, 1, half)
        vdims = (((2,), (1,)), ((0,), (0,)))
        pv = jax.lax.dot_general(
            (pe * vs_e).astype(lane), v_lo, vdims,
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            (po * vs_o).astype(lane), v_hi, vdims,
            preferred_element_type=jnp.float32,
        )

        l_new = l_ref[:, :TG, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:, :TG] = acc_ref[:, :TG] * corr + pv
        m_ref[:, :TG] = jnp.broadcast_to(m_new, (HB, TG, m_ref.shape[2]))
        l_ref[:, :TG] = jnp.broadcast_to(l_new, (HB, TG, l_ref.shape[2]))

    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (
            acc_ref[:, :TG] / jnp.maximum(l_ref[:, :TG, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "t_q", "scale", "interpret", "out_dtype"),
)
def _attend_mixed(q, kq, ks, vq, vs, lengths, *, group, t_q, scale,
                  interpret, out_dtype):
    B, KV, TG, Dh = q.shape
    S = kq.shape[2]
    bs = _flash_block_s(S)
    HB = _head_block(KV, TG, Dh, bs)
    ks4 = ks.reshape(B, KV, 1, S)
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)
    t_max = (TG - 1) // group
    sm = scale if scale > 0.0 else Dh**-0.5

    def s_eff(s, ln_b):
        return jnp.minimum(s, (jnp.maximum(ln_b, 0) + t_max) // bs)

    def kv_index(b, h, s, ln):
        return (b, h, s_eff(s, ln[b, 0]), 0)

    def kscale_index(b, h, s, ln):
        return (b, h, 0, s_eff(s, ln[b, 0]))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KV // HB, S // bs),
        in_specs=[
            pl.BlockSpec((1, HB, TG, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
            pl.BlockSpec((1, HB, bs, Dh), kv_index),
            pl.BlockSpec((1, HB, 1, bs), kscale_index),
            pl.BlockSpec((1, HB, bs // 2, Dh), kv_index),
            pl.BlockSpec((1, HB, 2, bs // 2), kscale_index),
        ],
        out_specs=pl.BlockSpec((1, HB, TG, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((HB, max(TG, 8), 128), jnp.float32),
            pltpu.VMEM((HB, max(TG, 8), 128), jnp.float32),
            pltpu.VMEM((HB, max(TG, 8), Dh), jnp.float32),
        ],
    )
    lane = jnp.float32 if interpret else jnp.bfloat16
    kernel = functools.partial(
        _attn_mixed_kernel, group=group, block_s=bs, lane=lane, sm=sm,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, TG, Dh), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths2, q, kq, ks4, vq, vs)


def mixed_kv_attention(
    q: jnp.ndarray,  # [B, T, H, Dh] (post-RoPE)
    kq: jnp.ndarray,  # [B, KV, S, Dh] int8 keys
    ks: jnp.ndarray,  # [B, KV, S] f32
    vq: jnp.ndarray,  # [B, KV, S/2, Dh] int8 PACKED values (Int4 layout)
    vs: jnp.ndarray,  # [B, KV, 2, S/2] f32 parity-split value scales
    lengths: jnp.ndarray,  # [B] int32 — length BEFORE this step's tokens
    *,
    scale: float = 0.0,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Flash attention over the K8V4 mixed cache (full-causal only; exact
    vs int8 K + unpacked-V int8_kv_attention_xla on the same nibble
    values). Returns [B, T, H, Dh] in q.dtype."""
    if interpret is None:
        interpret = default_interpret()
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    group = H // KV
    qh = q.reshape(B, T, KV, group, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, KV, T * group, Dh)
    out = _attend_mixed(
        qh, kq, ks, vq, vs, lengths,
        group=group, t_q=T, scale=float(scale), interpret=interpret,
        out_dtype=q.dtype,
    )
    return out.reshape(B, KV, T, group, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, T, H, Dh)
