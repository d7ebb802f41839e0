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
    static_sinks, has_alibi=False,
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
    alibi_ref = rest.pop(0) if has_alibi else None
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
        if has_alibi:
            # ALiBi: -slope_row * (q_pos - k_pos); masked lanes go to
            # NEG_INF below regardless.
            sl = alibi_ref[:, :TG, :1]  # (HB, TG, 1) per-query-row slopes
            scores = scores - sl * (length + t_rows - pos).astype(
                jnp.float32
            )
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
def _attend(q, kq, ks, vq, vs, lengths, sink_rows, positions, alibi_rows,
            *, group, t_q, window, scale, softcap, static_sinks, interpret,
            out_dtype):
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
    if alibi_rows is not None:
        # (KV, TG, 128) f32 — per-query-row ALiBi slope, lane-broadcast
        # like the sink rows.
        in_specs.append(
            pl.BlockSpec((HB, TG, 128), lambda b, h, s, ln: (h, 0, 0))
        )
        operands.append(alibi_rows)
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
        has_alibi=alibi_rows is not None,
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
    alibi_slopes: jnp.ndarray | None = None,  # [H] ALiBi slopes (BLOOM/MPT)
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
    alibi_rows = None
    if alibi_slopes is not None:
        arow = jnp.broadcast_to(
            alibi_slopes.astype(jnp.float32).reshape(KV, 1, group),
            (KV, T, group),
        ).reshape(KV, T * group)
        alibi_rows = jnp.broadcast_to(
            arow[:, :, None], (KV, T * group, 128)
        )
    out = _attend(
        qh,
        kq,
        ks,
        vq,
        vs,
        lengths,
        sink_rows,
        k_positions,
        alibi_rows,
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
                          sink_logits=None, tree_mask=None,
                          alibi_slopes=None):
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
    if tree_mask is not None:
        # Tree queries sit at LOGICAL position frontier + node depth (the
        # rope positions the scoring program uses), not frontier + slot
        # index — derive depth from the ancestor-or-self mask (row sum - 1)
        # so the sliding-window lower bound below matches what plain decode
        # at that depth would see. At window=0 this changes nothing (the
        # base causal mask only gates history, all of which predates the
        # frontier either way).
        depths_t = jnp.sum(tree_mask.astype(jnp.int32), axis=1) - 1
        t_pos = lengths[:, None] + depths_t[None, :]  # [B, T]
    else:
        t_pos = lengths[:, None] + jnp.arange(T)[None, :]  # [B, T]
    if k_positions is None:
        # Contiguous cache: column c holds absolute position c.
        s_pos = jnp.broadcast_to(jnp.arange(kq.shape[2])[None, :], (B, kq.shape[2]))
    else:
        # Ring cache: the caller reconstructs per-column absolute positions
        # (negative = never written).
        s_pos = k_positions
    if alibi_slopes is not None:
        # ALiBi: -slope_h * (t_pos - s_pos) on the logits (rope-free
        # models; see models/llama.py::mha_attention).
        sl = alibi_slopes.reshape(KV, group)
        dist = (t_pos[:, :, None] - s_pos[:, None, :]).astype(jnp.float32)
        scores = scores - sl[None, :, :, None, None] * dist[:, None, None]
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


# -- INT4 KV flash attention (KIVI scheme, round 4) ---------------------------


def _attn4_kernel(len_ref, q_ref, k_ref, kch_ref, v_ref, vs_ref,
                  kt_ref, kts_ref, vt_ref, vts_ref, *rest,
                  group, chunk, block_sp, lane, window, sm, softcap,
                  has_sinks, static_sinks, max_seq, has_alibi=False):
    """Flash attention over the KIVI int4 cache (models/kv_cache.py
    Int4KVCache): packed K/V nibbles for completed G-token chunks, K
    dequantized in VMEM with per-(chunk, channel) scales, V with per-token
    parity-split scales, plus an INT8 per-token TAIL holding positions
    [F, length) merged as one final online-softmax block.

    k_ref:   (1, HB, bs_p, Dh) int8 bytes — packed row r holds token 2r (low
             nibble) / 2r+1 (high); one S-grid block covers 2*bs_p tokens.
    kch_ref: (1, HB, n_g, Dh) f32 — the block's chunk-channel K scales
             (n_g = 2*bs_p / G). Expanded to a per-packed-row (bs_p, Dh)
             scale tile by a constant 0/1 selection dot, then multiplied
             into the extracted nibbles (per-channel scales cannot factor
             out of the Dh contraction the way per-token scales do).
    vs_ref:  (1, HB, 2, bs_p) f32 — parity-split per-token V scales.
    kt/vt:   (1, HB, G, Dh) int8 tails; kts/vts (1, HB, 1, G) f32 scales.

    i32 widen-then-shift nibble extraction is the only Mosaic-legal form
    (int8-vector shifts don't legalize; probed on-chip round 3).
    Variants (window / softcap / learned sinks) mirror _attn_kernel.
    """
    rest = list(rest)
    sink_ref = rest.pop(0) if has_sinks else None
    alibi_ref = rest.pop(0) if has_alibi else None
    o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    s = pl.program_id(2)
    HB, TG = q_ref.shape[1], q_ref.shape[2]
    G = chunk
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
    new_len = jnp.clip(len_ref[b, 1], 0, max_seq)
    frontier = (new_len // G) * G  # tokens >= frontier live in the tail

    def _online_update(scores, valid, p_scaled_halves, v_halves):
        """Shared online-softmax step: mask, rescale, accumulate."""
        scores = jnp.where(valid, scores, NEG_INF)
        m_old = m_ref[:, :TG, :1]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        pdims = (((2,), (1,)), ((0,), (0,)))
        pv = None
        for (lo, hi), vv in zip(p_scaled_halves(p), v_halves):
            term = jax.lax.dot_general(
                (lo * hi).astype(lane), vv, pdims,
                preferred_element_type=jnp.float32,
            )
            pv = term if pv is None else pv + term
        l_new = l_ref[:, :TG, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:, :TG] = acc_ref[:, :TG] * corr + pv
        m_ref[:, :TG] = jnp.broadcast_to(m_new, (HB, TG, m_ref.shape[2]))
        l_ref[:, :TG] = jnp.broadcast_to(l_new, (HB, TG, l_ref.shape[2]))

    # Quantized-region block: any packed token < frontier (and, windowed,
    # not entirely before the window).
    base = s * 2 * block_sp
    active = base < frontier
    if window > 0:
        lo_col = jnp.maximum(length - window + 1, 0)
        active &= (base + 2 * block_sp) > lo_col

    @pl.when(active)
    def _():
        q = q_ref[0].astype(lane)  # (HB, TG, Dh)
        ku = k_ref[0].astype(jnp.int32)  # (HB, bs_p, Dh)
        vu = v_ref[0].astype(jnp.int32)
        k_lo = ((ku << 28) >> 28).astype(lane)
        k_hi = ((ku << 24) >> 28).astype(lane)
        v_lo = ((vu << 28) >> 28).astype(lane)
        v_hi = ((vu << 24) >> 28).astype(lane)
        # Chunk-channel K scale tile: packed row r covers tokens 2r, 2r+1 —
        # both in block-local chunk r // (G/2); expand the n_g scale rows to
        # a (bs_p, Dh) tile with one constant selection dot (exact copy).
        n_g = kch_ref.shape[2]
        r_io = jax.lax.broadcasted_iota(jnp.int32, (HB, block_sp, n_g), 1)
        g_io = jax.lax.broadcasted_iota(jnp.int32, (HB, block_sp, n_g), 2)
        sel = (r_io // (G // 2) == g_io).astype(jnp.float32)
        s_tile = jax.lax.dot_general(
            sel, kch_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(lane)  # (HB, bs_p, Dh) — HIGHEST keeps the scale-row
        # copies exact (single-pass MXU f32 rounds to ~bf16)
        kd_lo = k_lo * s_tile
        kd_hi = k_hi * s_tile
        vs_e = vs_ref[0, :, 0, :].reshape(HB, 1, block_sp)
        vs_o = vs_ref[0, :, 1, :].reshape(HB, 1, block_sp)

        dims = (((2,), (2,)), ((0,), (0,)))
        s_lo = jax.lax.dot_general(
            q, kd_lo, dims, preferred_element_type=jnp.float32)
        s_hi = jax.lax.dot_general(
            q, kd_hi, dims, preferred_element_type=jnp.float32)
        scores = jnp.concatenate([s_lo, s_hi], axis=-1) * sm  # (HB, TG, 2bs_p)
        if softcap > 0.0:
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        t_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // group
        idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        # Column c < bs_p holds token 2*(s*bs_p + c); column bs_p + c holds
        # 2*(s*bs_p + c) + 1.
        pos = jnp.where(
            idx < block_sp,
            2 * (s * block_sp + idx),
            2 * (s * block_sp + idx - block_sp) + 1,
        )
        valid = (pos <= (length + t_rows)) & (pos < frontier)
        if window > 0:
            in_win = pos > (length + t_rows - window)
            if static_sinks > 0:
                in_win |= pos < static_sinks
            valid &= in_win
        if has_alibi:
            sl = alibi_ref[:, :TG, :1]  # (HB, TG, 1) per-query-row slopes
            scores = scores - sl * (length + t_rows - pos).astype(
                jnp.float32
            )
        _online_update(
            scores, valid,
            lambda p: [(p[:, :, :block_sp], vs_e), (p[:, :, block_sp:], vs_o)],
            [v_lo, v_hi],
        )

    # INT8 tail block — the 2G-row tail holds row j = latest position
    # ≡ j (mod 2G). Each query row reconstructs, per column, the largest
    # position <= its own horizon (length + t) congruent to that column:
    # that position is guaranteed written-and-latest because writes never
    # run more than 2G past the committed frontier (speculation depth <= G),
    # and positions below the frontier are served by the quantized region
    # (masked here to avoid double counting).
    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        q = q_ref[0].astype(lane)
        kt = kt_ref[0].astype(lane)  # (HB, 2G, Dh) int8 values, exact lanes
        kts = kts_ref[0]  # (HB, 1, 2G)
        vts = vts_ref[0]
        dims = (((2,), (2,)), ((0,), (0,)))
        scores = jax.lax.dot_general(
            q, kt, dims, preferred_element_type=jnp.float32) * kts * sm
        if softcap > 0.0:
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        t_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // group
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        horizon = length + t_rows
        pos = horizon - jnp.mod(horizon - col, 2 * G)
        valid = pos >= frontier
        if window > 0:
            in_win = pos > (length + t_rows - window)
            if static_sinks > 0:
                in_win |= pos < static_sinks
            valid &= in_win
        if has_alibi:
            sl = alibi_ref[:, :TG, :1]
            scores = scores - sl * (length + t_rows - pos).astype(
                jnp.float32
            )
        _online_update(
            scores, valid,
            lambda p: [(p, vts)],
            [vt_ref[0].astype(lane)],
        )
        o_ref[0] = (
            acc_ref[:, :TG] / jnp.maximum(l_ref[:, :TG, :1], 1e-30)
        ).astype(o_ref.dtype)


def _block4(S2: int, G: int, want: int = 256) -> int:
    """Largest S2-dividing packed block whose 2*bs_p token span is a
    multiple of the chunk size G."""
    for bs in (want, 128, 64, 32):
        if S2 % bs == 0 and bs <= S2 and (2 * bs) % G == 0:
            return bs
    return S2  # whole plane; 2*S2 = max_seq is a multiple of G by init


def _head_block4(KV: int, TG: int, Dh: int, bs_p: int, G: int,
                 budget: int = 10 << 20) -> int:
    """Largest divisor HB of KV fitting the KIVI kernel's VMEM footprint
    (dominated by the i32 nibble extracts and the f32/lane scale tile:
    ~16 bytes per packed (bs_p, Dh) element, plus tails and scores)."""
    for hb in range(KV, 0, -1):
        if KV % hb:
            continue
        tg8 = max(TG, 8)
        per = hb * (
            bs_p * Dh * 20          # packed k/v + i32 extracts + scale tile
            + 2 * G * Dh * 6        # tails int8 + lane copies
            + TG * Dh * 2           # q
            + 2 * TG * (2 * bs_p + G) * 4  # score/prob tiles
            + tg8 * (256 + Dh) * 4  # m/l/acc scratch
        )
        if 2 * per <= budget:
            return hb
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("group", "chunk", "t_q", "window", "scale", "softcap",
                     "interpret", "out_dtype"),
)
def _attend4(q, kq, kchs, vq, vs, kt, kts, vt, vts, lengths2, sink_rows,
             alibi_rows, *,
             group, chunk, t_q, window, scale, softcap, interpret, out_dtype):
    B, KV, TG, Dh = q.shape
    S2 = kq.shape[2]  # packed rows = tokens / 2
    G = chunk
    bs_p = _block4(S2, G)
    HB = _head_block4(KV, TG, Dh, bs_p, G)
    n_g = (2 * bs_p) // G
    sm = scale if scale > 0.0 else Dh**-0.5

    def s_eff(s, ln, b):
        # Quantized blocks only matter below the frontier (and, windowed,
        # above the window's first block): clamp dead fetches away.
        f = (jnp.clip(ln[b, 1], 0, 2 * S2) // G) * G
        hi = jnp.maximum(f - 1, 0) // (2 * bs_p)
        if window > 0:
            lo = jnp.maximum(ln[b, 0] - window + 1, 0) // (2 * bs_p)
            return jnp.clip(s, jnp.minimum(lo, hi), hi)
        return jnp.minimum(s, hi)

    def kv_index(b, h, s, ln):
        return (b, h, s_eff(s, ln, b), 0)

    def kch_index(b, h, s, ln):
        return (b, h, s_eff(s, ln, b), 0)

    def vscale_index(b, h, s, ln):
        return (b, h, 0, s_eff(s, ln, b))

    in_specs = [
        pl.BlockSpec((1, HB, TG, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, bs_p, Dh), kv_index),
        pl.BlockSpec((1, HB, n_g, Dh), kch_index),
        pl.BlockSpec((1, HB, bs_p, Dh), kv_index),
        pl.BlockSpec((1, HB, 2, bs_p), vscale_index),
        pl.BlockSpec((1, HB, 2 * G, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, 1, 2 * G), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, 2 * G, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, 1, 2 * G), lambda b, h, s, ln: (b, h, 0, 0)),
    ]
    operands = [lengths2, q, kq, kchs, vq, vs,
                kt, kts.reshape(B, KV, 1, 2 * G), vt,
                vts.reshape(B, KV, 1, 2 * G)]
    if sink_rows is not None:
        in_specs.append(
            pl.BlockSpec((HB, TG, 128), lambda b, h, s, ln: (h, 0, 0)))
        operands.append(sink_rows)
    if alibi_rows is not None:
        in_specs.append(
            pl.BlockSpec((HB, TG, 128), lambda b, h, s, ln: (h, 0, 0)))
        operands.append(alibi_rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KV // HB, S2 // bs_p),
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
        _attn4_kernel, group=group, chunk=G, block_sp=bs_p, lane=lane,
        window=window, sm=sm, softcap=softcap,
        has_sinks=sink_rows is not None, static_sinks=0, max_seq=2 * S2,
        has_alibi=alibi_rows is not None,
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


def int4_kv_attention(
    q: jnp.ndarray,  # [B, T, H, Dh] (post-RoPE)
    kq: jnp.ndarray,  # [B, KV, S/2, Dh] int8 PACKED K nibbles (Int4KVCache)
    kchs: jnp.ndarray,  # [B, KV, S/G, Dh] f32 chunk-channel K scales
    vq: jnp.ndarray,  # [B, KV, S/2, Dh] int8 packed V nibbles
    vs: jnp.ndarray,  # [B, KV, 2, S/2] f32 parity-split V scales
    ktail: jnp.ndarray,  # [B, KV, G, Dh] int8 tail K
    kts: jnp.ndarray,  # [B, KV, G] f32
    vtail: jnp.ndarray,
    vts: jnp.ndarray,
    lengths: jnp.ndarray,  # [B] int32 — length BEFORE this step's tokens
    new_lengths: jnp.ndarray,  # [B] int32 — length AFTER (tail frontier)
    *,
    group: int,
    window: int = 0,
    scale: float = 0.0,
    softcap: float = 0.0,
    sink_logits: jnp.ndarray | None = None,
    alibi_slopes: jnp.ndarray | None = None,  # [H] ALiBi slopes (BLOOM/MPT)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Flash attention over the KIVI int4 KV cache (matches
    Int4KVCache.dequant_fp + int8_kv_attention_xla within bf16-lane
    tolerance). Returns [B, T, H, Dh] in q.dtype."""
    if interpret is None:
        interpret = default_interpret()
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    grp = H // KV
    qh = q.reshape(B, T, KV, grp, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, KV, T * grp, Dh)
    sink_rows = None
    if sink_logits is not None:
        srow = jnp.broadcast_to(
            sink_logits.astype(jnp.float32).reshape(KV, 1, grp), (KV, T, grp)
        ).reshape(KV, T * grp)
        sink_rows = jnp.broadcast_to(srow[:, :, None], (KV, T * grp, 128))
    alibi_rows = None
    if alibi_slopes is not None:
        arow = jnp.broadcast_to(
            alibi_slopes.astype(jnp.float32).reshape(KV, 1, grp),
            (KV, T, grp),
        ).reshape(KV, T * grp)
        alibi_rows = jnp.broadcast_to(
            arow[:, :, None], (KV, T * grp, 128)
        )
    lengths2 = jnp.stack(
        [lengths.astype(jnp.int32), new_lengths.astype(jnp.int32)], axis=1
    )  # [B, 2]
    out = _attend4(
        qh, kq, kchs, vq, vs, ktail, kts, vtail, vts, lengths2, sink_rows,
        alibi_rows,
        group=grp, chunk=int(group), t_q=T, window=int(window),
        scale=float(scale), softcap=float(softcap), interpret=interpret,
        out_dtype=q.dtype,
    )
    return out.reshape(B, KV, T, grp, Dh).transpose(0, 2, 1, 3, 4).reshape(
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


# -- K4V8 mixed KV flash attention (round 5) ----------------------------------


def _attn_k4v8_kernel(len_ref, q_ref, k_ref, kch_ref, v_ref, vs_ref,
                      kt_ref, kts_ref, vt_ref, vts_ref, *rest,
                      group, chunk, block_sp, lane, window, sm, softcap,
                      has_sinks, static_sinks, max_seq, has_alibi=False):
    """Flash attention over the K4V8 cache (models/kv_cache.py
    K4V8KVCache): the int4 kernel's K side (packed chunk nibbles,
    per-(chunk, channel) scales, int8 tail) with the int8 kernel's V side
    (per-token int8 values + scales; a tail MIRROR serves the final block).

    k_ref:   (1, HB, bs_p, Dh) int8 packed K (row r = tokens 2r / 2r+1)
    kch_ref: (1, HB, n_g, Dh) f32 chunk-channel K scales
    v_ref:   (1, HB, 2*bs_p, Dh) int8 per-token V — natural token order
    vs_ref:  (1, HB, 1, 2*bs_p) f32 per-token V scales
    kt/kts:  (1, HB, 2G, Dh) int8 K tail + (1, HB, 1, 2G) scales
    vt/vts:  V tail mirror, same shapes

    Score columns come out of the K dequant in [even | odd] parity order;
    a constant 0/1 permutation dot (HIGHEST precision — exact copy) maps
    the probability tile back to natural token order before the single
    int8 V dot. Variants (window / softcap / sinks) mirror _attn4_kernel.
    """
    rest = list(rest)
    sink_ref = rest.pop(0) if has_sinks else None
    alibi_ref = rest.pop(0) if has_alibi else None
    o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    s = pl.program_id(2)
    HB, TG = q_ref.shape[1], q_ref.shape[2]
    G = chunk
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
    new_len = jnp.clip(len_ref[b, 1], 0, max_seq)
    frontier = (new_len // G) * G  # tokens >= frontier live in the tails

    def _online_update(scores, valid, p_to_pv):
        scores = jnp.where(valid, scores, NEG_INF)
        m_old = m_ref[:, :TG, :1]
        m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
        corr = jnp.exp(m_old - m_new)
        p = jnp.where(valid, jnp.exp(scores - m_new), 0.0)
        pv = p_to_pv(p)
        l_new = l_ref[:, :TG, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:, :TG] = acc_ref[:, :TG] * corr + pv
        m_ref[:, :TG] = jnp.broadcast_to(m_new, (HB, TG, m_ref.shape[2]))
        l_ref[:, :TG] = jnp.broadcast_to(l_new, (HB, TG, l_ref.shape[2]))

    base = s * 2 * block_sp
    active = base < frontier
    if window > 0:
        lo_col = jnp.maximum(length - window + 1, 0)
        active &= (base + 2 * block_sp) > lo_col

    @pl.when(active)
    def _():
        q = q_ref[0].astype(lane)  # (HB, TG, Dh)
        ku = k_ref[0].astype(jnp.int32)
        k_lo = ((ku << 28) >> 28).astype(lane)
        k_hi = ((ku << 24) >> 28).astype(lane)
        n_g = kch_ref.shape[2]
        r_io = jax.lax.broadcasted_iota(jnp.int32, (HB, block_sp, n_g), 1)
        g_io = jax.lax.broadcasted_iota(jnp.int32, (HB, block_sp, n_g), 2)
        sel = (r_io // (G // 2) == g_io).astype(jnp.float32)
        s_tile = jax.lax.dot_general(
            sel, kch_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(lane)  # exact scale-row copy (see _attn4_kernel)
        kd_lo = k_lo * s_tile
        kd_hi = k_hi * s_tile

        dims = (((2,), (2,)), ((0,), (0,)))
        s_lo = jax.lax.dot_general(
            q, kd_lo, dims, preferred_element_type=jnp.float32)
        s_hi = jax.lax.dot_general(
            q, kd_hi, dims, preferred_element_type=jnp.float32)
        scores = jnp.concatenate([s_lo, s_hi], axis=-1) * sm  # (HB,TG,2bs_p)
        if softcap > 0.0:
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        t_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // group
        idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        pos = jnp.where(
            idx < block_sp,
            2 * (s * block_sp + idx),
            2 * (s * block_sp + idx - block_sp) + 1,
        )
        valid = (pos <= (length + t_rows)) & (pos < frontier)
        if window > 0:
            in_win = pos > (length + t_rows - window)
            if static_sinks > 0:
                in_win |= pos < static_sinks
            valid &= in_win
        if has_alibi:
            sl = alibi_ref[:, :TG, :1]
            scores = scores - sl * (length + t_rows - pos).astype(
                jnp.float32
            )

        # Constant parity->token permutation: M[c, t] = 1 iff score col c
        # holds token-local index t (c < bs_p -> t = 2c; else t = 2(c-bs_p)+1).
        C = 2 * block_sp
        c_io = jax.lax.broadcasted_iota(jnp.int32, (C, C), 0)
        tl_io = jax.lax.broadcasted_iota(jnp.int32, (C, C), 1)
        tok_of_c = jnp.where(
            c_io < block_sp, 2 * c_io, 2 * (c_io - block_sp) + 1
        )
        perm = (tl_io == tok_of_c).astype(jnp.float32)

        def p_to_pv(p):
            p_tok = jax.lax.dot_general(
                p, perm, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (HB, TG, 2bs_p) natural order — exact 0/1 copy
            return jax.lax.dot_general(
                (p_tok * vs_ref[0]).astype(lane), v_ref[0].astype(lane),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        _online_update(scores, valid, p_to_pv)

    # INT8 tail block (K tail + V mirror; same masking as _attn4_kernel).
    @pl.when(s == pl.num_programs(2) - 1)
    def _():
        q = q_ref[0].astype(lane)
        kt = kt_ref[0].astype(lane)
        kts = kts_ref[0]
        dims = (((2,), (2,)), ((0,), (0,)))
        scores = jax.lax.dot_general(
            q, kt, dims, preferred_element_type=jnp.float32) * kts * sm
        if softcap > 0.0:
            scores = softcap * jnp.tanh(scores * (1.0 / softcap))
        t_rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) // group
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
        horizon = length + t_rows
        pos = horizon - jnp.mod(horizon - col, 2 * G)
        valid = pos >= frontier
        if window > 0:
            in_win = pos > (length + t_rows - window)
            if static_sinks > 0:
                in_win |= pos < static_sinks
            valid &= in_win
        if has_alibi:
            sl = alibi_ref[:, :TG, :1]
            scores = scores - sl * (length + t_rows - pos).astype(
                jnp.float32
            )

        def p_to_pv(p):
            return jax.lax.dot_general(
                (p * vts_ref[0]).astype(lane), vt_ref[0].astype(lane),
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )

        _online_update(scores, valid, p_to_pv)
        o_ref[0] = (
            acc_ref[:, :TG] / jnp.maximum(l_ref[:, :TG, :1], 1e-30)
        ).astype(o_ref.dtype)


def _head_block_k4v8(KV: int, TG: int, Dh: int, bs_p: int, G: int,
                     budget: int = 10 << 20) -> int:
    """VMEM-fitting head block for the K4V8 kernel: the int4 kernel's K
    footprint + the int8 V block (2*bs_p rows) + the (2bs_p)^2 f32
    permutation tile."""
    for hb in range(KV, 0, -1):
        if KV % hb:
            continue
        tg8 = max(TG, 8)
        per = hb * (
            bs_p * Dh * 16          # packed k + i32 extracts + scale tile
            + 2 * bs_p * Dh * 3     # int8 V block + lane copy
            + 4 * G * Dh * 6        # tails int8 + lane copies (2 x 2G)
            + TG * Dh * 2           # q
            + 3 * TG * (2 * bs_p + 2 * G) * 4  # score/prob/perm tiles
            + tg8 * (256 + Dh) * 4  # m/l/acc scratch
        ) + (2 * bs_p) * (2 * bs_p) * 4
        if 2 * per <= budget:
            return hb
    return 1


@functools.partial(
    jax.jit,
    static_argnames=("group", "chunk", "t_q", "window", "scale", "softcap",
                     "interpret", "out_dtype"),
)
def _attend_k4v8(q, kq, kchs, vq, vs, kt, kts, vt, vts, lengths2, sink_rows,
                 alibi_rows,
                 *, group, chunk, t_q, window, scale, softcap, interpret,
                 out_dtype):
    B, KV, TG, Dh = q.shape
    S2 = kq.shape[2]  # packed K rows = tokens / 2
    G = chunk
    bs_p = _block4(S2, G)
    HB = _head_block_k4v8(KV, TG, Dh, bs_p, G)
    n_g = (2 * bs_p) // G
    sm = scale if scale > 0.0 else Dh**-0.5

    def s_eff(s, ln, b):
        f = (jnp.clip(ln[b, 1], 0, 2 * S2) // G) * G
        hi = jnp.maximum(f - 1, 0) // (2 * bs_p)
        if window > 0:
            lo = jnp.maximum(ln[b, 0] - window + 1, 0) // (2 * bs_p)
            return jnp.clip(s, jnp.minimum(lo, hi), hi)
        return jnp.minimum(s, hi)

    def k_index(b, h, s, ln):
        return (b, h, s_eff(s, ln, b), 0)

    def vscale_index(b, h, s, ln):
        return (b, h, 0, s_eff(s, ln, b))

    in_specs = [
        pl.BlockSpec((1, HB, TG, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, bs_p, Dh), k_index),
        pl.BlockSpec((1, HB, n_g, Dh), k_index),
        pl.BlockSpec((1, HB, 2 * bs_p, Dh), k_index),   # V natural order
        pl.BlockSpec((1, HB, 1, 2 * bs_p), vscale_index),
        pl.BlockSpec((1, HB, 2 * G, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, 1, 2 * G), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, 2 * G, Dh), lambda b, h, s, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, 1, 2 * G), lambda b, h, s, ln: (b, h, 0, 0)),
    ]
    operands = [lengths2, q, kq, kchs, vq,
                vs.reshape(B, KV, 1, 2 * S2),
                kt, kts.reshape(B, KV, 1, 2 * G), vt,
                vts.reshape(B, KV, 1, 2 * G)]
    if sink_rows is not None:
        in_specs.append(
            pl.BlockSpec((HB, TG, 128), lambda b, h, s, ln: (h, 0, 0)))
        operands.append(sink_rows)
    if alibi_rows is not None:
        in_specs.append(
            pl.BlockSpec((HB, TG, 128), lambda b, h, s, ln: (h, 0, 0)))
        operands.append(alibi_rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, KV // HB, S2 // bs_p),
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
        _attn_k4v8_kernel, group=group, chunk=G, block_sp=bs_p, lane=lane,
        window=window, sm=sm, softcap=softcap,
        has_sinks=sink_rows is not None, static_sinks=0, max_seq=2 * S2,
        has_alibi=alibi_rows is not None,
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


def k4v8_attention(
    q: jnp.ndarray,  # [B, T, H, Dh] (post-RoPE)
    kq: jnp.ndarray,  # [B, KV, S/2, Dh] int8 PACKED K nibbles
    kchs: jnp.ndarray,  # [B, KV, S/G, Dh] f32 chunk-channel K scales
    vq: jnp.ndarray,  # [B, KV, S, Dh] int8 per-token V
    vs: jnp.ndarray,  # [B, KV, S] f32 per-token V scales
    ktail: jnp.ndarray,  # [B, KV, 2G, Dh] int8 K tail
    kts: jnp.ndarray,  # [B, KV, 2G] f32
    vtail: jnp.ndarray,  # [B, KV, 2G, Dh] int8 V tail mirror
    vts: jnp.ndarray,  # [B, KV, 2G] f32
    lengths: jnp.ndarray,  # [B] int32 — length BEFORE this step's tokens
    new_lengths: jnp.ndarray,  # [B] int32 — length AFTER (tail frontier)
    *,
    group: int,
    window: int = 0,
    scale: float = 0.0,
    softcap: float = 0.0,
    sink_logits: jnp.ndarray | None = None,
    alibi_slopes: jnp.ndarray | None = None,  # [H] ALiBi slopes (BLOOM/MPT)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Flash attention over the K4V8 cache (matches K4V8KVCache.dequant_fp
    + int8_kv_attention_xla within bf16-lane tolerance)."""
    if interpret is None:
        interpret = default_interpret()
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    grp = H // KV
    qh = q.reshape(B, T, KV, grp, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, KV, T * grp, Dh)
    sink_rows = None
    if sink_logits is not None:
        srow = jnp.broadcast_to(
            sink_logits.astype(jnp.float32).reshape(KV, 1, grp), (KV, T, grp)
        ).reshape(KV, T * grp)
        sink_rows = jnp.broadcast_to(srow[:, :, None], (KV, T * grp, 128))
    alibi_rows = None
    if alibi_slopes is not None:
        arow = jnp.broadcast_to(
            alibi_slopes.astype(jnp.float32).reshape(KV, 1, grp),
            (KV, T, grp),
        ).reshape(KV, T * grp)
        alibi_rows = jnp.broadcast_to(
            arow[:, :, None], (KV, T * grp, 128)
        )
    lengths2 = jnp.stack(
        [lengths.astype(jnp.int32), new_lengths.astype(jnp.int32)], axis=1
    )
    out = _attend_k4v8(
        qh, kq, kchs, vq, vs, ktail, kts, vtail, vts, lengths2, sink_rows,
        alibi_rows,
        group=grp, chunk=int(group), t_q=T, window=int(window),
        scale=float(scale), softcap=float(softcap), interpret=interpret,
        out_dtype=q.dtype,
    )
    return out.reshape(B, KV, T, grp, Dh).transpose(0, 2, 1, 3, 4).reshape(
        B, T, H, Dh)
