"""Long-context / sequence parallelism (SURVEY.md §5.7; M7).

Three modes over a mesh axis of size cp:

* ``cp_int8_attend_decode`` — context-parallel decode: the INT8 KV cache is
  sharded over the sequence axis (each chip holds S/cp tokens — int8 on the
  wire and in HBM); every chip computes attention partials over its shard
  and the global softmax is assembled with a log-sum-exp merge (pmax/psum
  over ICI). Exact (up to fp) vs single-device attention.

* ``ring_attention`` — blockwise-parallel prefill: q/k/v sharded over
  sequence; KV blocks rotate around the ring via ppermute while each chip
  accumulates online-softmax partials. ICI traffic overlaps with the next
  block's matmul (XLA async collective permute).

* ``ulysses_attention`` — all_to_all reshard seq<->heads around attention:
  cheap when head count >= axis size and context is moderate.

All functions run inside shard_map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _partials(q, k, v, mask):
    """Unnormalized attention partials for a KV block.

    q: [B, T, KV, G, Dh] f32; k/v: [B, KV, S, Dh] f32; mask: [B, 1, 1, T, S].
    Returns (o_hat [B,T,KV,G,Dh], m [B,1,1,T,1]->broadcast shape, l).
    """
    dh = q.shape[-1]
    scores = jnp.einsum("btkgd,bksd->bkgts", q, k) / jnp.sqrt(dh)
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)  # [B,KV,G,T,1]
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o_hat = jnp.einsum("bkgts,bksd->bkgtd", p, v)
    return o_hat, m, l


def _partials_scaled(q, k, v, ks, vs, mask):
    """_partials with per-key scales factorized out of the dots.

    k/v are bare int8 casts; ks/vs [B, KV, S] multiply scores/probs once.
    """
    dh = q.shape[-1]
    scores = jnp.einsum("btkgd,bksd->bkgts", q, k) / jnp.sqrt(dh)
    scores = scores * ks[:, :, None, None, :]
    scores = jnp.where(mask, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o_hat = jnp.einsum("bkgts,bksd->bkgtd", p * vs[:, :, None, None, :], v)
    return o_hat, m, l


def _merge_two(a, b):
    """Merge two (o_hat, m, l) partial triples."""
    o1, m1, l1 = a
    o2, m2, l2 = b
    m = jnp.maximum(m1, m2)
    c1 = jnp.exp(m1 - m)
    c2 = jnp.exp(m2 - m)
    return o1 * c1[..., 0][..., None] + o2 * c2[..., 0][..., None], m, l1 * c1 + l2 * c2


def local_valid_lengths(global_lengths, axis, s_local):
    """Tokens of each sequence resident on this shard (contiguous layout)."""
    r = jax.lax.axis_index(axis)
    return jnp.clip(global_lengths - r * s_local, 0, s_local)


def cp_int8_attend_decode(q, kq, ks, vq, vs, global_lengths, axis):
    """Context-parallel int8-KV decode attention.

    q: [B, T, H, Dh] (replicated over ``axis``); kq/vq: local shard
    [B, KV, S_local, Dh] int8 (+ scales [B, KV, S_local]); global_lengths:
    [B] *pre-update* global cache lengths. The cache must already contain
    this step's tokens on the owning shard (update before attend, as usual).
    Returns [B, T, H, Dh] replicated.
    """
    B, T, H, Dh = q.shape
    KV = kq.shape[1]
    G = H // KV
    s_local = kq.shape[2]
    r = jax.lax.axis_index(axis)

    # Rank-1 scale factorization (same exact form as int8_kv_attention_xla):
    # the int8 payload hits the dots as a bare cast; the [S]-scales touch the
    # scores/probs once — no elementwise f32 dequant copy of the shard.
    qf = q.reshape(B, T, KV, G, Dh).astype(jnp.float32)
    kf = kq.astype(jnp.float32)
    vf = vq.astype(jnp.float32)

    # Global key positions of this shard's slots.
    s_pos = r * s_local + jnp.arange(s_local)
    t_pos = global_lengths[:, None] + jnp.arange(T)[None, :]
    mask = s_pos[None, None, None, None, :] <= t_pos[:, None, None, :, None]

    o_hat, m, l = _partials_scaled(qf, kf, vf, ks, vs, mask)

    # Log-sum-exp merge across shards (a fully-masked shard contributes
    # m=NEG_INF, exp(m-mg)=0 — harmless).
    m_g = jax.lax.pmax(m, axis)
    c = jnp.exp(m - m_g)
    l_g = jax.lax.psum(l * c, axis)
    o_g = jax.lax.psum(o_hat * c[..., 0][..., None], axis)
    out = o_g / jnp.maximum(l_g[..., 0][..., None], 1e-30)
    return (
        out.transpose(0, 3, 1, 2, 4).reshape(B, T, H, Dh).astype(q.dtype)
    )


def ring_attention(q, k, v, q_positions, axis, cp):
    """Ring (blockwise-parallel) causal attention for prefill.

    All of q [B, T_l, H, Dh], k/v [B, T_l, KV, Dh] are sequence-sharded
    (T_l = T/cp, contiguous blocks in ring order); q_positions [B, T_l] are
    this shard's absolute positions. KV blocks rotate cp-1 hops; each hop's
    ppermute overlaps the next partial matmul. Returns local attention
    output [B, T_l, H, Dh].
    """
    B, T_l, H, Dh = q.shape
    KV = k.shape[2]
    G = H // KV
    r = jax.lax.axis_index(axis)
    perm = [(i, (i + 1) % cp) for i in range(cp)]

    qf = q.reshape(B, T_l, KV, G, Dh).astype(jnp.float32)
    block = (
        k.astype(jnp.float32),
        v.astype(jnp.float32),
        jnp.broadcast_to(q_positions, (B, T_l)),  # block's absolute positions
    )

    acc = None
    for step in range(cp):
        kf, vf, k_pos = block
        kf_t = kf.transpose(0, 2, 1, 3)  # [B, KV, S_b, Dh]
        vf_t = vf.transpose(0, 2, 1, 3)
        mask = k_pos[:, None, None, None, :] <= q_positions[:, None, None, :, None]
        part = _partials(qf, kf_t, vf_t, mask)
        acc = part if acc is None else _merge_two(acc, part)
        if step + 1 < cp:
            block = jax.lax.ppermute(block, axis, perm)

    o_hat, m, l = acc
    out = o_hat / jnp.maximum(l[..., 0][..., None], 1e-30)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T_l, H, Dh).astype(q.dtype)


def ulysses_attention(q, k, v, q_positions_full, axis, sp):
    """Ulysses: all_to_all seq-sharded q/k/v into head-sharded, run full
    attention locally, reshard back.

    q: [B, T_l, H, Dh] seq-sharded; returns same layout. H must divide by sp.
    q_positions_full: [B, T] absolute positions of the FULL sequence
    (replicated), used for causal masking after the gather.
    """
    B, T_l, H, Dh = q.shape
    KV = k.shape[2]

    # seq-shard -> head-shard: [B, T, H/sp, Dh]
    def to_heads(x, n_heads):
        # split heads into sp groups along axis 2, all_to_all over seq axis 1
        xs = x.reshape(B, T_l, sp, n_heads // sp, Dh)
        xs = jax.lax.all_to_all(xs, axis, split_axis=2, concat_axis=1, tiled=True)
        return xs.reshape(B, T_l * sp, n_heads // sp, Dh)

    qh = to_heads(q, H)
    kh = to_heads(k, KV)
    vh = to_heads(v, KV)

    from ..models.llama import mha_attention

    key_pos = q_positions_full
    out = mha_attention(qh, kh, vh, q_positions_full, key_pos)  # [B, T, H/sp, Dh]

    # head-shard -> seq-shard
    os = out.reshape(B, sp, T_l, H // sp, Dh)
    os = jax.lax.all_to_all(os, axis, split_axis=1, concat_axis=3, tiled=True)
    return os.reshape(B, T_l, H, Dh).astype(q.dtype)
