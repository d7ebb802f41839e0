"""KV-cache containers (components A1: INT8 KV-cache with per-token/head
scales; plus the bf16 baseline layout).

Both are registered pytrees with *per-slot* lengths [B] so the same cache
serves single-request generation and the continuous-batching engine (slots
advance independently). Cache classes own their update + attention logic so
the model tier is cache-layout-agnostic:

    out, new_cache = cache.update_and_attend(q, k, v)

* ``BF16KVCache``: dense [B, S, KV, Dh] bf16 — the baseline the int8 cache is
  benchmarked against.
* ``Int8KVCache``: [B, KV, S, Dh] int8 payload + [B, KV, S] f32 per-token/
  per-head symmetric scales (head-major so the Pallas flash-decode kernel
  reads one contiguous (S, Dh) row per (batch, kv-head) program). Attention
  dequantizes in-kernel (ops/attention.py) — the int8 cache is never
  materialized as fp in HBM.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.numerics import QMAX, SCALE_EPS
from ..ops.attention import int8_kv_attention, int8_kv_attention_xla


def _write_positions(lengths: jnp.ndarray, t: int):
    """Scatter indices: batch [B,1] and per-token slot positions [B,T]."""
    b_idx = jnp.arange(lengths.shape[0])[:, None]
    s_idx = lengths[:, None] + jnp.arange(t)[None, :]
    return b_idx, s_idx


class _DenseSlotViews:
    """Slot slicing for caches whose every array is batch-major (the engine
    prefills one slot at a time against the full batched cache)."""

    def slot_view(self, slot):
        return jax.tree_util.tree_map(
            lambda a: jax.lax.dynamic_slice_in_dim(a, slot, 1, 0), self
        )

    def merge_slot(self, small, slot):
        return jax.tree_util.tree_map(
            lambda b, s: jax.lax.dynamic_update_slice_in_dim(b, s, slot, 0),
            self,
            small,
        )

    def advance(self, adv):
        """Commit ``adv`` [B] already-written positions (speculative
        acceptance): for most caches a pure length bump — the K/V rows were
        written by the scoring forward with advance=0. Int4KVCache overrides
        this to also flush any chunk the commit completes."""
        return dataclasses.replace(self, lengths=self.lengths + adv)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "lengths"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class BF16KVCache(_DenseSlotViews):
    """k/v: [B, S, KV, Dh]; lengths: [B] int32 (valid tokens per slot)."""

    k: jnp.ndarray
    v: jnp.ndarray
    lengths: jnp.ndarray

    @classmethod
    def init(cls, batch, max_seq, kv_heads, head_dim, dtype=jnp.bfloat16):
        shape = (batch, max_seq, kv_heads, head_dim)
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self):
        return self.k.shape[1]

    def update_and_attend(self, q, k, v, advance=None, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          sink_logits=None, tree_mask=None,
                          alibi_slopes=None):
        """q: [B,T,H,Dh]; k/v: [B,T,KV,Dh] (post-RoPE). Returns (out, cache).

        ``advance`` [B] overrides how far each slot's length moves (defaults
        to T); the engine uses it for padded prefill and inactive slots.
        ``window`` > 0 applies sliding-window masking; ``scale``/``softcap``
        override score scaling / apply Gemma-2 logit capping;
        ``sink_logits`` [H] joins GPT-OSS learned sinks to every softmax;
        ``tree_mask`` [T, T] replaces in-window causality with a candidate-
        tree ancestor relation (tree speculation; see engine docstrings).
        """
        B, T = k.shape[:2]
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        b_idx, s_idx = _write_positions(self.lengths, T)
        k_all = self.k.at[b_idx, s_idx].set(k.astype(self.k.dtype))
        v_all = self.v.at[b_idx, s_idx].set(v.astype(self.v.dtype))
        new = BF16KVCache(k=k_all, v=v_all, lengths=self.lengths + adv)

        q_pos = self.lengths[:, None] + jnp.arange(T)[None, :]
        key_pos = jnp.broadcast_to(jnp.arange(self.max_seq)[None, :], (B, self.max_seq))
        from .llama import mha_attention  # local import to avoid cycle

        out = mha_attention(
            q, k_all, v_all, q_pos, key_pos, window=window, scale=scale,
            softcap=softcap, sink_logits=sink_logits, tree_mask=tree_mask,
            alibi_slopes=alibi_slopes,
        )
        return out, new

    def reorder_tail(self, node_idx):
        """Tree-speculation commit: copy the rows written for candidate
        nodes ``node_idx`` [B, d] (at slots lengths + node_idx) into the
        CONTIGUOUS slots lengths+1..lengths+d — the accepted branch becomes
        an ordinary chain, exactly as if it had been decoded sequentially.
        (Row at lengths+0 is the shared root and already in place.)"""
        B, d = node_idx.shape
        b_idx = jnp.arange(B)[:, None]
        src = self.lengths[:, None] + node_idx
        dst = self.lengths[:, None] + 1 + jnp.arange(d)[None, :]
        k_rows = self.k[b_idx, src]  # [B, d, KV, Dh]
        v_rows = self.v[b_idx, src]
        return dataclasses.replace(
            self,
            k=self.k.at[b_idx, dst].set(k_rows),
            v=self.v.at[b_idx, dst].set(v_rows),
        )

    def reset_slot(self, slot: jnp.ndarray):
        return dataclasses.replace(self, lengths=self.lengths.at[slot].set(0))


# "auto" | "xla" | "pallas" (see Int8KVCache.update_and_attend). auto routes
# to the head-blocked Pallas flash kernel on TPU — measured 2.3x faster than
# the XLA-fused formulation at decode (B=8, KV=32, S=2048: 138us vs 320us,
# ~1.0 of HBM bandwidth on both cache streams; bench/flash_hb_probe.py) —
# and to the XLA formulation off-TPU (interpret-mode Pallas is test-only).
ATTENTION_BACKEND = "auto"


def _resolve_attention_backend() -> str:
    mode = ATTENTION_BACKEND
    if mode == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    return mode


def quantize_kv(x: jnp.ndarray):
    """Per-token/per-head symmetric int8: x [B, T, KV, Dh] ->
    (q int8 same shape, scale f32 [B, T, KV])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / QMAX, SCALE_EPS)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -QMAX, QMAX).astype(jnp.int8)
    return q, scale


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "ks", "vq", "vs", "lengths"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Int8KVCache(_DenseSlotViews):
    """kq/vq: [B, KV, S, Dh] int8; ks/vs: [B, KV, S] f32; lengths: [B]."""

    kq: jnp.ndarray
    ks: jnp.ndarray
    vq: jnp.ndarray
    vs: jnp.ndarray
    lengths: jnp.ndarray

    @classmethod
    def init(cls, batch, max_seq, kv_heads, head_dim):
        return cls(
            kq=jnp.zeros((batch, kv_heads, max_seq, head_dim), jnp.int8),
            ks=jnp.full((batch, kv_heads, max_seq), SCALE_EPS, jnp.float32),
            vq=jnp.zeros((batch, kv_heads, max_seq, head_dim), jnp.int8),
            vs=jnp.full((batch, kv_heads, max_seq), SCALE_EPS, jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self):
        return self.kq.shape[2]

    def update(self, k, v, advance=None):
        """Quantize and append k/v [B, T, KV, Dh] at each slot's length.

        ``advance`` [B] overrides the per-slot length increment (default T):
        padded prefill advances only by the true prompt length, so pad
        entries sit beyond ``lengths`` and are masked, then overwritten
        one-by-one as real tokens arrive.
        """
        B, T = k.shape[:2]
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        k8, ks_new = quantize_kv(k)
        v8, vs_new = quantize_kv(v)
        if T == 1 and _resolve_attention_backend() == "pallas":
            # Decode: in-place Pallas scatter. The XLA scatter below is also
            # in-place in isolation, but XLA wraps it in full-cache defensive
            # copies when the result feeds the Pallas attend custom call
            # (~236us/step at B=8,KV=32,S=2048 — bench/kv_update_probe.py);
            # the aliased kernel pins the buffer instead.
            from ..ops._common import default_interpret
            from ..ops.kv_scatter import kv_scatter_decode

            kq, ks, vq, vs = kv_scatter_decode(
                self.kq, self.ks, self.vq, self.vs, self.lengths,
                jnp.swapaxes(k8, 1, 2), jnp.swapaxes(ks_new, 1, 2),
                jnp.swapaxes(v8, 1, 2), jnp.swapaxes(vs_new, 1, 2),
                interpret=default_interpret(),
            )
            return Int8KVCache(kq=kq, ks=ks, vq=vq, vs=vs,
                               lengths=self.lengths + adv)
        b_idx, s_idx = _write_positions(self.lengths, T)
        # Cache layout is head-major: advanced indices (b, s) land in front,
        # so the scattered block is [B, T, KV, Dh] — matching k8 directly.
        kq = self.kq.at[b_idx, :, s_idx].set(k8)
        vq = self.vq.at[b_idx, :, s_idx].set(v8)
        ks = self.ks.at[b_idx, :, s_idx].set(ks_new)
        vs = self.vs.at[b_idx, :, s_idx].set(vs_new)
        return Int8KVCache(kq=kq, ks=ks, vq=vq, vs=vs, lengths=self.lengths + adv)

    # Attention backend resolved via ATTENTION_BACKEND (auto: head-blocked
    # Pallas flash kernel on TPU — 2.3x the XLA formulation at decode —
    # XLA off-TPU). Module-level so jitted model code picks it up at trace
    # time.
    def update_and_attend(self, q, k, v, advance=None, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          sink_logits=None, tree_mask=None,
                          alibi_slopes=None):
        new = self.update(k, v, advance)
        # The flash kernel covers every dense-cache attention variant:
        # sliding window (with block skipping — windowed decode reads
        # O(window) cache bytes, not O(S)), Gemma query scaling, Gemma-2
        # softcap, GPT-OSS learned sinks. All exact vs the XLA formulation
        # (tests/test_attention.py variant parametrization). Tree-masked
        # scoring (T = tree width, once per speculative tick) runs the XLA
        # formulation; decode steps dominate and keep the kernel.
        if tree_mask is None and _resolve_attention_backend() == "pallas":
            out = int8_kv_attention(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths,
                window=window, scale=scale, softcap=softcap,
                sink_logits=sink_logits, alibi_slopes=alibi_slopes,
            )
        else:
            out = int8_kv_attention_xla(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths,
                window=window, scale=scale, softcap=softcap,
                sink_logits=sink_logits, tree_mask=tree_mask,
                alibi_slopes=alibi_slopes,
            )
        return out, new

    def reorder_tail(self, node_idx):
        """Tree-speculation commit (see BF16KVCache.reorder_tail): payloads
        AND their per-token scales move together; layout [B, KV, S, Dh]."""
        B, d = node_idx.shape
        b_idx = jnp.arange(B)[:, None]
        src = self.lengths[:, None] + node_idx  # [B, d]
        dst = self.lengths[:, None] + 1 + jnp.arange(d)[None, :]
        tk = jnp.take_along_axis
        kq_r = tk(self.kq, src[:, None, :, None], axis=2)  # [B, KV, d, Dh]
        vq_r = tk(self.vq, src[:, None, :, None], axis=2)
        ks_r = tk(self.ks, src[:, None, :], axis=2)  # [B, KV, d]
        vs_r = tk(self.vs, src[:, None, :], axis=2)
        kv = self.kq.shape[1]
        kv_idx = jnp.arange(kv)[None, :, None]
        b3 = jnp.arange(B)[:, None, None]
        dst3 = dst[:, None, :]
        return dataclasses.replace(
            self,
            kq=self.kq.at[b3, kv_idx, dst3].set(kq_r),
            vq=self.vq.at[b3, kv_idx, dst3].set(vq_r),
            ks=self.ks.at[b3, kv_idx, dst3].set(ks_r),
            vs=self.vs.at[b3, kv_idx, dst3].set(vs_r),
        )

    def reset_slot(self, slot: jnp.ndarray):
        """Zero one slot's length (the payload is masked by length anyway)."""
        return dataclasses.replace(self, lengths=self.lengths.at[slot].set(0))




def quantize_kv4(x: jnp.ndarray):
    """Per-token/per-head symmetric int4: x [B, T, KV, Dh] ->
    (nibbles as int8 in [-7, 7] — UNPACKED, packing is the cache's job —
    and scale f32 [B, T, KV]). Used by MixedKVCache's V side; the KIVI
    Int4KVCache below quantizes K per-(chunk, channel) instead."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / 7.0, SCALE_EPS)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -7, 7).astype(jnp.int8)
    return q, scale


def _pack_nib_pair(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Two int8 nibble values in [-8, 7] -> one byte (lo in bits 0-3, hi in
    bits 4-7; two's-complement nibbles)."""
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)


# Default KIVI chunk size (tokens per per-channel K scale group). 64 matches
# the KIVI paper's quality sweet spot and keeps scale overhead at 12.5% of
# payload (f32 Dh per 64 tokens x Dh/2 bytes). Tests lower it to force chunk
# boundaries on tiny caches.
INT4_KV_GROUP = 64


def kivi_chunk_quantize(k8c, ksc, v8c, vsc):
    """Requantize one complete G-token chunk from its int8 tail values:
    K per-(chunk, channel), V per-token; pack token-pair nibbles.

    k8c/v8c: [B, KV, G, Dh] int8;  ksc/vsc: [B, KV, G] f32.
    Returns (packed_k [B, KV, G/2, Dh] int8, s_ch [B, KV, Dh] f32,
             packed_v, s_v [B, KV, G] f32).

    SHARED by the prefill (XLA scatter) and decode (aliased Pallas writer)
    paths — with optimization barriers between the dequant products, the
    amax, and the requant division, so XLA cannot reassociate the constant
    /7 into the products differently per surrounding program (observed: a
    1-ulp scale drift between the jitted decode path and the eager prefill
    path that would break prefill==decode bit-equality)."""
    barrier = jax.lax.optimization_barrier
    kf = k8c.astype(jnp.float32) * ksc[..., None]  # [B, KV, G, Dh]
    vf = v8c.astype(jnp.float32) * vsc[..., None]
    kf, vf = barrier((kf, vf))
    # amax * (1/7), NOT amax / 7: XLA:CPU rewrites division by a scalar
    # constant into a reciprocal multiply under jit but not in eager ops —
    # a 1-ulp scale drift that broke prefill==decode bit-equality (probed
    # this round). An explicit reciprocal-constant multiply is deterministic
    # in every program context. Tensor-by-tensor division (below) is not
    # rewritten and stays exact.
    inv7 = jnp.float32(1.0 / 7.0)
    s_ch = jnp.maximum(jnp.max(jnp.abs(kf), axis=2) * inv7, SCALE_EPS)
    s_v = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1) * inv7, SCALE_EPS)
    s_ch, s_v = barrier((s_ch, s_v))
    k_nib = jnp.clip(jnp.round(kf / s_ch[:, :, None]), -7, 7).astype(jnp.int32)
    v_nib = jnp.clip(jnp.round(vf / s_v[..., None]), -7, 7).astype(jnp.int32)
    packed_k = _pack_nib_pair(k_nib[:, :, 0::2], k_nib[:, :, 1::2])
    packed_v = _pack_nib_pair(v_nib[:, :, 0::2], v_nib[:, :, 1::2])
    return packed_k, s_ch, packed_v, s_v


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "kchs", "vq", "vs", "ktail", "kts", "vtail", "vts",
                 "lengths"],
    meta_fields=["group"],
)
@dataclasses.dataclass(frozen=True)
class Int4KVCache(_DenseSlotViews):
    """KIVI-style INT4 KV cache (round 4 — replaces the round-3 per-token
    K-scale scheme whose greedy-match collapsed; VERDICT r3 item 1).

    Keys are quantized per-(token-chunk, channel): channel magnitudes are
    consistent across tokens (the K outlier channels every KIVI-family paper
    measures), so a per-channel scale over a G-token chunk loses far less
    signal than a per-token scale across Dh channels. Values stay per-token
    (the softmax average forgives coarse value steps; per-token is the
    KIVI-recommended V axis). Both K and V keep the most recent tokens in an
    INT8 per-token TAIL — the unquantized residual: recent tokens carry the
    highest attention weights, and chunk scales can only be computed once
    the chunk is complete.

    Layout (G = ``group`` tokens per chunk; F = (length // G) * G):
      kq    [B, KV, S/2, Dh] int8 — packed K nibbles of COMPLETED chunks
            (row r: token 2r low nibble, 2r+1 high; positions < F)
      kchs  [B, KV, S/G, Dh] f32 — per-chunk per-CHANNEL K scales
      vq    [B, KV, S/2, Dh] int8 — packed V nibbles (positions < F)
      vs    [B, KV, 2, S/2] f32 — per-token V scales, parity-split
      ktail/vtail [B, KV, 2G, Dh] int8 — tail row j holds the latest token
            with position ≡ j (mod 2G); live rows are [F, length) at
            contiguous rows starting from F % 2G (which is 0 or G)
      kts/vts     [B, KV, 2G] f32 — per-token tail scales

    The tail is TWO chunks deep so a speculative rollback of up to G tokens
    is always safe: a flush never erases tail rows (they persist until a
    token G..2G positions later reuses them), so rewinding ``lengths`` past
    a flushed boundary re-exposes correct int8 data and the stale chunk
    re-flushes bit-identically when positions re-advance.

    Every incoming token is first quantized to per-token int8 and appended
    to the tail; when a chunk completes, its G tokens are re-quantized FROM
    the int8 tail values (K: per-channel amax over the chunk; V: per-token)
    and packed — so chunked prefill and token-by-token decode produce
    bit-identical cache state for the same history. Rollbacks (speculative
    decoding) are free: tail rows persist after a flush, so rewinding
    ``lengths`` re-exposes the correct int8 tail data and the stale chunk is
    re-flushed when positions re-advance.

    Attention: the flash kernel (ops/attention.py int4_kv_attention)
    dequantizes K blocks in VMEM with the chunk-channel scales and merges
    the int8 tail as a final online-softmax block. Supports sliding window /
    softcap / learned sinks like the int8 kernel.
    """

    kq: jnp.ndarray
    kchs: jnp.ndarray
    vq: jnp.ndarray
    vs: jnp.ndarray
    ktail: jnp.ndarray
    kts: jnp.ndarray
    vtail: jnp.ndarray
    vts: jnp.ndarray
    lengths: jnp.ndarray
    group: int = 64

    @classmethod
    def init(cls, batch, max_seq, kv_heads, head_dim, group: int | None = None):
        if group is None:
            group = INT4_KV_GROUP
        group = min(group, max_seq)
        if max_seq % group or group % 2:
            raise ValueError(
                f"int4 KV needs max_seq % group == 0 and even group "
                f"(max_seq={max_seq}, group={group})"
            )
        return cls(
            kq=jnp.zeros((batch, kv_heads, max_seq // 2, head_dim), jnp.int8),
            kchs=jnp.full((batch, kv_heads, max_seq // group, head_dim),
                          SCALE_EPS, jnp.float32),
            vq=jnp.zeros((batch, kv_heads, max_seq // 2, head_dim), jnp.int8),
            vs=jnp.full((batch, kv_heads, 2, max_seq // 2), SCALE_EPS,
                        jnp.float32),
            ktail=jnp.zeros((batch, kv_heads, 2 * group, head_dim), jnp.int8),
            kts=jnp.full((batch, kv_heads, 2 * group), SCALE_EPS,
                         jnp.float32),
            vtail=jnp.zeros((batch, kv_heads, 2 * group, head_dim), jnp.int8),
            vts=jnp.full((batch, kv_heads, 2 * group), SCALE_EPS,
                         jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32),
            group=group,
        )

    @property
    def max_seq(self) -> int:
        return self.kq.shape[2] * 2

    def update(self, k, v, advance=None):
        """Quantize k/v [B, T, KV, Dh] to per-token int8, append to the
        tails at each slot's length, and flush any chunk the update
        completes into the packed int4 store (K per-channel, V per-token).
        ``advance`` [B] overrides the per-slot increment (padded prefill)."""
        B, T = k.shape[:2]
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        k8, ks8 = quantize_kv(k)  # [B, T, KV, Dh] int8, [B, T, KV] f32
        v8, vs8 = quantize_kv(v)
        if T == 1 and _resolve_attention_backend() == "pallas":
            # Decode: single aliased Pallas kernel does the tail insert AND
            # the (masked) chunk flush in place — an XLA scatter into the
            # packed store would wrap the whole cache in defensive copies
            # around the Pallas attend (the round-2 int8 lesson).
            from ..ops._common import default_interpret
            from ..ops.kv_scatter import kivi4_decode_update

            arrs = kivi4_decode_update(
                self.kq, self.kchs, self.vq, self.vs,
                self.ktail, self.kts, self.vtail, self.vts, self.lengths,
                jnp.swapaxes(k8, 1, 2), jnp.swapaxes(ks8, 1, 2),
                jnp.swapaxes(v8, 1, 2), jnp.swapaxes(vs8, 1, 2),
                group=self.group, adv=adv, interpret=default_interpret(),
            )
            return dataclasses.replace(
                self, kq=arrs[0], kchs=arrs[1], vq=arrs[2], vs=arrs[3],
                ktail=arrs[4], kts=arrs[5], vtail=arrs[6], vts=arrs[7],
                lengths=self.lengths + adv,
            )
        return self._xla_update(k8, ks8, v8, vs8, adv)

    def _xla_update(self, k8, ks8, v8, vs8, adv):
        """Prefill / off-TPU path: tail writes + up to (G-1+T)//G chunk
        flushes as masked XLA scatters (prefill amortizes the defensive
        copies over the whole chunk, matching the int8 cache's split)."""
        B, T = k8.shape[:2]
        G = self.group
        TC = 2 * G  # tail capacity (rollback depth, class docstring)
        S2 = self.kq.shape[2]
        NC = self.kchs.shape[2]
        L_old = self.lengths
        L_new = jnp.minimum(L_old + adv, self.max_seq)
        j = jnp.arange(G)[None, :]  # [1, G]

        # Old tails in token-major layout for uniform where/gather.
        old_kt = jnp.swapaxes(self.ktail, 1, 2)  # [B, 2G, KV, Dh]
        old_kts = jnp.swapaxes(self.kts, 1, 2)  # [B, 2G, KV]
        old_vt = jnp.swapaxes(self.vtail, 1, 2)
        old_vts = jnp.swapaxes(self.vts, 1, 2)

        def gather_t(x8, xs8, pos):
            """New-token rows for absolute positions ``pos`` [B, n]."""
            idx = jnp.clip(pos - L_old[:, None], 0, T - 1)
            g8 = jnp.take_along_axis(x8, idx[..., None, None], axis=1)
            gs = jnp.take_along_axis(xs8, idx[..., None], axis=1)
            return g8, gs  # [B, n, KV, Dh], [B, n, KV]

        def gather_tail(t8, ts, pos):
            """Tail rows for absolute positions ``pos`` [B, n]."""
            row = jnp.mod(pos, TC)
            g8 = jnp.take_along_axis(t8, row[..., None, None], axis=1)
            gs = jnp.take_along_axis(ts, row[..., None], axis=1)
            return g8, gs

        # ---- chunk flushes -------------------------------------------------
        kq, kchs, vq, vs = self.kq, self.kchs, self.vq, self.vs
        b_idx = jnp.arange(B)[:, None]
        n_flush = (G - 1 + T) // G
        for f in range(n_flush):
            c = L_old // G + f  # [B] chunk index
            valid_f = (c + 1) * G <= L_new  # [B]
            pos = c[:, None] * G + j  # [B, G] chunk token positions
            use_tail = pos < L_old[:, None]
            gk8, gks = gather_t(k8, ks8, pos)
            gv8, gvs = gather_t(v8, vs8, pos)
            tk8, tks = gather_tail(old_kt, old_kts, pos)
            tv8, tvs = gather_tail(old_vt, old_vts, pos)
            ck8 = jnp.where(use_tail[..., None, None], tk8, gk8)
            cks = jnp.where(use_tail[..., None], tks, gks)
            cv8 = jnp.where(use_tail[..., None, None], tv8, gv8)
            cvs = jnp.where(use_tail[..., None], tvs, gvs)
            packed_k, s_ch, packed_v, s_v = kivi_chunk_quantize(
                jnp.swapaxes(ck8, 1, 2), jnp.swapaxes(cks, 1, 2),
                jnp.swapaxes(cv8, 1, 2), jnp.swapaxes(cvs, 1, 2),
            )  # [B, KV, G/2, Dh], [B, KV, Dh], -, [B, KV, G]
            rows = jnp.where(
                valid_f[:, None], c[:, None] * (G // 2) + jnp.arange(G // 2),
                S2,
            )  # [B, G/2]; OOB -> dropped
            kq = kq.at[b_idx, :, rows].set(
                jnp.swapaxes(packed_k, 1, 2), mode="drop")
            vq = vq.at[b_idx, :, rows].set(
                jnp.swapaxes(packed_v, 1, 2), mode="drop")
            c_safe = jnp.where(valid_f, c, NC)[:, None]  # [B, 1]
            kchs = kchs.at[b_idx, :, c_safe].set(s_ch[:, None], mode="drop")
            vs = vs.at[b_idx, :, 0, rows].set(
                jnp.swapaxes(s_v[:, :, 0::2], 1, 2), mode="drop")
            vs = vs.at[b_idx, :, 1, rows].set(
                jnp.swapaxes(s_v[:, :, 1::2], 1, 2), mode="drop")

        # ---- new tails -----------------------------------------------------
        # Invariant: tail row j holds the LATEST written token with
        # position ≡ j (mod 2G) — also for tokens this update flushed into a
        # chunk. Rows persist after a flush, so rewinding ``lengths``
        # (speculative rollback, depth <= G) re-exposes correct int8 data
        # and the stale chunk re-flushes when positions re-advance; the
        # decode kernel's insert-at-(pos % 2G) maintains the same invariant.
        # Writes anchor at [L_old, L_old + T) — NOT L_new: speculative
        # scoring passes advance=0 and still needs the window's K/V written
        # (masked until lengths advance; SURVEY §2.3 A3 spec contract).
        j2 = jnp.arange(TC)[None, :]
        W_end = L_old[:, None] + T  # one past the last written position
        p_j = (W_end - 1) - jnp.mod(W_end - 1 - j2, TC)
        fresh = p_j >= L_old[:, None]  # [B, 2G]: a new token maps to row j
        gk8, gks = gather_t(k8, ks8, p_j)
        gv8, gvs = gather_t(v8, vs8, p_j)
        nkt = jnp.where(fresh[..., None, None], gk8, old_kt)
        nkts = jnp.where(fresh[..., None], gks, old_kts)
        nvt = jnp.where(fresh[..., None, None], gv8, old_vt)
        nvts = jnp.where(fresh[..., None], gvs, old_vts)
        # lengths keep counting past capacity (writes drop) — matching the
        # int8 cache's out-of-bounds semantics.
        return dataclasses.replace(
            self, kq=kq, kchs=kchs, vq=vq, vs=vs,
            ktail=jnp.swapaxes(nkt, 1, 2), kts=jnp.swapaxes(nkts, 1, 2),
            vtail=jnp.swapaxes(nvt, 1, 2), vts=jnp.swapaxes(nvts, 1, 2),
            lengths=self.lengths + adv,
        )

    def dequant_fp(self, lane=None):
        """Reconstruct per-token fp K/V [B, KV, S, Dh] (oracle / XLA
        formulation; the Pallas kernel dequantizes per-block in VMEM).
        ``lane`` mirrors the kernel's cast order (bf16 on TPU)."""
        if lane is None:
            lane = (jnp.bfloat16 if jax.default_backend() == "tpu"
                    else jnp.float32)
        B, KV, S2, Dh = self.kq.shape
        S, G = S2 * 2, self.group

        def un_nib(q):
            lo = jnp.right_shift(jnp.left_shift(q, 4), 4)
            hi = jnp.right_shift(q, 4)
            return jnp.stack([lo, hi], axis=3).reshape(B, KV, S, Dh)

        pos = jnp.arange(S)
        # K: chunk-channel scales, expanded per token.
        k_nib = un_nib(self.kq)
        ksc = jnp.take(self.kchs, pos // G, axis=2)  # [B, KV, S, Dh]
        k_q = (k_nib.astype(lane) * ksc.astype(lane)).astype(lane)
        # V: per-token scales from the parity-split layout.
        v_nib = un_nib(self.vq)
        vsc = jnp.swapaxes(self.vs, 2, 3).reshape(B, KV, S)
        v_q = (v_nib.astype(lane) * vsc[..., None].astype(lane)).astype(lane)
        # Tails overlay positions [F, F+2G) at rows pos % 2G: everything at
        # or past the frontier — including speculative windows written with
        # advance=0 beyond ``lengths`` — lives in the tail; rows beyond the
        # last written position hold stale data that the attention masks
        # (pos <= length + t). Valid because writes never run more than 2G
        # past the committed frontier (speculation depth <= G).
        F = (self.lengths // G) * G  # [B]
        rel = pos[None, :] - F[:, None]  # [B, S]
        in_tail = (rel >= 0) & (rel < 2 * G)
        row_c = jnp.mod(pos[None, :], 2 * G) * jnp.ones(
            (self.lengths.shape[0], 1), jnp.int32)
        kt = jnp.take_along_axis(
            self.ktail, row_c[:, None, :, None], axis=2
        ).astype(lane)
        kts = jnp.take_along_axis(self.kts, row_c[:, None, :], axis=2)
        vt = jnp.take_along_axis(
            self.vtail, row_c[:, None, :, None], axis=2
        ).astype(lane)
        vts = jnp.take_along_axis(self.vts, row_c[:, None, :], axis=2)
        k_t = (kt * kts[..., None].astype(lane)).astype(lane)
        v_t = (vt * vts[..., None].astype(lane)).astype(lane)
        m = in_tail[:, None, :, None]
        return jnp.where(m, k_t, k_q), jnp.where(m, v_t, v_q)

    def advance(self, adv):
        """Speculative commit: bump lengths by ``adv`` [B] AND flush any
        chunk the bump completes — the scoring forward wrote the window's
        K/V into the tails with advance=0, so an ordinary length bump would
        leave a completed chunk permanently unflushed (the attention
        frontier would then read never-written packed rows). Sources come
        from the tails (the 2G tail always holds the last <= 2G positions).
        Commit depth must be <= G (the engine's speculation windows are)."""
        G = self.group
        TC = 2 * G
        S2 = self.kq.shape[2]
        NC = self.kchs.shape[2]
        L_old = self.lengths
        L_new = jnp.minimum(L_old + adv, self.max_seq)
        kq, kchs, vq, vs = self.kq, self.kchs, self.vq, self.vs
        B = L_old.shape[0]
        b_idx = jnp.arange(B)[:, None]
        j = jnp.arange(G)[None, :]
        for f in range(2):  # adv <= 2G boundaries, one chunk per crossing
            c = L_old // G + f
            valid_f = ((c + 1) * G <= L_new) & ((c + 1) * G > L_old)
            crow = jnp.mod(c[:, None] * G + j, TC)  # [B, G] tail rows
            ck8 = jnp.take_along_axis(self.ktail, crow[:, None, :, None], 2)
            cks = jnp.take_along_axis(self.kts, crow[:, None, :], 2)
            cv8 = jnp.take_along_axis(self.vtail, crow[:, None, :, None], 2)
            cvs = jnp.take_along_axis(self.vts, crow[:, None, :], 2)
            packed_k, s_ch, packed_v, s_v = kivi_chunk_quantize(
                ck8, cks, cv8, cvs)
            rows = jnp.where(
                valid_f[:, None], c[:, None] * (G // 2) + jnp.arange(G // 2),
                S2,
            )
            kq = kq.at[b_idx, :, rows].set(
                jnp.swapaxes(packed_k, 1, 2), mode="drop")
            vq = vq.at[b_idx, :, rows].set(
                jnp.swapaxes(packed_v, 1, 2), mode="drop")
            c_safe = jnp.where(valid_f, c, NC)[:, None]
            kchs = kchs.at[b_idx, :, c_safe].set(s_ch[:, None], mode="drop")
            vs = vs.at[b_idx, :, 0, rows].set(
                jnp.swapaxes(s_v[:, :, 0::2], 1, 2), mode="drop")
            vs = vs.at[b_idx, :, 1, rows].set(
                jnp.swapaxes(s_v[:, :, 1::2], 1, 2), mode="drop")
        return dataclasses.replace(
            self, kq=kq, kchs=kchs, vq=vq, vs=vs, lengths=self.lengths + adv)

    def update_and_attend(self, q, k, v, advance=None, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          sink_logits=None, tree_mask=None,
                          alibi_slopes=None):
        new = self.update(k, v, advance)
        if tree_mask is None and _resolve_attention_backend() == "pallas":
            from ..ops.attention import int4_kv_attention

            out = int4_kv_attention(
                q, new.kq, new.kchs, new.vq, new.vs,
                new.ktail, new.kts, new.vtail, new.vts,
                self.lengths, new.lengths, group=self.group,
                window=window, scale=scale, softcap=softcap,
                sink_logits=sink_logits, alibi_slopes=alibi_slopes,
            )
        else:
            k_fp, v_fp = new.dequant_fp()
            ones = jnp.ones(k_fp.shape[:3], jnp.float32)
            out = int8_kv_attention_xla(
                q, k_fp, ones, v_fp, ones, self.lengths, window=window,
                scale=scale, softcap=softcap, sink_logits=sink_logits,
                tree_mask=tree_mask, alibi_slopes=alibi_slopes,
            )
        return out, new

    def reorder_tail(self, node_idx):
        """Tree-speculation commit (see BF16KVCache.reorder_tail). Candidate
        nodes live ENTIRELY in the int8 tail: the scoring forward wrote them
        with advance=0 at positions lengths + node, and the engine bounds
        the tree width to <= group — inside the tail's 2G capacity, and
        narrow enough that the rows their writes recycled (positions 2G
        back) all predate the flushed frontier F, which attention never
        reads from the tail. So compaction copies tail rows + per-token
        scales only; packed nibbles never reorder — the next advance()
        re-flushes any completed chunk FROM the compacted tail,
        bit-identically to sequential decode."""
        B, d = node_idx.shape
        TC = self.ktail.shape[2]
        b_idx3 = jnp.arange(B)[:, None, None]
        src = jnp.mod(self.lengths[:, None] + node_idx, TC)  # [B, d]
        dst = jnp.mod(
            self.lengths[:, None] + 1 + jnp.arange(d)[None, :], TC
        )
        tk = jnp.take_along_axis
        kt_r = tk(self.ktail, src[:, None, :, None], axis=2)  # [B, KV, d, Dh]
        vt_r = tk(self.vtail, src[:, None, :, None], axis=2)
        kts_r = tk(self.kts, src[:, None, :], axis=2)  # [B, KV, d]
        vts_r = tk(self.vts, src[:, None, :], axis=2)
        kv_idx = jnp.arange(self.ktail.shape[1])[None, :, None]
        dst3 = dst[:, None, :]
        return dataclasses.replace(
            self,
            ktail=self.ktail.at[b_idx3, kv_idx, dst3].set(kt_r),
            vtail=self.vtail.at[b_idx3, kv_idx, dst3].set(vt_r),
            kts=self.kts.at[b_idx3, kv_idx, dst3].set(kts_r),
            vts=self.vts.at[b_idx3, kv_idx, dst3].set(vts_r),
        )

    def reset_slot(self, slot: jnp.ndarray):
        return dataclasses.replace(self, lengths=self.lengths.at[slot].set(0))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "ks", "vq", "vs", "lengths"],
    meta_fields=["window", "sinks"],
)
@dataclasses.dataclass(frozen=True)
class RingInt8KVCache(_DenseSlotViews):
    """Ring-buffer INT8 KV cache for sliding-window models (Mistral/Gemma-2):
    device memory is O(window), not O(max_seq) — an 8x saving for
    Mistral-7B's 4096 window at 32k max context.

    Layout matches Int8KVCache but the S axis is a ring of capacity
    C >= window + max_chunk - 1: position p lives in column p % C, so a
    T-token update never overwrites a column any of its own queries still
    needs (the oldest position query t needs is lengths+t-window+1; the ring
    holds the last C positions). Attention reconstructs per-column absolute
    positions from the post-update length L: column c holds
    p_c = (L-1) - ((L-1-c) mod C), negative for never-written columns —
    and masks on them (ops/attention.py k_positions), so results are
    EXACTLY the dense sliding-window cache's.
    """

    kq: jnp.ndarray
    ks: jnp.ndarray
    vq: jnp.ndarray
    vs: jnp.ndarray
    lengths: jnp.ndarray
    window: int
    sinks: int = 0

    @classmethod
    def init(cls, batch, window, max_chunk, kv_heads, head_dim, sinks=0):
        """Capacity = sinks + window + max_chunk rounded up to a multiple
        of 32 (sublane-friendly; also keeps every in-chunk query's full
        window resident — see class docstring).

        ``sinks`` > 0 reserves the first columns for positions 0..sinks-1
        PERMANENTLY (StreamingLLM attention sinks): those keys stay visible
        to every query forever while the rest of the ring slides — the
        serving trick that keeps full-attention models coherent on
        unbounded streams with O(window) memory."""
        cap = -(-(sinks + window + max_chunk) // 32) * 32
        return cls(
            kq=jnp.zeros((batch, kv_heads, cap, head_dim), jnp.int8),
            ks=jnp.full((batch, kv_heads, cap), SCALE_EPS, jnp.float32),
            vq=jnp.zeros((batch, kv_heads, cap, head_dim), jnp.int8),
            vs=jnp.full((batch, kv_heads, cap), SCALE_EPS, jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32),
            window=window,
            sinks=sinks,
        )

    @property
    def capacity(self):
        return self.kq.shape[2]

    @property
    def max_seq(self):
        # Rings impose no position limit; the engine bounds total length
        # via max_seq_len / max_position_embeddings.
        return 1 << 30

    def _column(self, pos):
        """Ring column for absolute position(s): sink positions pin to
        their own column; the rest rotate through the remaining R slots."""
        R = self.capacity - self.sinks
        return jnp.where(
            pos < self.sinks, pos, self.sinks + (pos - self.sinks) % R
        )

    def update(self, k, v, advance=None):
        B, T = k.shape[:2]
        C = self.capacity
        if T > C - self.window - self.sinks:
            raise ValueError(
                f"chunk {T} exceeds ring slack {C - self.window - self.sinks}"
                " (init with max_chunk >= prefill chunk)"
            )
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        k8, ks_new = quantize_kv(k)
        v8, vs_new = quantize_kv(v)
        b_idx = jnp.arange(B)[:, None]
        pos = self.lengths[:, None] + jnp.arange(T)[None, :]
        s_idx = self._column(pos)
        kq = self.kq.at[b_idx, :, s_idx].set(k8)
        vq = self.vq.at[b_idx, :, s_idx].set(v8)
        ks = self.ks.at[b_idx, :, s_idx].set(ks_new)
        vs = self.vs.at[b_idx, :, s_idx].set(vs_new)
        return RingInt8KVCache(
            kq=kq, ks=ks, vq=vq, vs=vs, lengths=self.lengths + adv,
            window=self.window, sinks=self.sinks,
        )

    def update_and_attend(self, q, k, v, advance=None, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          alibi_slopes=None, tree_mask=None):
        # ALiBi composes with the ring layout since round 5 (VERDICT r4
        # item 4): both attention formulations compute the bias from the
        # per-column ABSOLUTE positions this method reconstructs, so the
        # ring's scattered columns change nothing — and length
        # extrapolation is ALiBi's whole point, making the StreamingLLM
        # ring its natural serving home.
        #
        # Tree speculation composes too (round 5, closing the last
        # layout-reasoned tree guard): candidate nodes are written at
        # frontier positions whose ring columns the update maps like any
        # chunk, and the XLA attention derives the in-window node index
        # from the reconstructed ABSOLUTE positions (j = s_pos - lengths),
        # so the ancestor mask lands on the right columns unchanged. Rows
        # of rejected candidates beyond the committed frontier go stale in
        # place; their columns then reconstruct as the PREVIOUS lap's
        # position (q - capacity <= t - window - sinks for every live query
        # t, since capacity covers window + sinks + the tree width), which
        # the sliding-window lower bound masks — the same masked-staleness
        # argument ordinary ring overwrites rely on.
        T = q.shape[1]
        new = self.update(k, v, advance)
        C = self.capacity
        # Per-column absolute positions from the post-write frontier
        # L = lengths + T (pad tokens past `advance` sit beyond every real
        # query's mask, same as the dense caches).
        L = (self.lengths + T)[:, None]  # [B, 1]
        c = jnp.arange(C)[None, :]
        if self.sinks == 0:
            k_pos = (L - 1) - ((L - 1 - c) % C)  # negative => never written
        else:
            # Sink columns hold their own position (if written); rotating
            # columns hold the latest position >= sinks mapping to them.
            R = C - self.sinks
            m = c - self.sinks
            rot = (L - 1) - ((L - 1 - self.sinks - m) % R)
            rot = jnp.where(rot >= self.sinks, rot, -1)
            k_pos = jnp.where(c < self.sinks, jnp.where(c < L, c, -1), rot)
        win = window if window > 0 else self.window
        if tree_mask is None and _resolve_attention_backend() == "pallas":
            # Ring variant of the flash kernel: per-column absolute
            # positions drive the mask (no block skipping — ring capacity
            # is already O(window)); StreamingLLM sink positions stay
            # visible via the static `sinks` bound.
            out = int8_kv_attention(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths,
                window=win, scale=scale, softcap=softcap,
                k_positions=k_pos, sinks=self.sinks,
                alibi_slopes=alibi_slopes,
            )
        else:
            out = int8_kv_attention_xla(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths,
                window=win, scale=scale, softcap=softcap, k_positions=k_pos,
                sinks=self.sinks, alibi_slopes=alibi_slopes,
                tree_mask=tree_mask,
            )
        return out, new

    def reorder_tail(self, node_idx):
        """Tree-speculation commit (see BF16KVCache.reorder_tail), through
        the ring: src/dst POSITIONS map to ring columns via _column before
        the gather/scatter — otherwise identical to Int8KVCache (payloads
        and per-token scales move together; layout [B, KV, C, Dh]). Gather
        precedes scatter, so wrapped src/dst column overlaps are safe."""
        B, d = node_idx.shape
        src = self._column(self.lengths[:, None] + node_idx)  # [B, d]
        dst = self._column(
            self.lengths[:, None] + 1 + jnp.arange(d)[None, :]
        )
        tk = jnp.take_along_axis
        kq_r = tk(self.kq, src[:, None, :, None], axis=2)  # [B, KV, d, Dh]
        vq_r = tk(self.vq, src[:, None, :, None], axis=2)
        ks_r = tk(self.ks, src[:, None, :], axis=2)  # [B, KV, d]
        vs_r = tk(self.vs, src[:, None, :], axis=2)
        kv = self.kq.shape[1]
        kv_idx = jnp.arange(kv)[None, :, None]
        b3 = jnp.arange(B)[:, None, None]
        dst3 = dst[:, None, :]
        return dataclasses.replace(
            self,
            kq=self.kq.at[b3, kv_idx, dst3].set(kq_r),
            vq=self.vq.at[b3, kv_idx, dst3].set(vq_r),
            ks=self.ks.at[b3, kv_idx, dst3].set(ks_r),
            vs=self.vs.at[b3, kv_idx, dst3].set(vs_r),
        )

    def reset_slot(self, slot: jnp.ndarray):
        return dataclasses.replace(self, lengths=self.lengths.at[slot].set(0))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "ks", "vq", "vs", "lengths"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class MixedKVCache(_DenseSlotViews):
    """K8V4 mixed cache: K int8 per-token (Int8KVCache layout — attention
    LOGITS see full int8 keys, where 4-bit noise hurts most), V packed int4
    (Int4KVCache layout — the byte saving lands on the value read, where
    the softmax average forgives coarser steps). 1.33x the context per HBM
    byte vs int8.

    POSITIONING (ladder v2, BASELINE.md decision 2): this tier is now
    DOMINATED by the KIVI Int4KVCache — which compresses MORE (K also
    4-bit) at BETTER quality (0.23/0.15 vs 0.08/0.01 greedy/prefix on the
    12L proxy), because its int8 tail keeps the most recent <=G tokens at
    full int8 for both K and V while this cache quantizes even the newest
    V row to int4 immediately (per-token int4 V error ~8.5% rel, probed;
    recency precision is what drives next-token selection). Kept for
    layout completeness and as the V-per-token reference; prefer
    kv_dtype=jnp.int4 for capacity serving.

    kq [B, KV, S, Dh] int8 + ks [B, KV, S] f32;
    vq [B, KV, S/2, Dh] int8 packed + vs [B, KV, 2, S/2] f32 parity-split.
    Scope: full-causal attention only (like Int4KVCache).
    """

    kq: jnp.ndarray
    ks: jnp.ndarray
    vq: jnp.ndarray
    vs: jnp.ndarray
    lengths: jnp.ndarray

    @classmethod
    def init(cls, batch, max_seq, kv_heads, head_dim):
        if max_seq % 2:
            raise ValueError("mixed KV needs an even max_seq (V pair packing)")
        return cls(
            kq=jnp.zeros((batch, kv_heads, max_seq, head_dim), jnp.int8),
            ks=jnp.full((batch, kv_heads, max_seq), SCALE_EPS, jnp.float32),
            vq=jnp.zeros((batch, kv_heads, max_seq // 2, head_dim), jnp.int8),
            vs=jnp.full(
                (batch, kv_heads, 2, max_seq // 2), SCALE_EPS, jnp.float32
            ),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.kq.shape[2]

    def _write_v_parity(self, vq, vs, v4, vs_new, pos_b, pos_t, parity):
        """Int4KVCache._write_parity for the V arrays (same semantics)."""
        S2 = vq.shape[2]
        sel = (pos_t % 2) == parity
        row = jnp.where(sel, pos_t // 2, S2)  # S2 = OOB -> dropped
        safe = jnp.minimum(row, S2 - 1)
        cur = vq[pos_b, :, safe]  # [B, T, KV, Dh]
        if parity == 0:
            merged = (cur & jnp.int8(~0x0F)) | (v4 & 0x0F)
        else:
            merged = (cur & jnp.int8(0x0F)) | jnp.left_shift(v4, 4)
        vq = vq.at[pos_b, :, row].set(merged.astype(jnp.int8), mode="drop")
        vs = vs.at[pos_b, :, parity, row].set(vs_new, mode="drop")
        return vq, vs

    def update(self, k, v, advance=None):
        """Quantize (K int8, V int4) and append at each slot's length."""
        B, T = k.shape[:2]
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        k8, ks_new = quantize_kv(k)
        v4, vs_new = quantize_kv4(v)
        if T == 1 and _resolve_attention_backend() == "pallas":
            from ..ops._common import default_interpret
            from ..ops.kv_scatter import kv_mixed_scatter_decode

            kq, ks, vq, vs = kv_mixed_scatter_decode(
                self.kq, self.ks, self.vq, self.vs, self.lengths,
                jnp.swapaxes(k8, 1, 2), jnp.swapaxes(ks_new, 1, 2),
                jnp.swapaxes(v4, 1, 2), jnp.swapaxes(vs_new, 1, 2),
                interpret=default_interpret(),
            )
            return MixedKVCache(kq=kq, ks=ks, vq=vq, vs=vs,
                                lengths=self.lengths + adv)
        # Prefill / off-TPU: XLA writes — K like Int8KVCache, V via the
        # two sequential parity merges (Int4KVCache.update's rationale).
        b_idx, s_idx = _write_positions(self.lengths, T)
        kq = self.kq.at[b_idx, :, s_idx].set(k8)
        ks = self.ks.at[b_idx, :, s_idx].set(ks_new)
        pos_t = jnp.minimum(s_idx, self.max_seq - 1)
        pos_b = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
        vq, vs = self.vq, self.vs
        for parity in (0, 1):
            vq, vs = self._write_v_parity(vq, vs, v4, vs_new, pos_b, pos_t,
                                          parity)
        return MixedKVCache(kq=kq, ks=ks, vq=vq, vs=vs,
                            lengths=self.lengths + adv)

    def _unpack_v(self):
        """Packed V -> per-token int8 nibble values + scales (XLA/oracle
        formulation)."""
        B, KV, S2, Dh = self.vq.shape
        lo = jnp.right_shift(jnp.left_shift(self.vq, 4), 4)
        hi = jnp.right_shift(self.vq, 4)
        full = jnp.stack([lo, hi], axis=3).reshape(B, KV, S2 * 2, Dh)
        scales = jnp.swapaxes(self.vs, 2, 3).reshape(B, KV, S2 * 2)
        return full, scales

    def update_and_attend(self, q, k, v, advance=None, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          sink_logits=None, tree_mask=None,
                          alibi_slopes=None):
        if (window > 0 or softcap > 0.0 or sink_logits is not None
                or alibi_slopes is not None):
            raise NotImplementedError(
                "mixed K8V4 KV supports full-causal rope attention only "
                "(windowed/softcap/sink/alibi models: use int8 KV)"
            )
        new = self.update(k, v, advance)
        if tree_mask is None and _resolve_attention_backend() == "pallas":
            from ..ops.attention import mixed_kv_attention

            out = mixed_kv_attention(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths, scale=scale,
            )
        else:
            v8, vs8 = new._unpack_v()
            out = int8_kv_attention_xla(
                q, new.kq, new.ks, v8, vs8, self.lengths, scale=scale,
                tree_mask=tree_mask,
            )
        return out, new

    def reset_slot(self, slot: jnp.ndarray):
        return dataclasses.replace(self, lengths=self.lengths.at[slot].set(0))


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "kchs", "ktail", "kts", "vq", "vs", "vtail", "vts",
                 "lengths"],
    meta_fields=["group"],
)
@dataclasses.dataclass(frozen=True)
class K4V8KVCache(_DenseSlotViews):
    """K4V8 mixed cache (round 5 — VERDICT r4 item 3): the DOMINANT 6-bit
    design the ladder-v2 measurements point at. Keys take the VALIDATED
    KIVI scheme (Int4KVCache's K side: per-(chunk, channel) int4 scales +
    a 2G-deep per-token INT8 tail for the most recent tokens — the
    combination whose cache-path quality matched int8 KV on the v2
    ladder); values stay per-token INT8 (Int8KVCache's V side — no V
    nibble error at all). ~6 bits/elem average, vs int8's 8 and K8V4's 6.

    Why this beats K8V4 (BASELINE.md ladder decision 2): K8V4 puts the
    4-bit noise on the VALUE read and quantizes even the newest V row to
    int4 immediately — recency precision is what drives next-token
    selection, and its greedy/prefix quality collapsed (0.08/0.01).
    K4V8 puts the 4-bit noise on old KEYS under per-channel chunk scales
    (the axis KIVI showed is forgiving) and keeps the recent window int8
    on BOTH sides via the tail.

    Layout — K exactly as Int4KVCache, V as Int8KVCache plus a tail
    MIRROR (G = ``group``; F = (length // G) * G):
      kq    [B, KV, S/2, Dh] int8 — packed K nibbles of COMPLETED chunks
      kchs  [B, KV, S/G, Dh] f32 — per-chunk per-channel K scales
      ktail [B, KV, 2G, Dh] int8 + kts [B, KV, 2G] f32 — per-token K tail
            (row j = latest position ≡ j mod 2G; rollback depth <= G)
      vq    [B, KV, S, Dh] int8 + vs [B, KV, S] f32 — per-token V at EVERY
            position (the store is uniform; no packed region)
      vtail [B, KV, 2G, Dh] int8 + vts [B, KV, 2G] f32 — mirror of the
            last 2G V rows, kept so the attention kernel's tail block
            (positions >= F) fetches a statically-indexed block instead of
            a dynamically-offset window of the main store

    Scope: the full int8-kernel variant surface (sliding window, softcap,
    learned sinks) — the guards the K8V4 tier kept are LIFTED here by
    construction (the kernel shares the int4 kernel's masking rows).
    """

    kq: jnp.ndarray
    kchs: jnp.ndarray
    ktail: jnp.ndarray
    kts: jnp.ndarray
    vq: jnp.ndarray
    vs: jnp.ndarray
    vtail: jnp.ndarray
    vts: jnp.ndarray
    lengths: jnp.ndarray
    group: int = 64

    @classmethod
    def init(cls, batch, max_seq, kv_heads, head_dim,
             group: int | None = None):
        if group is None:
            group = INT4_KV_GROUP
        group = min(group, max_seq)
        if max_seq % group or group % 2:
            raise ValueError(
                f"k4v8 KV needs max_seq % group == 0 and even group "
                f"(max_seq={max_seq}, group={group})"
            )
        return cls(
            kq=jnp.zeros((batch, kv_heads, max_seq // 2, head_dim), jnp.int8),
            kchs=jnp.full((batch, kv_heads, max_seq // group, head_dim),
                          SCALE_EPS, jnp.float32),
            ktail=jnp.zeros((batch, kv_heads, 2 * group, head_dim), jnp.int8),
            kts=jnp.full((batch, kv_heads, 2 * group), SCALE_EPS,
                         jnp.float32),
            vq=jnp.zeros((batch, kv_heads, max_seq, head_dim), jnp.int8),
            vs=jnp.full((batch, kv_heads, max_seq), SCALE_EPS, jnp.float32),
            vtail=jnp.zeros((batch, kv_heads, 2 * group, head_dim), jnp.int8),
            vts=jnp.full((batch, kv_heads, 2 * group), SCALE_EPS,
                         jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32),
            group=group,
        )

    @property
    def max_seq(self) -> int:
        return self.vq.shape[2]

    def update(self, k, v, advance=None):
        """Quantize k/v [B, T, KV, Dh] per-token int8; K flows through the
        tail + chunk-flush machinery (Int4KVCache semantics, K side only),
        V writes the int8 store directly (+ the tail mirror)."""
        B, T = k.shape[:2]
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        k8, ks8 = quantize_kv(k)
        v8, vs8 = quantize_kv(v)
        if T == 1 and _resolve_attention_backend() == "pallas":
            from ..ops._common import default_interpret
            from ..ops.kv_scatter import k4v8_decode_update

            arrs = k4v8_decode_update(
                self.kq, self.kchs, self.vq, self.vs,
                self.ktail, self.kts, self.vtail, self.vts, self.lengths,
                jnp.swapaxes(k8, 1, 2), jnp.swapaxes(ks8, 1, 2),
                jnp.swapaxes(v8, 1, 2), jnp.swapaxes(vs8, 1, 2),
                group=self.group, adv=adv, interpret=default_interpret(),
            )
            return dataclasses.replace(
                self, kq=arrs[0], kchs=arrs[1], vq=arrs[2], vs=arrs[3],
                ktail=arrs[4], kts=arrs[5], vtail=arrs[6], vts=arrs[7],
                lengths=self.lengths + adv,
            )
        return self._xla_update(k8, ks8, v8, vs8, adv)

    def _xla_update(self, k8, ks8, v8, vs8, adv):
        """Prefill / off-TPU path (mirrors Int4KVCache._xla_update with the
        V side replaced by direct int8 writes)."""
        B, T = k8.shape[:2]
        G = self.group
        TC = 2 * G
        S2 = self.kq.shape[2]
        NC = self.kchs.shape[2]
        L_old = self.lengths
        L_new = jnp.minimum(L_old + adv, self.max_seq)
        j = jnp.arange(G)[None, :]

        # ---- V: direct int8 store writes (Int8KVCache semantics) -----------
        b_idx2, s_idx = _write_positions(L_old, T)
        vq = self.vq.at[b_idx2, :, s_idx].set(v8)
        vs = self.vs.at[b_idx2, :, s_idx].set(vs8)

        old_kt = jnp.swapaxes(self.ktail, 1, 2)  # [B, 2G, KV, Dh]
        old_kts = jnp.swapaxes(self.kts, 1, 2)
        old_vt = jnp.swapaxes(self.vtail, 1, 2)
        old_vts = jnp.swapaxes(self.vts, 1, 2)

        def gather_t(x8, xs8, pos):
            idx = jnp.clip(pos - L_old[:, None], 0, T - 1)
            g8 = jnp.take_along_axis(x8, idx[..., None, None], axis=1)
            gs = jnp.take_along_axis(xs8, idx[..., None], axis=1)
            return g8, gs

        def gather_tail(t8, ts, pos):
            row = jnp.mod(pos, TC)
            g8 = jnp.take_along_axis(t8, row[..., None, None], axis=1)
            gs = jnp.take_along_axis(ts, row[..., None], axis=1)
            return g8, gs

        # ---- K chunk flushes ----------------------------------------------
        kq, kchs = self.kq, self.kchs
        b_idx = jnp.arange(B)[:, None]
        n_flush = (G - 1 + T) // G
        for f in range(n_flush):
            c = L_old // G + f
            valid_f = (c + 1) * G <= L_new
            pos = c[:, None] * G + j
            use_tail = pos < L_old[:, None]
            gk8, gks = gather_t(k8, ks8, pos)
            tk8, tks = gather_tail(old_kt, old_kts, pos)
            ck8 = jnp.where(use_tail[..., None, None], tk8, gk8)
            cks = jnp.where(use_tail[..., None], tks, gks)
            # kivi_chunk_quantize's V outputs are unused here (XLA DCEs
            # them); feeding the K tensors twice keeps the K math on the
            # ONE shared, barrier-pinned code path (bit-equality contract).
            packed_k, s_ch, _, _ = kivi_chunk_quantize(
                jnp.swapaxes(ck8, 1, 2), jnp.swapaxes(cks, 1, 2),
                jnp.swapaxes(ck8, 1, 2), jnp.swapaxes(cks, 1, 2),
            )
            rows = jnp.where(
                valid_f[:, None], c[:, None] * (G // 2) + jnp.arange(G // 2),
                S2,
            )
            kq = kq.at[b_idx, :, rows].set(
                jnp.swapaxes(packed_k, 1, 2), mode="drop")
            c_safe = jnp.where(valid_f, c, NC)[:, None]
            kchs = kchs.at[b_idx, :, c_safe].set(s_ch[:, None], mode="drop")

        # ---- new tails (K + V mirror; Int4KVCache invariant) ---------------
        j2 = jnp.arange(TC)[None, :]
        W_end = L_old[:, None] + T
        p_j = (W_end - 1) - jnp.mod(W_end - 1 - j2, TC)
        fresh = p_j >= L_old[:, None]
        gk8, gks = gather_t(k8, ks8, p_j)
        gv8, gvs = gather_t(v8, vs8, p_j)
        nkt = jnp.where(fresh[..., None, None], gk8, old_kt)
        nkts = jnp.where(fresh[..., None], gks, old_kts)
        nvt = jnp.where(fresh[..., None, None], gv8, old_vt)
        nvts = jnp.where(fresh[..., None], gvs, old_vts)
        return dataclasses.replace(
            self, kq=kq, kchs=kchs, vq=vq, vs=vs,
            ktail=jnp.swapaxes(nkt, 1, 2), kts=jnp.swapaxes(nkts, 1, 2),
            vtail=jnp.swapaxes(nvt, 1, 2), vts=jnp.swapaxes(nvts, 1, 2),
            lengths=self.lengths + adv,
        )

    def dequant_fp(self, lane=None):
        """Per-token fp K/V [B, KV, S, Dh] (oracle / XLA formulation).
        K mirrors Int4KVCache.dequant_fp's K side (packed region + tail
        overlay past the frontier); V reads the int8 store directly."""
        if lane is None:
            lane = (jnp.bfloat16 if jax.default_backend() == "tpu"
                    else jnp.float32)
        B, KV, S2, Dh = self.kq.shape
        S, G = S2 * 2, self.group
        pos = jnp.arange(S)
        lo = jnp.right_shift(jnp.left_shift(self.kq, 4), 4)
        hi = jnp.right_shift(self.kq, 4)
        k_nib = jnp.stack([lo, hi], axis=3).reshape(B, KV, S, Dh)
        ksc = jnp.take(self.kchs, pos // G, axis=2)
        k_q = (k_nib.astype(lane) * ksc.astype(lane)).astype(lane)
        F = (self.lengths // G) * G
        rel = pos[None, :] - F[:, None]
        in_tail = (rel >= 0) & (rel < 2 * G)
        row_c = jnp.mod(pos[None, :], 2 * G) * jnp.ones(
            (self.lengths.shape[0], 1), jnp.int32)
        kt = jnp.take_along_axis(
            self.ktail, row_c[:, None, :, None], axis=2
        ).astype(lane)
        kts = jnp.take_along_axis(self.kts, row_c[:, None, :], axis=2)
        k_t = (kt * kts[..., None].astype(lane)).astype(lane)
        k_fp = jnp.where(in_tail[:, None, :, None], k_t, k_q)
        v_fp = (self.vq.astype(lane)
                * self.vs[..., None].astype(lane)).astype(lane)
        return k_fp, v_fp

    def advance(self, adv):
        """Speculative commit: bump lengths AND flush any K chunk the bump
        completes (Int4KVCache.advance, K side only — V rows were already
        written by the scoring forward). Commit depth must be <= G."""
        G = self.group
        TC = 2 * G
        S2 = self.kq.shape[2]
        NC = self.kchs.shape[2]
        L_old = self.lengths
        L_new = jnp.minimum(L_old + adv, self.max_seq)
        kq, kchs = self.kq, self.kchs
        B = L_old.shape[0]
        b_idx = jnp.arange(B)[:, None]
        j = jnp.arange(G)[None, :]
        for f in range(2):
            c = L_old // G + f
            valid_f = ((c + 1) * G <= L_new) & ((c + 1) * G > L_old)
            crow = jnp.mod(c[:, None] * G + j, TC)
            ck8 = jnp.take_along_axis(self.ktail, crow[:, None, :, None], 2)
            cks = jnp.take_along_axis(self.kts, crow[:, None, :], 2)
            packed_k, s_ch, _, _ = kivi_chunk_quantize(ck8, cks, ck8, cks)
            rows = jnp.where(
                valid_f[:, None], c[:, None] * (G // 2) + jnp.arange(G // 2),
                S2,
            )
            kq = kq.at[b_idx, :, rows].set(
                jnp.swapaxes(packed_k, 1, 2), mode="drop")
            c_safe = jnp.where(valid_f, c, NC)[:, None]
            kchs = kchs.at[b_idx, :, c_safe].set(s_ch[:, None], mode="drop")
        return dataclasses.replace(
            self, kq=kq, kchs=kchs, lengths=self.lengths + adv)

    def update_and_attend(self, q, k, v, advance=None, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          sink_logits=None, tree_mask=None,
                          alibi_slopes=None):
        new = self.update(k, v, advance)
        if tree_mask is None and _resolve_attention_backend() == "pallas":
            from ..ops.attention import k4v8_attention

            out = k4v8_attention(
                q, new.kq, new.kchs, new.vq, new.vs,
                new.ktail, new.kts, new.vtail, new.vts,
                self.lengths, new.lengths, group=self.group,
                window=window, scale=scale, softcap=softcap,
                sink_logits=sink_logits, alibi_slopes=alibi_slopes,
            )
        else:
            k_fp, v_fp = new.dequant_fp()
            ones = jnp.ones(k_fp.shape[:3], jnp.float32)
            out = int8_kv_attention_xla(
                q, k_fp, ones, v_fp, ones, self.lengths, window=window,
                scale=scale, softcap=softcap, sink_logits=sink_logits,
                tree_mask=tree_mask, alibi_slopes=alibi_slopes,
            )
        return out, new

    def reorder_tail(self, node_idx):
        """Tree-speculation commit: K tail rows + V (main store AND tail
        mirror) compact into chain order. Candidate K entries live entirely
        in the int8 tail (engine bounds tree width <= group, as for
        Int4KVCache); candidate V entries live at their absolute positions
        in the int8 store (Int8KVCache semantics)."""
        B, d = node_idx.shape
        TC = self.ktail.shape[2]
        b_idx3 = jnp.arange(B)[:, None, None]
        tk = jnp.take_along_axis
        # K tail + V tail mirror (row = position mod 2G).
        src_t = jnp.mod(self.lengths[:, None] + node_idx, TC)
        dst_t = jnp.mod(
            self.lengths[:, None] + 1 + jnp.arange(d)[None, :], TC
        )
        kt_r = tk(self.ktail, src_t[:, None, :, None], axis=2)
        kts_r = tk(self.kts, src_t[:, None, :], axis=2)
        vt_r = tk(self.vtail, src_t[:, None, :, None], axis=2)
        vts_r = tk(self.vts, src_t[:, None, :], axis=2)
        kv_idx = jnp.arange(self.ktail.shape[1])[None, :, None]
        dst3_t = dst_t[:, None, :]
        # V main store (absolute positions).
        src_v = self.lengths[:, None] + node_idx
        dst_v = self.lengths[:, None] + 1 + jnp.arange(d)[None, :]
        vq_r = tk(self.vq, src_v[:, None, :, None], axis=2)
        vs_r = tk(self.vs, src_v[:, None, :], axis=2)
        dst3_v = dst_v[:, None, :]
        return dataclasses.replace(
            self,
            ktail=self.ktail.at[b_idx3, kv_idx, dst3_t].set(kt_r),
            kts=self.kts.at[b_idx3, kv_idx, dst3_t].set(kts_r),
            vtail=self.vtail.at[b_idx3, kv_idx, dst3_t].set(vt_r),
            vts=self.vts.at[b_idx3, kv_idx, dst3_t].set(vts_r),
            vq=self.vq.at[b_idx3, kv_idx, dst3_v].set(vq_r),
            vs=self.vs.at[b_idx3, kv_idx, dst3_v].set(vs_r),
        )

    def reset_slot(self, slot: jnp.ndarray):
        return dataclasses.replace(self, lengths=self.lengths.at[slot].set(0))
