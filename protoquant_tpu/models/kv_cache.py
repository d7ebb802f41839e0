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
                          sink_logits=None, tree_mask=None):
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
                          sink_logits=None, tree_mask=None):
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
                sink_logits=sink_logits,
            )
        else:
            out = int8_kv_attention_xla(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths,
                window=window, scale=scale, softcap=softcap,
                sink_logits=sink_logits, tree_mask=tree_mask,
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
    and scale f32 [B, T, KV])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / 7.0, SCALE_EPS)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -7, 7).astype(jnp.int8)
    return q, scale


def _pack_nib_pair(lo: jnp.ndarray, hi: jnp.ndarray) -> jnp.ndarray:
    """Two int8 nibble values in [-8, 7] -> one byte (lo in bits 0-3, hi in
    bits 4-7; two's-complement nibbles)."""
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "ks", "vq", "vs", "lengths"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Int4KVCache(_DenseSlotViews):
    """INT4 KV cache: kq/vq [B, KV, S/2, Dh] int8 bytes, packed row r
    holding token 2r in the LOW nibble and 2r+1 in the HIGH nibble (token-
    pair packing keeps the lane dim at Dh — a [.., Dh/2] layout would be
    tile-padded back to int8 size in device memory). Scales ks/vs
    [B, KV, 2, S/2] f32 in the same parity split (ks[:, :, p, r] = token
    2r+p), so the kernel reads them without strided lane access.

    Quality: 4-bit per-token-head symmetric quantization is lossier than
    int8 (see BASELINE.md quality ladder int4-KV row); scope is full-causal
    attention (window/softcap/sinks route int8).
    """

    kq: jnp.ndarray
    ks: jnp.ndarray
    vq: jnp.ndarray
    vs: jnp.ndarray
    lengths: jnp.ndarray

    @classmethod
    def init(cls, batch, max_seq, kv_heads, head_dim):
        if max_seq % 2:
            raise ValueError("int4 KV needs an even max_seq (token-pair packing)")
        return cls(
            kq=jnp.zeros((batch, kv_heads, max_seq // 2, head_dim), jnp.int8),
            ks=jnp.full((batch, kv_heads, 2, max_seq // 2), SCALE_EPS, jnp.float32),
            vq=jnp.zeros((batch, kv_heads, max_seq // 2, head_dim), jnp.int8),
            vs=jnp.full((batch, kv_heads, 2, max_seq // 2), SCALE_EPS, jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self) -> int:
        return self.kq.shape[2] * 2

    def _write_parity(self, kq, ks, k4, ks_new, pos_b, pos_t, parity):
        """Merge this parity's tokens into the packed bytes + scale plane.

        pos_b/pos_t: [B, T] write coordinates; only columns where
        pos_t % 2 == parity write — the rest get an OUT-OF-BOUNDS row and
        mode='drop' (a redirected in-bounds no-op write could race a real
        write to the same row under .at's unordered-duplicate semantics)."""
        S2 = kq.shape[2]
        sel = (pos_t % 2) == parity
        row = jnp.where(sel, pos_t // 2, S2)  # S2 = OOB -> dropped
        safe = jnp.minimum(row, S2 - 1)
        cur = kq[pos_b, :, safe]  # [B, T, KV, Dh] current bytes
        if parity == 0:
            merged = (cur & jnp.int8(~0x0F)) | (k4 & 0x0F)
        else:
            merged = (cur & jnp.int8(0x0F)) | jnp.left_shift(k4, 4)
        kq = kq.at[pos_b, :, row].set(merged.astype(jnp.int8), mode="drop")
        ks = ks.at[pos_b, :, parity, row].set(ks_new, mode="drop")
        return kq, ks

    def update(self, k, v, advance=None):
        """Quantize to int4 and append at each slot's length. Even- and
        odd-position tokens merge in two sequential passes: a prefill chunk
        can land both nibbles of one byte, and two .at writes to the same
        byte would each read the OLD value — sequencing makes the second
        merge see the first."""
        B, T = k.shape[:2]
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        k4, ks_new = quantize_kv4(k)
        v4, vs_new = quantize_kv4(v)
        if T == 1 and _resolve_attention_backend() == "pallas":
            # Decode: in-place aliased RMW scatter — the XLA .at merge below
            # is correct but forces whole-cache defensive copies around the
            # Pallas attend custom call (the round-2 int8 lesson; measured
            # 2x step time here before this path, bench/int4kv_probe.py).
            from ..ops._common import default_interpret
            from ..ops.kv_scatter import kv4_scatter_decode

            kq, ks, vq, vs = kv4_scatter_decode(
                self.kq, self.ks, self.vq, self.vs, self.lengths,
                jnp.swapaxes(k4, 1, 2), jnp.swapaxes(ks_new, 1, 2),
                jnp.swapaxes(v4, 1, 2), jnp.swapaxes(vs_new, 1, 2),
                interpret=default_interpret(),
            )
            return Int4KVCache(kq=kq, ks=ks, vq=vq, vs=vs,
                               lengths=self.lengths + adv)
        pos_t = self.lengths[:, None] + jnp.arange(T)[None, :]  # [B, T]
        pos_t = jnp.minimum(pos_t, self.max_seq - 1)
        pos_b = jnp.broadcast_to(jnp.arange(B)[:, None], (B, T))
        kq, ks, vq, vs = self.kq, self.ks, self.vq, self.vs
        for parity in (0, 1):
            kq, ks = self._write_parity(kq, ks, k4, ks_new, pos_b, pos_t, parity)
            vq, vs = self._write_parity(vq, vs, v4, vs_new, pos_b, pos_t, parity)
        return Int4KVCache(kq=kq, ks=ks, vq=vq, vs=vs,
                           lengths=self.lengths + adv)

    def _unpack(self):
        """Packed bytes -> per-token int8 nibble values [B, KV, S, Dh] plus
        [B, KV, S] scales (the XLA/oracle formulation; the Pallas kernel
        unpacks per-block in VMEM instead)."""
        B, KV, S2, Dh = self.kq.shape

        def un(q, sc):
            lo = jnp.left_shift(q, 4)
            lo = jnp.right_shift(lo, 4)  # arithmetic: sign-extended low nibble
            hi = jnp.right_shift(q, 4)
            # interleave tokens 2r (lo) and 2r+1 (hi) back into S order
            full = jnp.stack([lo, hi], axis=3)  # [B, KV, S/2, 2, Dh]
            full = full.reshape(B, KV, S2 * 2, Dh)
            scales = jnp.swapaxes(sc, 2, 3).reshape(B, KV, S2 * 2)
            return full, scales

        k8, ks = un(self.kq, self.ks)
        v8, vs = un(self.vq, self.vs)
        return k8, ks, v8, vs

    def update_and_attend(self, q, k, v, advance=None, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          sink_logits=None, tree_mask=None):
        if window > 0 or softcap > 0.0 or sink_logits is not None:
            raise NotImplementedError(
                "int4 KV supports full-causal attention only "
                "(windowed/softcap/sink models: use int8 KV)"
            )
        new = self.update(k, v, advance)
        if tree_mask is None and _resolve_attention_backend() == "pallas":
            from ..ops.attention import int4_kv_attention

            out = int4_kv_attention(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths,
                scale=scale,
            )
        else:
            k8, ks, v8, vs = new._unpack()
            out = int8_kv_attention_xla(
                q, k8, ks, v8, vs, self.lengths, scale=scale,
                tree_mask=tree_mask,
            )
        return out, new

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
                          scale: float = 0.0, softcap: float = 0.0):
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
        if _resolve_attention_backend() == "pallas":
            # Ring variant of the flash kernel: per-column absolute
            # positions drive the mask (no block skipping — ring capacity
            # is already O(window)); StreamingLLM sink positions stay
            # visible via the static `sinks` bound.
            out = int8_kv_attention(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths,
                window=win, scale=scale, softcap=softcap,
                k_positions=k_pos, sinks=self.sinks,
            )
        else:
            out = int8_kv_attention_xla(
                q, new.kq, new.ks, new.vq, new.vs, self.lengths,
                window=win, scale=scale, softcap=softcap, k_positions=k_pos,
                sinks=self.sinks,
            )
        return out, new

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
    byte vs int8 at a fraction of full-int4's quality cost (quality
    ladder row int8K_int4V; BASELINE.md).

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
                          sink_logits=None, tree_mask=None):
        if window > 0 or softcap > 0.0 or sink_logits is not None:
            raise NotImplementedError(
                "mixed K8V4 KV supports full-causal attention only "
                "(windowed/softcap/sink models: use int8 KV)"
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
