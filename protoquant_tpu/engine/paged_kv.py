"""Paged INT8 KV-cache (component A1's paged layout).

Device side: per-layer int8 page pools + per-token/head scales, addressed
through a [B, max_pages_per_seq] page table. The table and lengths are
duplicated into each layer's cache object (a few KB) so the paged cache
keeps the same ``update_and_attend(q, k, v, advance)`` interface the model
dispatches through — the model tier stays cache-layout-agnostic.

Host side: pages are allocated/freed by the native C++ free-list allocator
(protoquant_tpu.native.PageAllocator) on request admission/retirement, so a
request only reserves ceil((prompt+max_new)/page_size) pages instead of a
full max_seq slot row.

Attention: decode steps (T=1) run the scalar-prefetch Pallas kernel
(ops/paged_attention.py) that walks the page table in-kernel — no gathered
window ever materializes — whenever models.kv_cache.ATTENTION_BACKEND
resolves to "pallas" (the "auto" default on TPU); the cache update likewise
runs the in-place aliased Pallas scatter. Off-TPU/"xla" decode and chunked
prefill gather the mapped pages into a contiguous window and reuse the int8
attention backends.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..models.kv_cache import quantize_kv
from ..ops.attention import int8_kv_attention, int8_kv_attention_xla
from ..ops.paged_attention import paged_int8_attention


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["kq", "ks", "vq", "vs", "page_table", "lengths"],
    meta_fields=["page_size"],
)
@dataclasses.dataclass(frozen=True)
class PagedInt8KVCache:
    """kq/vq: [num_pages, KV, page_size, Dh] int8 (head-major pages so the
    paged kernel reads one contiguous (ps, Dh) tile per (page, head));
    ks/vs: [num_pages, KV, 1, page_size] f32;
    page_table: [B, max_pages] int32 (-1 = unmapped);
    lengths: [B] int32; page_size: static."""

    kq: jnp.ndarray
    ks: jnp.ndarray
    vq: jnp.ndarray
    vs: jnp.ndarray
    page_table: jnp.ndarray
    lengths: jnp.ndarray
    page_size: int

    @classmethod
    def init(cls, batch, num_pages, max_pages_per_seq, page_size, kv_heads, head_dim):
        """``num_pages`` INCLUDES one reserved trash page (the last index):
        writes through unmapped page-table entries land there, so an idle
        slot with a cleared table can never scribble into a live page."""
        return cls(
            kq=jnp.zeros((num_pages, kv_heads, page_size, head_dim), jnp.int8),
            ks=jnp.full((num_pages, kv_heads, 1, page_size), 1e-12, jnp.float32),
            vq=jnp.zeros((num_pages, kv_heads, page_size, head_dim), jnp.int8),
            vs=jnp.full((num_pages, kv_heads, 1, page_size), 1e-12, jnp.float32),
            page_table=jnp.full((batch, max_pages_per_seq), -1, jnp.int32),
            lengths=jnp.zeros((batch,), jnp.int32),
            page_size=page_size,
        )

    @property
    def window(self) -> int:
        """Max addressable tokens per sequence."""
        return self.page_table.shape[1] * self.page_size

    # -- device-side ops ---------------------------------------------------

    def update(self, k, v, advance=None):
        """Quantize + scatter k/v [B, T, KV, Dh] into the mapped pages."""
        B, T = k.shape[:2]
        ps = self.page_size
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance

        from ..models.kv_cache import _resolve_attention_backend

        if T == 1 and _resolve_attention_backend() == "pallas":
            # Decode: in-place aliased Pallas scatter (same defensive-copy
            # story as the dense cache — see ops/kv_scatter.py docstring).
            from ..ops._common import default_interpret
            from ..ops.kv_scatter import paged_kv_scatter_decode

            k8, ks_new = quantize_kv(k)
            v8, vs_new = quantize_kv(v)
            kq, ks, vq, vs = paged_kv_scatter_decode(
                self.kq, self.ks, self.vq, self.vs,
                self.page_table, self.lengths,
                jnp.swapaxes(k8, 1, 2), jnp.swapaxes(ks_new, 1, 2),
                jnp.swapaxes(v8, 1, 2), jnp.swapaxes(vs_new, 1, 2),
                interpret=default_interpret(),
            )
            return dataclasses.replace(
                self, kq=kq, ks=ks, vq=vq, vs=vs, lengths=self.lengths + adv
            )

        pos = self.lengths[:, None] + jnp.arange(T)[None, :]  # [B, T]
        page_idx = pos // ps
        width = self.page_table.shape[1]
        page = jnp.take_along_axis(
            self.page_table, jnp.minimum(page_idx, width - 1), axis=1
        )  # [B, T]
        # Writes through unmapped entries (-1: idle/retired slots) AND writes
        # beyond the table window (prefill pad tokens past max_seq) go to the
        # reserved trash page — never into a live page.
        trash = self.kq.shape[0] - 1
        page = jnp.where((page < 0) | (page_idx >= width), trash, page)
        off = pos % ps  # [B, T]

        k8, ks_new = quantize_kv(k)  # k8 [B,T,KV,Dh], ks_new [B,T,KV]
        v8, vs_new = quantize_kv(v)

        # Advanced indices (page, off) land in front: target block [B,T,KV,*].
        kq = self.kq.at[page, :, off].set(k8)
        vq = self.vq.at[page, :, off].set(v8)
        ks = self.ks.at[page, :, 0, off].set(ks_new)
        vs = self.vs.at[page, :, 0, off].set(vs_new)
        return dataclasses.replace(
            self, kq=kq, ks=ks, vq=vq, vs=vs, lengths=self.lengths + adv
        )

    def _gather_window(self):
        """Materialize each slot's pages as a contiguous [B, KV, S, Dh] view
        (prefill / XLA-backend path)."""
        B, P = self.page_table.shape
        ps = self.page_size
        page = jnp.maximum(self.page_table, 0)  # [B, P]

        k = self.kq[page]  # [B, P, KV, ps, Dh]
        v = self.vq[page]
        KV = k.shape[2]
        k = k.transpose(0, 2, 1, 3, 4).reshape(B, KV, P * ps, -1)
        v = v.transpose(0, 2, 1, 3, 4).reshape(B, KV, P * ps, -1)
        ks = self.ks[page][:, :, :, 0].transpose(0, 2, 1, 3).reshape(B, KV, P * ps)
        vs = self.vs[page][:, :, :, 0].transpose(0, 2, 1, 3).reshape(B, KV, P * ps)
        return k, ks, v, vs

    def update_and_attend(self, q, k, v, advance=None, window: int = 0,
                          scale: float = 0.0, softcap: float = 0.0,
                          tree_mask=None, alibi_slopes=None):
        from ..models import kv_cache as _kvmod

        new = self.update(k, v, advance)
        if (
            tree_mask is None
            and q.shape[1] == 1
            and window == 0
            and scale == 0.0
            and softcap == 0.0
            and _kvmod._resolve_attention_backend() == "pallas"
        ):
            # Decode: the scalar-prefetch kernel walks the page table —
            # no gathered window. (Sliding-window models take the gather+XLA
            # path below; the page-walk kernel is full-causal only. ALiBi
            # runs in-kernel: round-4 slope rows, like the dense kernel.)
            out = paged_int8_attention(
                q, new.kq, new.ks, new.vq, new.vs, new.page_table,
                self.lengths, alibi_slopes=alibi_slopes,
            )
            return out, new
        # Gathered keys index by absolute position (page i covers positions
        # [i*ps, (i+1)*ps)), so the tree mask's in-window node indexing
        # (s_pos - lengths) holds unchanged.
        kq, ks, vq, vs = new._gather_window()
        out = int8_kv_attention_xla(
            q, kq, ks, vq, vs, self.lengths, window=window, scale=scale,
            softcap=softcap, tree_mask=tree_mask, alibi_slopes=alibi_slopes,
        )
        return out, new

    def reorder_tail(self, node_idx):
        """Tree-speculation commit (see BF16KVCache.reorder_tail): move the
        winning branch's rows — written at positions lengths + node_idx —
        into the contiguous positions lengths+1..lengths+d, THROUGH the page
        table (each position resolves to its mapped (page, offset); moves
        past the mapped window land on the trash page, matching update()'s
        write semantics). Gather-then-scatter, so src/dst aliasing (branch 0
        commits are identity moves) is safe."""
        B, d = node_idx.shape
        ps = self.page_size
        width = self.page_table.shape[1]
        trash = self.kq.shape[0] - 1

        def locate(pos):  # pos [B, d] absolute token positions
            pi = pos // ps
            page = jnp.take_along_axis(
                self.page_table, jnp.minimum(pi, width - 1), axis=1
            )
            page = jnp.where((page < 0) | (pi >= width), trash, page)
            return page, pos % ps

        src_page, src_off = locate(self.lengths[:, None] + node_idx)
        dst_page, dst_off = locate(
            self.lengths[:, None] + 1 + jnp.arange(d)[None, :]
        )
        kq_r = self.kq[src_page, :, src_off]  # [B, d, KV, Dh]
        vq_r = self.vq[src_page, :, src_off]
        ks_r = self.ks[src_page, :, 0, src_off]  # [B, d, KV]
        vs_r = self.vs[src_page, :, 0, src_off]
        return dataclasses.replace(
            self,
            kq=self.kq.at[dst_page, :, dst_off].set(kq_r),
            vq=self.vq.at[dst_page, :, dst_off].set(vq_r),
            ks=self.ks.at[dst_page, :, 0, dst_off].set(ks_r),
            vs=self.vs.at[dst_page, :, 0, dst_off].set(vs_r),
        )

    # -- host-side table management ---------------------------------------

    def map_slot(self, slot: int, pages: list[int], start_len: int = 0):
        """Assign a page chain to a slot. ``start_len`` > 0 adopts the first
        ``start_len`` tokens already resident in the chain's leading pages
        (prefix caching): the slot's frontier starts beyond them, so the
        shared pages are read-only for this tenant."""
        row = jnp.full((self.page_table.shape[1],), -1, jnp.int32)
        row = row.at[: len(pages)].set(jnp.asarray(pages, jnp.int32))
        return dataclasses.replace(
            self,
            page_table=self.page_table.at[slot].set(row),
            lengths=self.lengths.at[slot].set(start_len),
        )

    def advance(self, adv):
        """Speculative commit: pure length bump (the scoring forward wrote
        the window's K/V into the mapped pages with advance=0); mirrors
        kv_cache._DenseSlotViews.advance."""
        return dataclasses.replace(self, lengths=self.lengths + adv)

    def reset_slot(self, slot):
        """Retire a slot: zero its length AND unmap its page chain (the pages
        are about to be freed and reallocated — a stale table entry would let
        this idle slot's decode writes corrupt the next tenant)."""
        return dataclasses.replace(
            self,
            lengths=self.lengths.at[slot].set(0),
            page_table=self.page_table.at[slot].set(-1),
        )

    # Slot views: the pools are batch-agnostic — only the table and lengths
    # are per-slot, so a B=1 view shares the pools (and a merge takes the
    # small view's *updated* pools wholesale).

    def slot_view(self, slot):
        return dataclasses.replace(
            self,
            page_table=jax.lax.dynamic_slice_in_dim(self.page_table, slot, 1, 0),
            lengths=jax.lax.dynamic_slice_in_dim(self.lengths, slot, 1, 0),
        )

    def merge_slot(self, small, slot):
        return dataclasses.replace(
            small,
            page_table=jax.lax.dynamic_update_slice_in_dim(
                self.page_table, small.page_table, slot, 0
            ),
            lengths=jax.lax.dynamic_update_slice_in_dim(
                self.lengths, small.lengths, slot, 0
            ),
        )
