"""Pallas kernel: paged INT8-KV decode attention (ROADMAP item 1).

Walks the page table *inside the grid*: a PrefetchScalarGridSpec makes the
[B, max_pages] table available to the BlockSpec index maps, so each
(batch, kv-head, page) program DMAs its int8 page directly from the pool —
no contiguous-window gather ever materializes. Online softmax (m, l, acc in
VMEM scratch) accumulates across the page axis.

Pool layout (kernel-friendly): kq/vq [P, KV, ps, Dh] int8;
ks/vs [P, KV, 1, ps] f32. Decode only (T == 1); chunked prefill uses the
gather path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ._common import default_interpret

NEG_INF = -1e30


def _kernel(
    pt_ref,  # [B, maxP] int32 (scalar prefetch)
    len_ref,  # [B, 1] int32 (scalar prefetch)
    q_ref,  # (1, HB, G, Dh)
    k_ref,  # (1, HB, ps, Dh) int8 — page selected by index_map via pt_ref
    ks_ref,  # (1, HB, 1, ps) f32
    v_ref,  # (1, HB, ps, Dh) int8
    vs_ref,  # (1, HB, 1, ps) f32
    *rest,  # [alibi_ref (HB, G, 128) f32]? o_ref, m/l/acc scratch
    page_size: int,
    lane,
    has_alibi: bool = False,
):
    rest = list(rest)
    alibi_ref = rest.pop(0) if has_alibi else None
    o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(2)
    HB, G = q_ref.shape[1], q_ref.shape[2]

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(lane)  # (HB, G, Dh)
    k = k_ref[0].astype(lane)  # (HB, ps, Dh)
    ks = ks_ref[0]  # (HB, 1, ps)
    dh = q.shape[-1]

    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (HB, G, ps)
    scores = scores * ks * (1.0 / (dh**0.5))

    # Key slot s of page j holds absolute position j*ps + s; for a T=1 decode
    # query at position len[b], slots with pos <= len are valid. Unmapped
    # pages sit entirely beyond len, so they mask themselves.
    pos = j * page_size + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 2)
    valid = pos <= len_ref[b, 0]
    if has_alibi:
        # ALiBi: -slope * (q_pos - k_pos); the decode query sits at
        # position len[b]. Masked lanes go to NEG_INF below regardless.
        sl = alibi_ref[:, :G, :1]  # (HB, G, 1) per-query-head slopes
        scores = scores - sl * (len_ref[b, 0] - pos).astype(jnp.float32)
    scores = jnp.where(valid, scores, NEG_INF)

    m_old = m_ref[:, :G, :1]  # (HB, G, 1)
    m_new = jnp.maximum(m_old, jnp.max(scores, axis=-1, keepdims=True))
    corr = jnp.exp(m_old - m_new)
    p = jnp.exp(scores - m_new)  # (HB, G, ps)

    vs = vs_ref[0]  # (HB, 1, ps)
    v = v_ref[0].astype(lane)  # (HB, ps, Dh)
    pv = jax.lax.dot_general(
        (p * vs).astype(lane), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (HB, G, Dh)

    l_new = l_ref[:, :G, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:, :G] = acc_ref[:, :G] * corr + pv
    m_ref[:, :G] = jnp.broadcast_to(m_new, (HB, G, m_ref.shape[2]))
    l_ref[:, :G] = jnp.broadcast_to(l_new, (HB, G, l_ref.shape[2]))

    @pl.when(j == pl.num_programs(2) - 1)
    def _():
        o_ref[0] = (
            acc_ref[:, :G] / jnp.maximum(l_ref[:, :G, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("page_size", "interpret", "out_dtype")
)
def _paged_attend(
    q, kq, ks4, vq, vs4, page_table, lengths, alibi_rows, *, page_size,
    interpret, out_dtype
):
    from .attention import _head_block

    B, KV, G, Dh = q.shape
    maxP = page_table.shape[1]
    lengths2 = lengths.reshape(B, 1).astype(jnp.int32)
    # Head-blocking (same lever as the dense flash kernel): HB kv-heads per
    # program divides the grid's program count — the paged grid is otherwise
    # (B, KV, maxP) = thousands of tiny programs whose fixed overhead caps
    # throughput far below HBM bandwidth.
    HB = _head_block(KV, G, Dh, page_size)
    # Raw table (−1 markers intact) goes to the kernel for the mapped check;
    # the index maps clamp only for the DMA address, and reuse the previous
    # page index beyond the window so Pallas elides the dead fetches.
    pt = page_table.astype(jnp.int32)

    def page_index(b, h, j, pt, ln):
        j_eff = jnp.minimum(j, jnp.maximum(ln[b, 0], 0) // page_size)
        return (jnp.maximum(pt[b, j_eff], 0), h, 0, 0)

    in_specs = [
        pl.BlockSpec((1, HB, G, Dh), lambda b, h, j, pt, ln: (b, h, 0, 0)),
        pl.BlockSpec((1, HB, page_size, Dh), page_index),
        pl.BlockSpec((1, HB, 1, page_size), page_index),
        pl.BlockSpec((1, HB, page_size, Dh), page_index),
        pl.BlockSpec((1, HB, 1, page_size), page_index),
    ]
    operands = [q, kq, ks4, vq, vs4]
    if alibi_rows is not None:
        # (KV, G, 128) f32 — per-query-head ALiBi slope, lane-broadcast
        # like the dense kernel's slope rows.
        in_specs.append(pl.BlockSpec((HB, G, 128), lambda b, h, j, pt, ln: (h, 0, 0)))
        operands.append(alibi_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, KV // HB, maxP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, HB, G, Dh), lambda b, h, j, pt, ln: (b, h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((HB, max(G, 8), 128), jnp.float32),
            pltpu.VMEM((HB, max(G, 8), 128), jnp.float32),
            pltpu.VMEM((HB, max(G, 8), Dh), jnp.float32),
        ],
    )
    lane = jnp.float32 if interpret else jnp.bfloat16
    kernel = functools.partial(
        _kernel, page_size=page_size, lane=lane,
        has_alibi=alibi_rows is not None,
    )

    # Pad G in scratch but not blocks; use G-exact blocks (G equals array dim).
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, Dh), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pt, lengths2, *operands)
    return out


def paged_int8_attention(
    q: jnp.ndarray,  # [B, 1, H, Dh] decode query (post-RoPE)
    kq: jnp.ndarray,  # [P, KV, ps, Dh] int8 pool (already holding this step)
    ks: jnp.ndarray,  # [P, KV, 1, ps] f32
    vq: jnp.ndarray,  # [P, KV, ps, Dh] int8
    vs: jnp.ndarray,  # [P, KV, 1, ps] f32
    page_table: jnp.ndarray,  # [B, maxP] int32 (-1 unmapped)
    lengths: jnp.ndarray,  # [B] pre-update lengths
    *,
    alibi_slopes: jnp.ndarray | None = None,  # [H] ALiBi slopes (BLOOM/MPT)
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Returns [B, 1, H, Dh]."""
    if interpret is None:
        interpret = default_interpret()
    B, T, H, Dh = q.shape
    assert T == 1, "paged kernel is decode-only; prefill uses the gather path"
    KV = kq.shape[1]
    G = H // KV
    ps = kq.shape[2]
    qh = q.reshape(B, KV, G, Dh)
    alibi_rows = None
    if alibi_slopes is not None:
        alibi_rows = jnp.broadcast_to(
            alibi_slopes.astype(jnp.float32).reshape(KV, G, 1), (KV, G, 128)
        )
    out = _paged_attend(
        qh, kq, ks, vq, vs, page_table, lengths, alibi_rows,
        page_size=ps, interpret=interpret, out_dtype=q.dtype,
    )
    return out.reshape(B, 1, H, Dh)
