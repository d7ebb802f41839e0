"""Multi-head Latent Attention (MLA, DeepSeek-V2/V3) — TPU-native.

MLA compresses K/V generation through a shared low-rank latent: a single
``kv_a`` projection emits a per-token latent ``c_kv`` [r = kv_lora_rank] plus
one MQA-shared rope key ``k_pe`` [dr = qk_rope_head_dim]; per-head keys and
values are re-expanded by ``kv_b``. The serving win is the cache: instead of
[B, S, KV, 2*Dh] K/V tensors, only [B, S, r + dr] latents persist — for
DeepSeek-V3 geometry (128 heads) that is ~**57x** fewer cache bytes than MHA
and still ~7x fewer than GQA-8 at the same head count.

TPU-native design decisions (vs the reference's torch formulation, which
materializes per-head K/V every step — modeling_deepseek_v2.py's
DeepseekV2Attention.forward):

* **Absorbed decode** (the DeepSeek paper's inference trick, §"inference
  efficiency"): fold ``kv_b``'s key half into the query once per step —
  ``q_abs[b,t,h,r] = q_nope · W_UK[h]`` — so attention runs directly against
  the latent: scores = q_abs·c_kv + q_pe·k_pe, context = probs·c_kv, and the
  value half of ``kv_b`` applies to the [B,T,H,r] context after softmax.
  Per-head K/V are NEVER materialized for cached steps; the cache read is
  one [S, r+dr] stream per sequence (MQA shape — ideal for TPU HBM: one
  contiguous stream, no head fan-out), and all the extra math lands in two
  dense per-head einsums that XLA tiles onto the MXU.
* **INT8 latent cache** (Int8MLACache): the latent quantizes per-token
  (scale over r), the rope key per-token (scale over dr). Both scales
  factorize out of the dots exactly as in ops/attention.py — applied once to
  scores/probs, never elementwise to the cache — so int8 halves the (already
  tiny) cache bytes at no extra matmul cost.
* Numerics: scores/softmax in f32; the int8 operands enter the dots as bf16
  casts on TPU (exact for int8 values: |x| <= 127 << 2^8).

Reference semantics pinned against transformers' DeepseekV2 implementation
(tests/test_hf_parity.py::test_deepseek_v2_*): interleaved rope pairing on
the decoupled q_pe/k_pe (complex-multiplication order), kv_a/q_a layernorms
at eps=1e-6 (HF hardcodes the default), scale = (dn+dr)^-0.5, and the
cacheless prefill path matching HF's materialized form exactly.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import numerics
from ..core.numerics import QMAX, SCALE_EPS
from ..core.qtensor import QTensor
from ..nn.qlinear import QLinear
from ..utils.config import ModelConfig
from .kv_cache import _DenseSlotViews

NEG_INF = -1e30


def apply_rope_interleaved(x: jnp.ndarray, positions: jnp.ndarray, cos, sin):
    """DeepSeek rope: pairs are (2i, 2i+1) — the complex-multiplication
    layout (HF view_as_complex on reshape(..., -1, 2)) — vs Llama's
    half-split (i, i+D/2). x: [B, T, H, D]; positions: [B, T]."""
    c = cos[positions][:, :, None, :]  # [B, T, 1, D/2]
    s = sin[positions][:, :, None, :]
    xf = x.astype(jnp.float32)
    x1, x2 = xf[..., 0::2], xf[..., 1::2]
    o1 = x1 * c - x2 * s
    o2 = x2 * c + x1 * s
    out = jnp.stack([o1, o2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def _mla_lane():
    # bf16 MXU lanes are exact for int8 values; XLA:CPU can't run bf16
    # batched dots, so fall back to f32 off-TPU (same rule as ops/attention).
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


# ---------------------------------------------------------------------------
# Latent caches
# ---------------------------------------------------------------------------


def _apply_tree_mask(mask, tree_mask, s_pos, lengths):
    """Replace the in-window causal relation with the candidate-tree
    ancestor relation (ops/attention.py int8_kv_attention_xla semantics;
    mask axes [B, 1-or-H, T, S])."""
    if tree_mask is None:
        return mask
    j = s_pos - lengths[:, None]  # [B, S] in-window node index
    in_win = (j >= 0) & (j < tree_mask.shape[1])
    tm = jnp.take(
        tree_mask, jnp.clip(j, 0, tree_mask.shape[1] - 1), axis=1
    )  # [T, B, S]
    tm = jnp.transpose(tm, (1, 0, 2))  # [B, T, S]
    return jnp.where(in_win[:, None, None, :], tm[:, None, :, :], mask)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["c", "p", "lengths"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class MLACache(_DenseSlotViews):
    """fp latent cache: c [B, S, r] (kv_a output, post-layernorm),
    p [B, S, dr] (post-rope MQA key), lengths [B] int32."""

    c: jnp.ndarray
    p: jnp.ndarray
    lengths: jnp.ndarray

    @classmethod
    def init(cls, batch, max_seq, kv_lora_rank, rope_dim, dtype=jnp.bfloat16):
        return cls(
            c=jnp.zeros((batch, max_seq, kv_lora_rank), dtype),
            p=jnp.zeros((batch, max_seq, rope_dim), dtype),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self):
        return self.c.shape[1]

    def update_and_attend(self, q_abs, q_pe, c_new, p_new, advance, scale,
                          tree_mask=None):
        """q_abs: [B,T,H,r] (absorbed query), q_pe: [B,T,H,dr];
        c_new/p_new: [B,T,r]/[B,T,dr] this step's latents. Returns
        (ctx [B,T,H,r] f32, new_cache). ``tree_mask`` [T, T] replaces
        in-window causality with the candidate-tree ancestor relation
        (tree speculation on the latent cache)."""
        B, T = c_new.shape[:2]
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        b_idx = jnp.arange(B)[:, None]
        s_idx = self.lengths[:, None] + jnp.arange(T)[None, :]
        c_all = self.c.at[b_idx, s_idx].set(c_new.astype(self.c.dtype))
        p_all = self.p.at[b_idx, s_idx].set(p_new.astype(self.p.dtype))
        new = MLACache(c=c_all, p=p_all, lengths=self.lengths + adv)

        lane = _mla_lane()
        scores = jnp.einsum(
            "bthr,bsr->bhts", q_abs.astype(lane), c_all.astype(lane),
            preferred_element_type=jnp.float32,
        ) + jnp.einsum(
            "bthd,bsd->bhts", q_pe.astype(lane), p_all.astype(lane),
            preferred_element_type=jnp.float32,
        )
        scores = scores * scale
        t_pos = self.lengths[:, None] + jnp.arange(T)[None, :]
        s_pos = jnp.arange(self.max_seq)[None, :]
        mask = s_pos[:, None, None, :] <= t_pos[:, None, :, None]
        mask = _apply_tree_mask(mask, tree_mask, s_pos, self.lengths)
        scores = jnp.where(mask[:, :, :, :], scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        ctx = jnp.einsum(
            "bhts,bsr->bthr", probs.astype(lane), c_all.astype(lane),
            preferred_element_type=jnp.float32,
        )
        return ctx, new

    def reorder_tail(self, node_idx):
        """Tree-speculation commit (see BF16KVCache.reorder_tail): move the
        winning branch's latent rows (at slots lengths + node_idx) into the
        contiguous slots lengths+1..lengths+d. Layout [B, S, r]."""
        B, d = node_idx.shape
        src = self.lengths[:, None] + node_idx
        dst = self.lengths[:, None] + 1 + jnp.arange(d)[None, :]
        b_idx = jnp.arange(B)[:, None]
        c_r = jnp.take_along_axis(self.c, src[:, :, None], axis=1)
        p_r = jnp.take_along_axis(self.p, src[:, :, None], axis=1)
        return dataclasses.replace(
            self,
            c=self.c.at[b_idx, dst].set(c_r),
            p=self.p.at[b_idx, dst].set(p_r),
        )

    def reset_slot(self, slot: jnp.ndarray):
        return dataclasses.replace(self, lengths=self.lengths.at[slot].set(0))


def _quantize_latent(x: jnp.ndarray):
    """Per-token symmetric int8 over the last axis: [B, T, D] ->
    (int8 [B, T, D], f32 scale [B, T])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(amax / QMAX, SCALE_EPS)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -QMAX, QMAX).astype(jnp.int8)
    return q, scale


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["cq", "cs", "pq", "ps", "lengths"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class Int8MLACache(_DenseSlotViews):
    """INT8 latent cache: cq [B,S,r] int8 + cs [B,S] f32 per-token scales;
    pq [B,S,dr] int8 + ps [B,S] f32. Scales factorize out of both dots
    (scores pick up cs/ps per column; probs fold cs before the context dot)
    so the cache is never dequantized elementwise."""

    cq: jnp.ndarray
    cs: jnp.ndarray
    pq: jnp.ndarray
    ps: jnp.ndarray
    lengths: jnp.ndarray

    @classmethod
    def init(cls, batch, max_seq, kv_lora_rank, rope_dim):
        return cls(
            cq=jnp.zeros((batch, max_seq, kv_lora_rank), jnp.int8),
            cs=jnp.full((batch, max_seq), SCALE_EPS, jnp.float32),
            pq=jnp.zeros((batch, max_seq, rope_dim), jnp.int8),
            ps=jnp.full((batch, max_seq), SCALE_EPS, jnp.float32),
            lengths=jnp.zeros((batch,), jnp.int32),
        )

    @property
    def max_seq(self):
        return self.cq.shape[1]

    def update_and_attend(self, q_abs, q_pe, c_new, p_new, advance, scale,
                          tree_mask=None):
        B, T = c_new.shape[:2]
        adv = jnp.full((B,), T, jnp.int32) if advance is None else advance
        c8, cs_new = _quantize_latent(c_new)
        p8, ps_new = _quantize_latent(p_new)
        b_idx = jnp.arange(B)[:, None]
        s_idx = self.lengths[:, None] + jnp.arange(T)[None, :]
        cq = self.cq.at[b_idx, s_idx].set(c8)
        cs = self.cs.at[b_idx, s_idx].set(cs_new)
        pq = self.pq.at[b_idx, s_idx].set(p8)
        ps = self.ps.at[b_idx, s_idx].set(ps_new)
        new = Int8MLACache(cq=cq, cs=cs, pq=pq, ps=ps,
                           lengths=self.lengths + adv)

        lane = _mla_lane()
        scores = (
            jnp.einsum(
                "bthr,bsr->bhts", q_abs.astype(lane), cq.astype(lane),
                preferred_element_type=jnp.float32,
            )
            * cs[:, None, None, :]
            + jnp.einsum(
                "bthd,bsd->bhts", q_pe.astype(lane), pq.astype(lane),
                preferred_element_type=jnp.float32,
            )
            * ps[:, None, None, :]
        )
        scores = scores * scale
        t_pos = self.lengths[:, None] + jnp.arange(T)[None, :]
        s_pos = jnp.arange(self.max_seq)[None, :]
        mask = s_pos[:, None, None, :] <= t_pos[:, None, :, None]
        mask = _apply_tree_mask(mask, tree_mask, s_pos, self.lengths)
        scores = jnp.where(mask, scores, NEG_INF)
        probs = jax.nn.softmax(scores, axis=-1)
        # Fold the per-column latent scale into the probs (rank-1 exact).
        pc = (probs * cs[:, None, None, :]).astype(lane)
        ctx = jnp.einsum(
            "bhts,bsr->bthr", pc, cq.astype(lane),
            preferred_element_type=jnp.float32,
        )
        return ctx, new

    def reorder_tail(self, node_idx):
        """Tree-speculation commit: payloads AND their per-row scales move
        together. Layout [B, S, r] / [B, S]."""
        B, d = node_idx.shape
        src = self.lengths[:, None] + node_idx
        dst = self.lengths[:, None] + 1 + jnp.arange(d)[None, :]
        b_idx = jnp.arange(B)[:, None]
        tk = jnp.take_along_axis
        return dataclasses.replace(
            self,
            cq=self.cq.at[b_idx, dst].set(tk(self.cq, src[:, :, None], 1)),
            cs=self.cs.at[b_idx, dst].set(tk(self.cs, src, 1)),
            pq=self.pq.at[b_idx, dst].set(tk(self.pq, src[:, :, None], 1)),
            ps=self.ps.at[b_idx, dst].set(tk(self.ps, src, 1)),
        )

    def reset_slot(self, slot: jnp.ndarray):
        return dataclasses.replace(self, lengths=self.lengths.at[slot].set(0))


def init_mla_cache(cfg: ModelConfig, batch: int, max_seq: int,
                   kv_dtype=jnp.bfloat16) -> list:
    """Per-layer MLA latent caches (the init_cache analogue). The latent is
    MQA-shared, so under tensor parallelism the cache REPLICATES across the
    tp axis (it is tiny — that is MLA's point) instead of sharding heads."""
    if kv_dtype == jnp.int8:
        make = lambda: Int8MLACache.init(
            batch, max_seq, cfg.kv_lora_rank, cfg.qk_rope_head_dim
        )
    else:
        make = lambda: MLACache.init(
            batch, max_seq, cfg.kv_lora_rank, cfg.qk_rope_head_dim, kv_dtype
        )
    return [make() for _ in range(cfg.num_hidden_layers)]


# ---------------------------------------------------------------------------
# Attention module
# ---------------------------------------------------------------------------


class _Weight(nn.Module):
    """2D weight [K, N] at ``<name>/kernel`` (fp) or ``<name>/qkernel``
    (quantized) — QLinear's param layout, so nn.convert.quantize_params
    transforms it structurally. Used for kv_b, whose key half must also be
    read OUT of the matmul (query absorption), which QLinear cannot expose."""

    shape: tuple
    quantized: bool

    @nn.compact
    def __call__(self):
        init = nn.initializers.lecun_normal()
        if not self.quantized:
            return self.param("kernel", init, self.shape, jnp.float32)

        def qinit(key):
            return QTensor.quantize(init(key, self.shape, jnp.float32), axis=0)

        return self.param("qkernel", qinit)


def _weight_fp(w) -> jnp.ndarray:
    """fp view of a _Weight param (fp kernel or any QTensor variant)."""
    if isinstance(w, jnp.ndarray):
        return w
    return w.dequantize()


class MLAAttention(nn.Module):
    """DeepSeek-V2/V3 attention. Two execution forms:

    * cacheless (scoring/prefill-from-scratch): materialize per-head K/V
      exactly like the HF reference — parity-pinned.
    * cached (prefill + decode through the engine): absorbed form against
      the latent cache (see module docstring).

    Tensor parallelism: q_b/kv_b/q_proj are column-parallel over heads
    (H/tp local heads), kv_a & q_a replicate (their outputs are per-token
    latents shared by all heads), o_proj is row-parallel with a psum.
    """

    cfg: ModelConfig
    mode: str
    dtype: Any = jnp.bfloat16
    layer_idx: int = 0
    tp: int = 1
    tp_axis: Any = None
    int4_group: int = 128
    int4_storage: str = "packed"
    fp8_group: int = 0
    collective: bool = False

    @nn.compact
    def __call__(self, x, positions, cache, advance=None, preq=None,
                 adapter_ids=None, tree_mask=None):
        cfg = self.cfg
        assert not cfg.attention_bias, "MLA attention biases unsupported"
        B, T, _ = x.shape
        H = cfg.num_attention_heads // self.tp
        dn, dr = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim
        dv = cfg.v_head_dim
        r = cfg.kv_lora_rank
        sm = (dn + dr) ** -0.5
        if cfg.rope_scaling_type == "yarn" and cfg.rope_scaling_mscale_all_dim:
            # DeepSeek-V3: softmax scale picks up mscale^2 (the cos/sin
            # attention_factor cancels between q_pe and k_pe, so the
            # magnitude correction re-enters here for ALL dims).
            from .llama import yarn_mscale

            m = yarn_mscale(
                cfg.rope_scaling_factor, cfg.rope_scaling_mscale_all_dim
            )
            sm = sm * m * m

        lin = lambda feats, name: QLinear(
            feats, mode=self.mode, use_bias=False, dtype=self.dtype,
            int4_group=self.int4_group, int4_storage=self.int4_storage, fp8_group=self.fp8_group,
            name=name,
        )
        # HF hardcodes the a-layernorm eps at the DeepseekV2RMSNorm default
        # (1e-6) rather than rms_norm_eps; mirror that for parity.
        from .llama import RMSNorm, rope_tables

        if self.mode == "dynamic" and preq is None:
            from .. import ops

            preq = ops.shared_rowquant(x.astype(self.dtype))

        # Query path: full projection, or compressed q_a -> norm -> q_b.
        if cfg.q_lora_rank > 0:
            qa = lin(cfg.q_lora_rank, "q_a_proj")(x, preq)
            qa = RMSNorm(1e-6, self.dtype, name="q_a_layernorm")(qa)
            q = lin(H * (dn + dr), "q_b_proj")(qa)
        else:
            q = lin(H * (dn + dr), "q_proj")(x, preq)
        q = q.reshape(B, T, H, dn + dr)
        q_nope, q_pe = q[..., :dn], q[..., dn:]

        # Latent path (replicated under TP: per-token, head-shared).
        ckv = lin(r + dr, "kv_a_proj_with_mqa")(x, preq)
        c_kv, k_pe = ckv[..., :r], ckv[..., r:]
        c_kv = RMSNorm(1e-6, self.dtype, name="kv_a_layernorm")(c_kv)

        cos, sin = rope_tables(dr, cfg.max_position_embeddings,
                               cfg.rope_theta, cfg)
        rope = apply_rope_interleaved if cfg.rope_interleave else None
        if rope is None:
            from .llama import apply_rope as rope
        q_pe = rope(q_pe, positions, cos, sin)
        k_pe = rope(k_pe[:, :, None, :], positions, cos, sin)[:, :, 0, :]

        kv_b = _Weight((r, H * (dn + dv)), self.mode != "fp", name="kv_b_proj")()

        if cache is None:
            # Cacheless: materialize per-head K/V (HF-parity form). The
            # kv_b matmul runs in the mode's quantized formulation.
            kv = self._kv_b_matmul(c_kv, kv_b)  # [B, T, H*(dn+dv)] f32
            kv = kv.reshape(B, T, H, dn + dv)
            k_nope, v = kv[..., :dn], kv[..., dn:]
            k = jnp.concatenate(
                [k_nope.astype(jnp.float32),
                 jnp.broadcast_to(k_pe[:, :, None, :].astype(jnp.float32),
                                  (B, T, H, dr))],
                axis=-1,
            )
            qf = jnp.concatenate(
                [q_nope.astype(jnp.float32), q_pe.astype(jnp.float32)], -1
            )
            scores = jnp.einsum("bthd,bshd->bhts", qf, k) * sm
            mask = (
                positions[:, None, :]  # key positions
                <= positions[:, :, None]  # query positions
            )[:, None, :, :]
            # mask above is [B, 1, Tq, Ts] with axes (t, s) ordered (q, k).
            scores = jnp.where(mask, scores, NEG_INF)
            probs = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32))
            new_cache = None
        else:
            # Absorbed form: fold kv_b's key half into the query, attend
            # against the latent, apply the value half after softmax.
            w = _weight_fp(kv_b).reshape(r, H, dn + dv)
            wk, wv = w[..., :dn], w[..., dn:]  # [r, H, dn], [r, H, dv]
            q_abs = jnp.einsum(
                "bthn,rhn->bthr", q_nope.astype(jnp.float32),
                wk.astype(jnp.float32),
            )
            ctx, new_cache = cache.update_and_attend(
                q_abs, q_pe, c_kv, k_pe, advance, sm, tree_mask=tree_mask
            )
            out = jnp.einsum(
                "bthr,rhv->bthv", ctx, wv.astype(jnp.float32)
            )

        out = out.reshape(B, T, H * dv).astype(self.dtype)
        o = QLinear(
            cfg.hidden_size, mode=self.mode, use_bias=False, dtype=self.dtype,
            psum_axis=self.tp_axis,
            int4_group=self.int4_group, int4_storage=self.int4_storage, fp8_group=self.fp8_group,
            collective=self.collective, tp=self.tp, name="o_proj",
        )(out)
        return o, new_cache

    def _kv_b_matmul(self, c_kv, w):
        """kv_b in the mode's formulation: fp matmul, weight-only int8
        (bf16 lanes, per-channel rescale), or dynamic (rowquant the latent,
        int8 x int8 semantics). QTensor4/F8 variants dequantize."""
        lane = _mla_lane()
        if isinstance(w, jnp.ndarray):
            return jnp.einsum(
                "btr,rn->btn", c_kv.astype(self.dtype), w.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
        if not isinstance(w, QTensor):  # QTensor4 / QTensorF8
            wf = w.dequantize()
            return jnp.einsum(
                "btr,rn->btn", c_kv.astype(self.dtype), wf.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
        if self.mode == "dynamic":
            xq, s_x = numerics.quantize_rowwise(c_kv.astype(self.dtype))
            acc = jnp.einsum(
                "btr,rn->btn", xq.astype(lane), w.data.astype(lane),
                preferred_element_type=jnp.float32,
            )
            return acc * s_x[..., None] * w.scale[None, None, :]
        acc = jnp.einsum(
            "btr,rn->btn", c_kv.astype(lane), w.data.astype(lane),
            preferred_element_type=jnp.float32,
        )
        return acc * w.scale[None, None, :]
