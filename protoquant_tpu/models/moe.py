"""Mixture-of-experts MLP (Mixtral family) with int8 experts + expert
parallelism.

Beyond-reference extension: the reference quantizes dense linears only
(SURVEY.md §2.1 R2); SURVEY.md §2.2's EP row promised a design note for how
QTensor sharding extends to experts — this is the implementation. The design
is the compiler-friendly GShard/Mesh-TensorFlow capacity form, which is the
TPU-idiomatic MoE: routing is expressed as dense one-hot dispatch/combine
einsums over STATIC shapes [tokens, experts, capacity], so XLA tiles every
expert matmul onto the MXU as one batched GEMM — no dynamic shapes, no
scatter, no host round-trips.

Quantization: expert weights are stacked 3D tensors [E, K, N] quantized
per-expert-per-output-channel (QTensor axis=1 → scales [E, N]); activations
entering experts are dynamically row-quantized ([E, C, K] → scales [E, C]),
the exact analogue of the dense dynamic path. The matmuls use the XLA
bf16-lane formulation (the measured product-best backend on decode; see
ops/xla_backend.py numerics note) batched over E.

Expert parallelism: run inside shard_map with ``ep_axis`` set and the expert
axis of w1/w2/w3 sharded over that mesh axis. Every shard computes the
(replicated, deterministic) router and dispatch, slices its own expert
columns, computes its local experts' GEMMs, and psums the combined output —
the same ICI traffic shape as the dense TP MLP ([N, d] per layer). A
dispatch all_to_all (tokens move instead of replicating) is the pod-scale
variant; with int8 dispatch payloads it halves wire bytes the same way the
SP gathers do (models/llama.py::_sp_gather_quantized).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core import numerics
from ..core.qtensor import QTensor, QTensor4
from ..nn.qlinear import QLinear
from ..utils.config import ModelConfig


def _qtensor3_init(kernel_init, shape, param_dtype, mode="dynamic",
                   int4_group=128):
    """Init returning a stacked QTensor ([E, K, N] payload, [E, N] scales) —
    or a stacked QTensor4 for int4 mode ([E, K/2, N] packed nibbles,
    [E, K/group, N] scales) — so a freshly-initialized quantized MoE model
    has the same param STRUCTURE as one produced by
    nn.convert.quantize_params."""

    def init(key):
        w = kernel_init(key, shape, param_dtype)
        if mode == "weight_only_int4":
            from ..nn.qlinear import pick_int4_group

            return QTensor4.quantize(
                w, group=pick_int4_group(shape[1], int4_group),
                storage="packed",
            )
        return QTensor.quantize(w, axis=1)

    return init


def expert_capacity(n_tokens: int, cfg: ModelConfig) -> int:
    """Static per-expert token capacity (GShard): ceil(k*N/E * factor)."""
    e, k = cfg.num_local_experts, cfg.num_experts_per_tok
    return max(1, math.ceil(k * n_tokens / e * cfg.expert_capacity_factor))


def dispatch_combine(gate_idx, gate_vals, num_experts: int, capacity: int):
    """Dense dispatch/combine tensors from top-k routing decisions.

    gate_idx/gate_vals: [N, k]. Priority is choice-major then token order
    (every token's first choice outranks any token's second choice), the
    standard GShard tie-break. Assignments past an expert's capacity are
    dropped — the token's contribution for that choice becomes 0 and the
    residual stream carries it unchanged.

    Returns (dispatch [N, E, C] f32 in {0,1}, combine [N, E, C] f32).
    """
    n, k = gate_idx.shape
    # Choice-major flat assignment list: rows 0..N-1 are every token's first
    # choice, rows N..2N-1 the second, ...
    flat_idx = gate_idx.T.reshape(-1)  # [k*N]
    oh = jax.nn.one_hot(flat_idx, num_experts, dtype=jnp.float32)  # [k*N, E]
    pos = jnp.cumsum(oh, axis=0) - 1.0  # queue position within each expert
    keep = (pos < capacity) & (oh > 0)  # [k*N, E]
    slot = jax.nn.one_hot(
        jnp.where(keep, pos, -1).max(axis=-1).astype(jnp.int32), capacity,
        dtype=jnp.float32,
    )  # [k*N, C] (all-dropped rows one-hot nothing: max(-1) -> -1 -> zeros)
    assign = (oh * keep)[:, :, None] * slot[:, None, :]  # [k*N, E, C]
    assign = assign.reshape(k, n, num_experts, capacity).transpose(1, 0, 2, 3)
    dispatch = assign.sum(axis=1)  # [N, E, C]
    combine = jnp.einsum("nkec,nk->nec", assign, gate_vals.astype(jnp.float32))
    return dispatch, combine


class _StackedWeight(nn.Module):
    """Stacked per-expert weight [E, K, N] living at ``<name>/kernel`` (fp)
    or ``<name>/qkernel`` (quantized) — the same param layout as QLinear, so
    nn.convert.quantize_params transforms it structurally (3D kernels
    quantize along axis=1 for int8/fp8: per-expert per-output-channel
    scales [E, N]; int4 group-packs each expert's K: [E, K/2, N] nibbles +
    [E, K/group, N] scales)."""

    shape: tuple
    mode: str
    int4_group: int = 128

    @nn.compact
    def __call__(self):
        init = nn.initializers.lecun_normal(batch_axis=(0,))
        if self.mode == "fp":
            return self.param("kernel", init, self.shape, jnp.float32)
        return self.param(
            "qkernel",
            _qtensor3_init(init, self.shape, jnp.float32, self.mode,
                           self.int4_group),
        )


class _SharedExperts(nn.Module):
    """DeepSeek shared experts: a dense SwiGLU MLP of width
    n_shared_experts * moe_intermediate_size that EVERY token visits,
    added to the routed mixture (HF: hidden + shared_experts(residuals)).
    Plain QLinears — quantizes/shards like any dense MLP."""

    cfg: ModelConfig
    mode: str
    dtype: Any

    @nn.compact
    def __call__(self, x):  # [N, d] -> [N, d] f32
        cfg = self.cfg
        inter = (
            cfg.moe_intermediate_size or cfg.intermediate_size
        ) * cfg.n_shared_experts
        lin = lambda feats, name: QLinear(
            feats, mode=self.mode, use_bias=False, dtype=self.dtype, name=name
        )
        preq = (
            numerics.quantize_rowwise(x.astype(self.dtype))
            if self.mode == "dynamic"
            else None
        )
        gate = lin(inter, "gate_proj")(x.astype(self.dtype), preq)
        up = lin(inter, "up_proj")(x.astype(self.dtype), preq)
        act = (
            jax.nn.silu if cfg.hidden_act == "silu"
            else lambda a: jax.nn.gelu(a, approximate=True)
        )
        h = (act(gate.astype(jnp.float32))).astype(self.dtype) * up.astype(
            self.dtype
        )
        return lin(cfg.hidden_size, "down_proj")(h).astype(jnp.float32)


class MoEMLP(nn.Module):
    """Sparse MoE block replacing the dense SwiGLU MLP (HF name
    ``block_sparse_moe``): router ``gate`` + stacked experts w1/w3 (gate/up,
    [E, d, I]) and w2 (down, [E, I, d])."""

    cfg: ModelConfig
    mode: str = "dynamic"  # "fp" | "dynamic" | "weight_only" |
    #                        "weight_only_int4" (group-packed experts)
    dtype: Any = jnp.bfloat16
    int4_group: int = 128  # weight_only_int4: contraction-group size
    ep: int = 1  # expert-parallel degree (experts sharded ep ways)
    ep_axis: Any = None  # mesh axis name (inside shard_map) for EP
    # Pod-scale dispatch: tokens arrive SHARDED over ep_axis (SP-style
    # layout); dispatched activations move to their expert owners via
    # all_to_all — in dynamic mode as int8 + per-row scales (half the ICI
    # bytes of bf16, exact: rowquant scales are per-token over K, so
    # quantize-then-move == move-then-quantize). False = replicate tokens,
    # psum the combine (the TP-MLP-shaped traffic default).
    token_sharded: bool = False

    def _stacked(self, name: str, shape):
        return _StackedWeight(shape, self.mode, self.int4_group, name=name)()

    def _matmul(self, x, w, preq=None):
        """Batched per-expert linear: x [E, C, K] @ w [E, K, N] -> [E, C, N]
        f32, through the mode's quantized formulation."""
        if self.mode == "fp":
            return jnp.einsum(
                "eck,ekn->ecn",
                x.astype(self.dtype),
                w.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
        if self.mode == "weight_only_int4":
            # Group-packed experts (VERDICT r3 item 7): the wo4 split kernel
            # runs once per local expert (E_local is small and static, so
            # the loop unrolls into E pallas calls — each streams that
            # expert's quarter-byte weights and unpacks in VMEM). MoE is
            # int4's best customer: expert weights dominate the bytes and
            # most sit idle per token.
            from .. import ops

            ys = [
                ops.weight_only_int4_matmul(
                    x[e].astype(self.dtype), w.data[e], w.scale[e],
                    group=w.group, formulation="split",
                ).astype(jnp.float32)
                for e in range(x.shape[0])
            ]
            return jnp.stack(ys, axis=0)
        if self.mode == "dynamic":
            xq, s_x = preq if preq is not None else numerics.quantize_rowwise(
                x.astype(self.dtype)
            )
            acc = jnp.einsum(
                "eck,ekn->ecn",
                xq.astype(jnp.bfloat16),
                w.data.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            return acc * s_x[..., None] * w.scale[:, None, :]
        # weight_only (and "static", which serves experts weight-only:
        # per-expert static activation scales are uncalibrated — the dense
        # projections still get the static win; experts are a small share
        # of MoE prefill FLOPs at low top-k): int8 weights stream from HBM,
        # bf16-lane activations.
        acc = jnp.einsum(
            "eck,ekn->ecn",
            x.astype(jnp.bfloat16),
            w.data.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return acc * w.scale[:, None, :]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, d]
        cfg = self.cfg
        e_global, k = cfg.num_local_experts, cfg.num_experts_per_tok
        d = cfg.hidden_size
        inter = cfg.moe_intermediate_size or cfg.intermediate_size
        if e_global % self.ep:
            raise ValueError(f"ep={self.ep} must divide num_experts={e_global}")
        e_local = e_global // self.ep

        b, t, _ = x.shape
        n = b * t
        xf = x.reshape(n, d)

        # Router: tiny [d, E] fp32 matmul; kept full-precision (its argmax
        # decides routing — quantization noise here changes WHICH expert
        # runs, a much larger error than any matmul rounding).
        router_logits = nn.Dense(
            e_global, use_bias=cfg.moe_router_bias, dtype=jnp.float32,
            param_dtype=jnp.float32, name="gate",
        )(xf.astype(jnp.float32))
        if cfg.moe_softmax_after_topk:
            # GPT-OSS routing: top-k on the RAW logits, then softmax over
            # only the selected k values (no norm/scaling afterwards).
            top_vals, gate_idx = jax.lax.top_k(router_logits, k)
            gate_vals = jax.nn.softmax(top_vals, axis=-1)
            return self._dispatch_and_run(
                cfg, xf, gate_idx, gate_vals, e_global, e_local, d, inter,
                b, t, n,
            )
        if cfg.moe_score_func == "sigmoid":
            # DeepSeek-V3 noaux-tc router (sigmoid scores).
            scores = jax.nn.sigmoid(router_logits)
        else:
            scores = jax.nn.softmax(router_logits, axis=-1)
        # Selection scores: V3 adds a load-balance correction bias (a
        # non-trained buffer) for CHOOSING experts; combine weights always
        # come from the raw scores.
        choice = scores
        if cfg.moe_gate_bias:
            bias = self.param(
                "e_score_correction_bias",
                nn.initializers.zeros_init(), (e_global,), jnp.float32,
            )
            choice = scores + bias[None, :]
        if cfg.n_group > 1 and cfg.topk_group > 0:
            # Group-limited routing: score each expert group (V3: sum of its
            # top-2 biased scores; V2: max), keep the best topk_group groups,
            # and zero the rest out of the selection (scores are
            # non-negative, so masked experts are never picked).
            G = cfg.n_group
            cg = choice.reshape(n, G, e_global // G)
            if cfg.moe_gate_bias:
                top2, _ = jax.lax.top_k(cg, 2)
                group_scores = top2.sum(axis=-1)
            else:
                group_scores = cg.max(axis=-1)
            _, g_idx = jax.lax.top_k(group_scores, cfg.topk_group)
            g_mask = jnp.zeros((n, G), jnp.bool_).at[
                jnp.arange(n)[:, None], g_idx
            ].set(True)
            choice = jnp.where(
                jnp.repeat(g_mask, e_global // G, axis=-1), choice, 0.0
            )
        _, gate_idx = jax.lax.top_k(choice, k)
        gate_vals = jnp.take_along_axis(scores, gate_idx, axis=-1)
        if cfg.moe_norm_topk:
            denom = jnp.sum(gate_vals, axis=-1, keepdims=True)
            if cfg.moe_score_func == "sigmoid":
                denom = denom + 1e-20  # HF V3 epsilon
            gate_vals = gate_vals / denom
        if cfg.routed_scaling_factor != 1.0:
            gate_vals = gate_vals * cfg.routed_scaling_factor
        return self._dispatch_and_run(
            cfg, xf, gate_idx, gate_vals, e_global, e_local, d, inter, b, t, n
        )

    def _expert_weights(self, e_local: int, d: int, inter: int):
        """Local expert weight shards by variant (full tensors at ep=1)."""
        if self.cfg.moe_variant == "gpt_oss":
            zeros = nn.initializers.zeros_init()
            return {
                # Fused gate/up, INTERLEAVED along the output axis (gate =
                # even columns, up = odd), plus per-expert biases.
                "gu": self._stacked("gate_up_proj", (e_local, d, 2 * inter)),
                "gu_b": self.param(
                    "gate_up_proj_bias", zeros, (e_local, 2 * inter),
                    jnp.float32,
                ),
                "down": self._stacked("down_proj", (e_local, inter, d)),
                "down_b": self.param(
                    "down_proj_bias", zeros, (e_local, d), jnp.float32
                ),
            }
        return {
            "w1": self._stacked("w1", (e_local, d, inter)),  # gate proj
            "w3": self._stacked("w3", (e_local, d, inter)),  # up proj
            "w2": self._stacked("w2", (e_local, inter, d)),  # down proj
        }

    def _expert_ffn(self, xin, weights, preq):
        """Batched per-expert FFN [E, C, d] -> [E, C, d] f32 by variant."""
        if self.cfg.moe_variant == "gpt_oss":
            gu = self._matmul(xin, weights["gu"], preq)
            gu = gu + weights["gu_b"][:, None, :]
            gate, up = gu[..., 0::2], gu[..., 1::2]
            # GPT-OSS clamped glu: gate <= 7, |up| <= 7,
            # out = (up + 1) * gate * sigmoid(1.702 * gate).
            gate = jnp.minimum(gate, 7.0)
            up = jnp.clip(up, -7.0, 7.0)
            glu = gate * jax.nn.sigmoid(1.702 * gate)
            h = ((up + 1.0) * glu).astype(self.dtype)
            y = self._matmul(h, weights["down"])
            return y + weights["down_b"][:, None, :]
        gate_out = self._matmul(xin, weights["w1"], preq)
        up_out = self._matmul(xin, weights["w3"], preq)
        h = (jax.nn.silu(gate_out) * up_out).astype(self.dtype)  # [E, C, I]
        return self._matmul(h, weights["w2"])

    def _dispatch_and_run(
        self, cfg, xf, gate_idx, gate_vals, e_global, e_local, d, inter,
        b, t, n,
    ):
        cap = expert_capacity(n, cfg)
        dispatch, combine = dispatch_combine(gate_idx, gate_vals, e_global, cap)

        # Local expert shards (full tensors when ep == 1).
        weights = self._expert_weights(e_local, d, inter)

        shared = (
            _SharedExperts(cfg, self.mode, self.dtype, name="shared_experts")
            if cfg.n_shared_experts > 0
            else None
        )

        if self.token_sharded and self.ep_axis is not None:
            return self._alltoall_forward(
                xf, dispatch, combine, weights, b, t, d, shared
            )

        if self.ep_axis is not None:
            r = jax.lax.axis_index(self.ep_axis)
            dispatch = jax.lax.dynamic_slice_in_dim(
                dispatch, r * e_local, e_local, axis=1
            )
            combine = jax.lax.dynamic_slice_in_dim(
                combine, r * e_local, e_local, axis=1
            )

        xin = jnp.einsum(
            "nec,nd->ecd", dispatch, xf.astype(jnp.float32)
        ).astype(self.dtype)  # [E_local, C, d]

        # Shared rowquant: gate and up read the same activation (the dense
        # path's fused-producer move, SURVEY.md §8.3.3).
        preq = (
            numerics.quantize_rowwise(xin.astype(self.dtype))
            if self.mode == "dynamic"
            else None
        )
        y = self._expert_ffn(xin, weights, preq)  # [E_local, C, d] f32

        out = jnp.einsum("nec,ecd->nd", combine, y)
        if self.ep_axis is not None:
            # Non-local experts contributed nothing on this shard; the psum
            # assembles the full mixture (same wire bytes as the TP MLP's
            # all-reduce: one [N, d] payload).
            out = jax.lax.psum(out, self.ep_axis)
        if shared is not None:
            # Shared experts run replicated (post-psum: every shard computes
            # the same dense MLP on the same replicated tokens).
            out = out + shared(xf)
        return out.astype(self.dtype).reshape(b, t, d)

    def _alltoall_forward(
        self, xf, dispatch, combine, weights, b, t, d, shared=None
    ):
        """Token-sharded EP (GShard dispatch): this shard's dispatched rows
        [E, C_local, d] travel to their expert owners via all_to_all, expert
        GEMMs run over every shard's contributions [E_local, ep*C_local, d],
        and results return by the inverse all_to_all; the combine is local
        (tokens never left). Dynamic mode quantizes BEFORE the wire: int8
        payload + f32 per-row scales = ~half the ICI bytes of bf16, exact
        (rowquant is per-row over K)."""
        xin = jnp.einsum(
            "nec,nd->ecd", dispatch, xf.astype(jnp.float32)
        ).astype(self.dtype)  # [E, C_local, d]

        def a2a_out(a):  # [E, cl, ...] -> [E_local, ep*cl, ...]
            return jax.lax.all_to_all(
                a, self.ep_axis, split_axis=0, concat_axis=1, tiled=True
            )

        def a2a_back(a):  # [E_local, ep*cl, ...] -> [E, cl, ...]
            return jax.lax.all_to_all(
                a, self.ep_axis, split_axis=1, concat_axis=0, tiled=True
            )

        if self.mode == "dynamic":
            xq, s_x = numerics.quantize_rowwise(xin)
            preq = (a2a_out(xq), a2a_out(s_x))  # int8 on the wire
            xg = preq[0].astype(self.dtype)
        else:
            preq = None
            xg = a2a_out(xin)

        y = self._expert_ffn(xg, weights, preq)  # [E_local, ep*C_local, d]

        out = jnp.einsum("nec,ecd->nd", combine, a2a_back(y))
        if shared is not None:
            # Tokens are shard-local here; the shared MLP applies in place.
            out = out + shared(xf)
        return out.astype(self.dtype).reshape(b, t, d)
