"""Typed dataclass configs (SURVEY.md §5.6).

The reference had no config system (plain kwargs); serving-scale needs one.
Composable, JSON-serializable, no external config framework.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any


def _coerce_tuple_fields(obj) -> None:
    """Convert list values back to tuples for every tuple-typed field.

    JSON has no tuple type, so asdict→json→cls(**d) round-trips turn tuple
    fields into lists — and a frozen dataclass holding lists is unhashable,
    which breaks Flax module hashing downstream (engine jit). Called from
    every config's __post_init__ so ALL construction paths (from_json, CLI
    ``cls(**json.load(f))``, kwargs) normalize, with no per-field lists to
    keep in sync.
    """
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if isinstance(v, list):
            object.__setattr__(obj, f.name, tuple(v))


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """How to quantize a model."""

    mode: str = "dynamic"
    # "dynamic" | "weight_only" | "weight_only_int4" | "dynamic_int4" (W4A8:
    # int4 weights x dynamic int8 acts on the int8 MXU) | "weight_only_fp8"
    # | "fp"
    # KV-cache storage: 8 (int8, the perf default), 6 (K8V4 mixed: int8
    # keys + packed-int4 values — the quality/capacity middle tier), 4
    # (packed int4 — the capacity tier; full-causal models only;
    # BASELINE.md), 16 (bf16).
    kv_bits: int = 8
    clamp: int = 127
    int4_group: int = 128  # contraction-group size for int4 scales
    # int4 scale selection: "mse" (per-group clip search minimizing
    # reconstruction error) or "amax" (never clips; wider steps).
    int4_clip: str = "mse"
    # int4 payload layout: "packed" (int8 bytes, Pallas wo4 kernel) or
    # "native" (XLA s4 dtype — packed in HBM by XLA, unpack fused into the
    # dot; only the XLA backend consumes it).
    int4_storage: str = "packed"
    # fp8 scale granularity: 0 = per-output-channel; g > 0 = per-(K-group,
    # channel) [K/g, N] scales — recovers mantissa resolution on in-channel
    # weight outliers (fp8's lane; see BASELINE.md quality ladder).
    fp8_group: int = 0
    # Layers (by dot-path suffix) to keep in full precision.
    skip_patterns: tuple = ()

    def __post_init__(self):
        _coerce_tuple_fields(self)
        if self.mode not in (
            "dynamic", "static", "weight_only", "weight_only_int4",
            "dynamic_int4", "weight_only_fp8", "fp",
        ):
            raise ValueError(f"unknown quant mode {self.mode!r}")
        if self.kv_bits not in (4, 6, 8, 16):
            raise ValueError("kv_bits must be 4, 6 (K8V4 mixed), 8 or 16")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Llama-family decoder architecture config (HF naming)."""

    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32  # < heads => GQA
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    tie_word_embeddings: bool = False
    # Mixture-of-experts (Mixtral-family; 0 = dense SwiGLU MLP).
    num_local_experts: int = 0
    num_experts_per_tok: int = 2
    expert_capacity_factor: float = 1.25
    # Expert FFN width when it differs from the dense intermediate size
    # (Qwen3-MoE); 0 = intermediate_size.
    moe_intermediate_size: int = 0
    # Normalize the top-k routing weights to sum 1 (Mixtral/Qwen3 true;
    # Qwen2-MoE ships norm_topk_prob=False).
    moe_norm_topk: bool = True
    # --- Architecture variants beyond Llama/Mistral/Mixtral ---
    # Qwen2 family: biases on the q/k/v projections (o_proj stays bias-free).
    attention_bias: bool = False
    # MLP gate activation: "silu" (Llama SwiGLU) | "gelu_tanh" (Gemma GeGLU).
    hidden_act: str = "silu"
    # Gemma family: RMSNorm computes y * (1 + w) (weights stored zero-centred).
    rmsnorm_unit_offset: bool = False
    # Gemma family: scale embeddings by sqrt(hidden_size) after lookup.
    scale_embeddings: bool = False
    # Gemma-2 style final-logit soft-capping: cap * tanh(logits / cap); 0 = off.
    final_logit_softcap: float = 0.0
    # Head dim when it differs from hidden_size // heads (Gemma: 256). 0 = derive.
    head_dim_override: int = 0
    # Mistral-family sliding-window attention: each query attends to at most
    # the last `sliding_window` positions. 0 = full causal attention.
    sliding_window: int = 0
    # Gemma-2: the window applies only on even layers (odd layers full).
    alternating_sliding_window: bool = False
    # Gemma-3: every Nth layer is global, the rest sliding — layer i slides
    # iff (i+1) % pattern != 0 (pattern 2 == Gemma-2's alternation; 0 = all
    # layers sliding when sliding_window > 0).
    sliding_window_pattern: int = 0
    # Gemma-3: sliding layers use this UNSCALED rope base (global layers use
    # rope_theta + rope_scaling). 0 = one rope for all layers.
    rope_local_theta: float = 0.0
    # Gemma-2: attention scores scaled by query_pre_attn_scalar^-0.5 instead
    # of head_dim^-0.5 (0 = default head_dim scaling).
    query_pre_attn_scalar: float = 0.0
    # Gemma-2: attention-logit soft-capping cap*tanh(s/cap) pre-mask (0=off).
    attn_logit_softcap: float = 0.0
    # Gemma-2 sandwich norms: post-attention norm on the attention OUTPUT,
    # plus pre/post-feedforward norms around the MLP.
    sandwich_norms: bool = False
    # Qwen3: per-head RMSNorm on q and k (over head_dim, pre-RoPE).
    qk_norm: bool = False
    # --- GPT-OSS ---
    # Bias on o_proj (GPT-OSS carries biases on all four attention
    # projections; attention_bias alone covers q/k/v, Qwen2-style).
    attention_out_bias: bool = False
    # Learned per-head attention sinks: a trainable logit per head appended
    # to every softmax (its probability mass is discarded), letting heads
    # dump attention nowhere — OSS's alternative to StreamingLLM sinks.
    learned_attention_sinks: bool = False
    # Expert style: "mixtral" (w1/w3/w2 SwiGLU) or "gpt_oss" (fused
    # INTERLEAVED gate_up [E, d, 2I] + biases, clamped glu:
    # gate<=7, |up|<=7, (up+1) * gate*sigmoid(1.702*gate)).
    moe_variant: str = "mixtral"
    moe_router_bias: bool = False  # router linear carries a bias
    # GPT-OSS routing: top-k on the raw logits, then softmax over just the
    # selected k values (vs softmax-then-topk everywhere else).
    moe_softmax_after_topk: bool = False
    # --- DeepSeek-V2/V3 multi-head latent attention (MLA) ---
    # kv_lora_rank > 0 switches the attention tier to MLA (models/mla.py):
    # K/V are generated from a shared low-rank latent; the cache stores the
    # latent + one rope key per token instead of per-head K/V.
    kv_lora_rank: int = 0
    q_lora_rank: int = 0  # 0 = full q_proj (V2-Lite); >0 = compressed q
    qk_nope_head_dim: int = 128  # per-head non-positional key/query dim
    qk_rope_head_dim: int = 64  # decoupled rope key/query dim (MQA-shared)
    v_head_dim: int = 128  # per-head value dim
    # RoPE pairing: False = half-split (Llama: i with i+D/2); True =
    # interleaved (DeepSeek: 2i with 2i+1, complex-multiplication order).
    rope_interleave: bool = False
    # --- DeepSeek MoE (shared experts + scaled/grouped routing) ---
    n_shared_experts: int = 0  # dense experts every token visits (width = n * moe_inter)
    routed_scaling_factor: float = 1.0  # multiplies the top-k combine weights
    moe_score_func: str = "softmax"  # "softmax" (V2) | "sigmoid" (V3)
    # V3 noaux_tc router: an e_score_correction_bias buffer added to the
    # scores for SELECTION only (combine weights use the raw scores), and
    # group scores = sum of each group's top-2 (V2 groups use the max).
    moe_gate_bias: bool = False
    n_group: int = 0  # expert groups for group-limited routing (0/1 = off)
    topk_group: int = 0  # groups each token may route into
    first_k_dense_replace: int = 0  # first K layers use the dense MLP
    # RoPE scaling ("" = none): "llama3" (Llama-3.1+ NTK-by-parts),
    # "linear" (position-interpolation: inv_freq / factor), or "yarn"
    # (DeepSeek long-context: ramped interpolation + attention factor).
    rope_scaling_type: str = ""
    rope_scaling_factor: float = 8.0
    rope_scaling_low_freq_factor: float = 1.0
    rope_scaling_high_freq_factor: float = 4.0
    rope_scaling_original_max_position_embeddings: int = 8192
    # yarn parameters (transformers rope_scaling dict names).
    rope_scaling_beta_fast: float = 32.0
    rope_scaling_beta_slow: float = 1.0
    rope_scaling_mscale: float = 0.0  # 0 = unset
    rope_scaling_mscale_all_dim: float = 0.0  # 0 = unset; V3 sets 1.0
    # floor/ceil the yarn correction range (DeepSeek True, GPT-OSS False).
    rope_scaling_truncate: bool = True
    # Phi-3 "longrope" (rope_scaling_type="longrope"): per-dim inv_freq
    # divisors, len rotary_dim//2 (= head_dim//2 under full rotary; with
    # partial_rotary_factor < 1 the tables cover only the rotated dims).
    # Short factors apply while max position+1
    # <= original_max_position_embeddings, long factors beyond (the switch
    # is made at runtime from the live positions, matching transformers'
    # dynamic rope update); both tables carry the same attention factor
    # sqrt(1 + ln(max/original)/ln(original)).
    rope_scaling_short_factor: tuple = ()
    rope_scaling_long_factor: tuple = ()
    # Rotary on the first partial_rotary_factor*head_dim dims only, the
    # rest pass through unrotated (Phi-3-small / GLM / Nemotron). 1.0 =
    # full rotary.
    partial_rotary_factor: float = 1.0
    # --- OLMo-2 ---
    # Norms on sublayer OUTPUTS: x += post_attention_layernorm(attn(x));
    # x += post_feedforward_layernorm(mlp(x)); no input norms. Mutually
    # exclusive with sandwich_norms.
    post_norm: bool = False
    # qk_norm over the full projection width [H*Dh] before the head split
    # (OLMo-2), instead of per-head over head_dim (Qwen3/Gemma-3).
    qk_norm_full: bool = False
    # GPT-NeoX/Pythia architecture axis:
    # "layernorm" = mean-centred norm with a bias (vs the RMSNorm default).
    norm_type: str = "rmsnorm"
    # Parallel residual: x + attn(ln1(x)) + mlp(ln2(x)) — BOTH sublayers
    # read norms of the SAME input; one residual add (NeoX
    # use_parallel_residual).
    parallel_block: bool = False
    # False = plain 2-layer MLP (up -> act -> down; NeoX dense_h_to_4h /
    # dense_4h_to_h), True = gated SwiGLU/GeGLU.
    mlp_gated: bool = True
    # Falcon-7B flavor of parallel_block: ONE input_layernorm feeds BOTH
    # sublayers (NeoX keeps a second norm for the MLP leg).
    parallel_block_single_norm: bool = False
    # "rope" (default) | "learned" (GPT-2-class absolute position table
    # added to the token embedding; attention is rope-free) | "alibi"
    # (BLOOM/MPT: rope-free, per-head linear distance biases on the
    # attention logits — slopes derived from the head count).
    position_embedding: str = "rope"
    # Biases on the MLP projections (NeoX has them everywhere).
    mlp_bias: bool = False
    # BLOOM: LayerNorm applied directly to the token embedding output.
    embedding_layernorm: bool = False
    # Cohere Command-R: multiply the lm_head logits by this constant
    # (0.0 = off).
    logit_scale: float = 0.0

    def __post_init__(self):
        _coerce_tuple_fields(self)
        if self.norm_type not in ("rmsnorm", "layernorm"):
            raise ValueError("norm_type must be 'rmsnorm' or 'layernorm'")
        if self.position_embedding not in ("rope", "learned", "alibi"):
            raise ValueError(
                "position_embedding must be 'rope', 'learned' or 'alibi'"
            )
        if self.parallel_block and (self.post_norm or self.sandwich_norms):
            raise ValueError(
                "parallel_block is exclusive with post_norm/sandwich_norms"
            )

    @property
    def head_dim(self) -> int:
        return self.head_dim_override or (
            self.hidden_size // self.num_attention_heads
        )

    @property
    def is_moe(self) -> bool:
        return self.num_local_experts > 0

    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank > 0

    def layer_is_moe(self, layer_idx: int) -> bool:
        """DeepSeek interleaves dense and MoE layers: the first
        ``first_k_dense_replace`` layers keep the dense MLP."""
        return self.is_moe and layer_idx >= self.first_k_dense_replace

    @classmethod
    def llama2_7b(cls) -> "ModelConfig":
        return cls()

    @classmethod
    def llama2_70b(cls) -> "ModelConfig":
        return cls(
            hidden_size=8192,
            intermediate_size=28672,
            num_hidden_layers=80,
            num_attention_heads=64,
            num_key_value_heads=8,
        )

    @classmethod
    def mistral_7b(cls) -> "ModelConfig":
        return cls(
            vocab_size=32000,
            hidden_size=4096,
            intermediate_size=14336,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=8,
            max_position_embeddings=32768,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            sliding_window=4096,
        )

    @classmethod
    def llama3_8b(cls) -> "ModelConfig":
        return cls(
            vocab_size=128256,
            hidden_size=4096,
            intermediate_size=14336,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=8,
            max_position_embeddings=131072,
            rms_norm_eps=1e-5,
            rope_theta=500000.0,
            rope_scaling_type="llama3",
            rope_scaling_factor=8.0,
            rope_scaling_low_freq_factor=1.0,
            rope_scaling_high_freq_factor=4.0,
            rope_scaling_original_max_position_embeddings=8192,
        )

    @classmethod
    def mixtral_8x7b(cls) -> "ModelConfig":
        return cls(
            hidden_size=4096,
            intermediate_size=14336,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=8,
            max_position_embeddings=32768,
            rope_theta=1e6,
            num_local_experts=8,
            num_experts_per_tok=2,
        )

    @classmethod
    def qwen2_7b(cls) -> "ModelConfig":
        return cls(
            vocab_size=152064,
            hidden_size=3584,
            intermediate_size=18944,
            num_hidden_layers=28,
            num_attention_heads=28,
            num_key_value_heads=4,
            max_position_embeddings=32768,
            rms_norm_eps=1e-6,
            rope_theta=1e6,
            attention_bias=True,
        )

    @classmethod
    def gemma_7b(cls) -> "ModelConfig":
        return cls(
            vocab_size=256000,
            hidden_size=3072,
            intermediate_size=24576,
            num_hidden_layers=28,
            num_attention_heads=16,
            num_key_value_heads=16,
            max_position_embeddings=8192,
            rms_norm_eps=1e-6,
            tie_word_embeddings=True,
            hidden_act="gelu_tanh",
            rmsnorm_unit_offset=True,
            scale_embeddings=True,
            head_dim_override=256,
        )

    @classmethod
    def qwen3_8b(cls) -> "ModelConfig":
        return cls(
            vocab_size=151936,
            hidden_size=4096,
            intermediate_size=12288,
            num_hidden_layers=36,
            num_attention_heads=32,
            num_key_value_heads=8,
            max_position_embeddings=40960,
            rms_norm_eps=1e-6,
            rope_theta=1e6,
            head_dim_override=128,
            qk_norm=True,
        )

    @classmethod
    def qwen3_moe_30b_a3b(cls) -> "ModelConfig":
        return cls(
            vocab_size=151936,
            hidden_size=2048,
            intermediate_size=6144,
            num_hidden_layers=48,
            num_attention_heads=32,
            num_key_value_heads=4,
            max_position_embeddings=40960,
            rms_norm_eps=1e-6,
            rope_theta=1e6,
            head_dim_override=128,
            qk_norm=True,
            num_local_experts=128,
            num_experts_per_tok=8,
            moe_intermediate_size=768,
        )

    @classmethod
    def gemma2_9b(cls) -> "ModelConfig":
        return cls(
            vocab_size=256000,
            hidden_size=3584,
            intermediate_size=14336,
            num_hidden_layers=42,
            num_attention_heads=16,
            num_key_value_heads=8,
            max_position_embeddings=8192,
            rms_norm_eps=1e-6,
            tie_word_embeddings=True,
            hidden_act="gelu_tanh",
            rmsnorm_unit_offset=True,
            scale_embeddings=True,
            head_dim_override=256,
            sliding_window=4096,
            alternating_sliding_window=True,
            query_pre_attn_scalar=256.0,
            attn_logit_softcap=50.0,
            final_logit_softcap=30.0,
            sandwich_norms=True,
        )

    @classmethod
    def gpt_oss_20b(cls) -> "ModelConfig":
        """GPT-OSS-20B (21B-A3.6B): GQA with learned per-head attention
        sinks + biases on all projections, alternating sliding window,
        untruncated yarn, fused-interleaved clamped-glu MoE with a biased
        router and softmax-after-top-k."""
        return cls(
            vocab_size=201088,
            hidden_size=2880,
            intermediate_size=2880,
            num_hidden_layers=24,
            num_attention_heads=64,
            num_key_value_heads=8,
            max_position_embeddings=131072,
            rms_norm_eps=1e-5,
            rope_theta=150000.0,
            head_dim_override=64,
            sliding_window=128,
            alternating_sliding_window=True,
            attention_bias=True,
            attention_out_bias=True,
            learned_attention_sinks=True,
            num_local_experts=32,
            num_experts_per_tok=4,
            moe_variant="gpt_oss",
            moe_router_bias=True,
            moe_softmax_after_topk=True,
            rope_scaling_type="yarn",
            rope_scaling_factor=32.0,
            rope_scaling_beta_fast=32.0,
            rope_scaling_beta_slow=1.0,
            rope_scaling_truncate=False,
            rope_scaling_original_max_position_embeddings=4096,
        )

    @classmethod
    def gemma3_4b(cls) -> "ModelConfig":
        """Gemma-3-4B (text): 5:1 sliding/global layer pattern, dual rope
        bases (global 1e6 linear-scaled 8x, local 1e4 unscaled), zero-centred
        qk-norms, sandwich norms, no softcaps."""
        return cls(
            vocab_size=262208,
            hidden_size=2560,
            intermediate_size=10240,
            num_hidden_layers=34,
            num_attention_heads=8,
            num_key_value_heads=4,
            max_position_embeddings=131072,
            rms_norm_eps=1e-6,
            rope_theta=1e6,
            rope_local_theta=10000.0,
            rope_scaling_type="linear",
            rope_scaling_factor=8.0,
            tie_word_embeddings=True,
            hidden_act="gelu_tanh",
            rmsnorm_unit_offset=True,
            scale_embeddings=True,
            head_dim_override=256,
            sliding_window=1024,
            sliding_window_pattern=6,
            query_pre_attn_scalar=256.0,
            sandwich_norms=True,
            qk_norm=True,
        )

    @classmethod
    def deepseek_v2_lite(cls) -> "ModelConfig":
        """DeepSeek-V2-Lite (16B-A2.4B): MLA attention (no q compression)
        + DeepSeek MoE with 2 shared experts, softmax greedy routing."""
        return cls(
            vocab_size=102400,
            hidden_size=2048,
            intermediate_size=10944,
            num_hidden_layers=27,
            num_attention_heads=16,
            num_key_value_heads=16,
            max_position_embeddings=163840,
            rms_norm_eps=1e-6,
            rope_theta=10000.0,
            rope_interleave=True,
            kv_lora_rank=512,
            q_lora_rank=0,
            qk_nope_head_dim=128,
            qk_rope_head_dim=64,
            v_head_dim=128,
            num_local_experts=64,
            num_experts_per_tok=6,
            moe_intermediate_size=1408,
            moe_norm_topk=False,
            n_shared_experts=2,
            routed_scaling_factor=1.0,
            first_k_dense_replace=1,
            rope_scaling_type="yarn",
            rope_scaling_factor=40.0,
            rope_scaling_beta_fast=32.0,
            rope_scaling_beta_slow=1.0,
            rope_scaling_mscale=0.707,
            rope_scaling_mscale_all_dim=0.707,
            rope_scaling_original_max_position_embeddings=4096,
        )

    @classmethod
    def deepseek_v3(cls) -> "ModelConfig":
        """DeepSeek-V3/R1 (671B-A37B): MLA with compressed q + sigmoid
        noaux-tc routing (gate bias, group-limited top-k, shared expert)."""
        return cls(
            vocab_size=129280,
            hidden_size=7168,
            intermediate_size=18432,
            num_hidden_layers=61,
            num_attention_heads=128,
            num_key_value_heads=128,
            max_position_embeddings=163840,
            rms_norm_eps=1e-6,
            rope_theta=10000.0,
            rope_interleave=True,
            kv_lora_rank=512,
            q_lora_rank=1536,
            qk_nope_head_dim=128,
            qk_rope_head_dim=64,
            v_head_dim=128,
            num_local_experts=256,
            num_experts_per_tok=8,
            moe_intermediate_size=2048,
            moe_norm_topk=True,
            n_shared_experts=1,
            routed_scaling_factor=2.5,
            moe_score_func="sigmoid",
            moe_gate_bias=True,
            n_group=8,
            topk_group=4,
            first_k_dense_replace=3,
            rope_scaling_type="yarn",
            rope_scaling_factor=40.0,
            rope_scaling_beta_fast=32.0,
            rope_scaling_beta_slow=1.0,
            rope_scaling_mscale=1.0,
            rope_scaling_mscale_all_dim=1.0,
            rope_scaling_original_max_position_embeddings=4096,
        )

    @classmethod
    def phi3_mini(cls) -> "ModelConfig":
        """Phi-3-mini-4k: Llama-shaped with NATIVELY fused qkv/gate_up
        projections (build the model with fused=True; hf_import maps the
        fused HF weights directly) and MHA (kv == heads)."""
        return cls(
            vocab_size=32064,
            hidden_size=3072,
            intermediate_size=8192,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=32,
            max_position_embeddings=4096,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            sliding_window=2047,
        )

    @classmethod
    def olmo2_7b(cls) -> "ModelConfig":
        """OLMo-2-7B: post-norm layers (norms on sublayer outputs) +
        full-width q/k RMSNorms, MHA, rope theta 5e5."""
        return cls(
            vocab_size=100352,
            hidden_size=4096,
            intermediate_size=11008,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=32,
            max_position_embeddings=4096,
            rms_norm_eps=1e-6,
            rope_theta=500000.0,
            post_norm=True,
            qk_norm=True,
            qk_norm_full=True,
        )

    @classmethod
    def pythia_6_9b(cls) -> "ModelConfig":
        """GPT-NeoX family (Pythia-6.9B): LayerNorm (biased), parallel
        residual blocks, plain biased MLP, partial rotary (pct 0.25)."""
        return cls(
            vocab_size=50432,
            hidden_size=4096,
            intermediate_size=16384,
            num_hidden_layers=32,
            num_attention_heads=32,
            num_key_value_heads=32,
            max_position_embeddings=2048,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            norm_type="layernorm",
            parallel_block=True,
            mlp_gated=False,
            mlp_bias=True,
            attention_bias=True,
            attention_out_bias=True,
            hidden_act="gelu_exact",
            partial_rotary_factor=0.25,
        )

    @classmethod
    def falcon_7b(cls) -> "ModelConfig":
        """Falcon-7B: multi-query attention (kv_heads=1), parallel residual
        with ONE shared input norm, plain unbiased gelu MLP, LayerNorm."""
        return cls(
            vocab_size=65024,
            hidden_size=4544,
            intermediate_size=4544 * 4,
            num_hidden_layers=32,
            num_attention_heads=71,
            num_key_value_heads=1,
            max_position_embeddings=2048,
            rms_norm_eps=1e-5,
            rope_theta=10000.0,
            norm_type="layernorm",
            parallel_block=True,
            parallel_block_single_norm=True,
            mlp_gated=False,
            hidden_act="gelu_exact",
            tie_word_embeddings=True,
        )

    @classmethod
    def starcoder2_7b(cls) -> "ModelConfig":
        """StarCoder2-7B: biased LayerNorm, plain biased gelu MLP
        (c_fc/c_proj), GQA, sliding-window attention, high rope theta."""
        return cls(
            vocab_size=49152,
            hidden_size=4608,
            intermediate_size=18432,
            num_hidden_layers=32,
            num_attention_heads=36,
            num_key_value_heads=4,
            max_position_embeddings=16384,
            rms_norm_eps=1e-5,
            rope_theta=1e6,
            norm_type="layernorm",
            mlp_gated=False,
            mlp_bias=True,
            attention_bias=True,
            attention_out_bias=True,
            hidden_act="gelu",
            sliding_window=4096,
        )

    @classmethod
    def bloom_560m(cls) -> "ModelConfig":
        """BLOOM-560m: ALiBi positions (rope-free), embedding LayerNorm,
        biased LayerNorms everywhere, fused interleaved qkv in the HF
        checkpoint (hf_import de-interleaves), plain biased gelu MLP,
        tied head."""
        return cls(
            vocab_size=250880,
            hidden_size=1024,
            intermediate_size=4096,
            num_hidden_layers=24,
            num_attention_heads=16,
            num_key_value_heads=16,
            max_position_embeddings=2048,
            norm_type="layernorm",
            mlp_gated=False,
            mlp_bias=True,
            attention_bias=True,
            attention_out_bias=True,
            hidden_act="gelu",
            position_embedding="alibi",
            embedding_layernorm=True,
            tie_word_embeddings=True,
        )

    @classmethod
    def gpt2(cls) -> "ModelConfig":
        """GPT-2 (124M): learned absolute positions, biased LayerNorm,
        plain biased gelu MLP, MHA, tied lm_head."""
        return cls(
            vocab_size=50257,
            hidden_size=768,
            intermediate_size=3072,
            num_hidden_layers=12,
            num_attention_heads=12,
            num_key_value_heads=12,
            max_position_embeddings=1024,
            rms_norm_eps=1e-5,
            norm_type="layernorm",
            position_embedding="learned",
            mlp_gated=False,
            mlp_bias=True,
            attention_bias=True,
            attention_out_bias=True,
            hidden_act="gelu",
            tie_word_embeddings=True,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 256) -> "ModelConfig":
        """2-layer d=512 toy config (acceptance config 2, BASELINE.json:8)."""
        return cls(
            vocab_size=vocab_size,
            hidden_size=512,
            intermediate_size=1024,
            num_hidden_layers=2,
            num_attention_heads=8,
            num_key_value_heads=8,
            max_position_embeddings=512,
        )


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout (SURVEY.md §2.2)."""

    dp: int = 1
    tp: int = 1
    axis_names: tuple = ("data", "model")

    def __post_init__(self):
        _coerce_tuple_fields(self)


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Continuous-batching serving engine config."""

    max_batch_size: int = 8
    max_seq_len: int = 2048
    # Tokens per KV page. 128 balances paged-kernel streaming efficiency
    # (0.95 of HBM bandwidth at B=8/KV=32/S=2048 vs 0.72 at ps=64, 1.0+ at
    # ps=256 — bench/paged_probe.py, v5e) against per-sequence fragmentation
    # (up to page_size-1 wasted token slots per live request).
    page_size: int = 128
    prefill_chunk: int = 512
    max_new_tokens: int = 256
    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0
    top_p: float = 1.0  # nucleus sampling threshold (1.0 => disabled)
    min_p: float = 0.0  # min-p truncation (0.0 => disabled)
    # HF-semantics repetition penalty over prompt + generated tokens
    # (1.0 => disabled; maintained as an on-device [B, V] count buffer).
    repetition_penalty: float = 1.0
    # OpenAI-style additive penalties over the same counts (0 => disabled):
    # logits -= frequency_penalty * count + presence_penalty * (count > 0).
    # Engine defaults; per-request overrides via add_request — which need
    # the count buffer, so enable counts by setting either nonzero here
    # (or repetition_penalty != 1).
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # Record each generated token's log-probability (pre-truncation) in
    # Request.logprobs / the HTTP response.
    return_logprobs: bool = False
    # Compile-time width for per-request top_logprobs alternatives (OpenAI
    # caps the API at 20): every requesting tick computes lax.top_k at THIS
    # k — one compiled program regardless of what k each request asks for —
    # and the host slices each request down to its own k.
    max_top_logprobs: int = 8
    seed: int = 0
    # Ring-layout streaming (kv_layout='ring'): serving-time window for
    # models WITHOUT a trained sliding window (0 = use cfg.sliding_window),
    # and StreamingLLM attention sinks — the first N positions stay visible
    # forever while the ring slides.
    stream_window: int = 0
    attention_sinks: int = 0
    # Block-level prefix caching (paged layout only): requests sharing a
    # prompt prefix adopt the resident KV pages and skip their prefill
    # (engine/prefix_cache.py). Exact: shared pages are bit-identical to
    # recomputation.
    prefix_cache: bool = False

    def __post_init__(self):
        _coerce_tuple_fields(self)


def to_json(cfg: Any) -> str:
    return json.dumps(dataclasses.asdict(cfg), indent=2)


def from_json(cls, s: str):
    # Tuple coercion happens in each config's __post_init__.
    return cls(**json.loads(s))
