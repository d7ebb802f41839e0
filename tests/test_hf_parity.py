"""Cross-framework parity: our decoder vs transformers' reference models.

The strongest available oracle for model-tier semantics (SURVEY.md §4.2
step 3): instantiate the real HF implementation (torch CPU) on a tiny
random-weight config, import its state dict via models.hf_import, and demand
fp32 logit agreement. This pins RoPE pairing, norm semantics (incl. Gemma's
(1+w) zero-centred variant), activation functions (SwiGLU vs GeGLU),
GQA head grouping, attention scaling, bias handling (Qwen2), embedding
scaling, and weight-layout transposes against upstream — not against our
own reimplementation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from protoquant_tpu.models import LlamaModel
from protoquant_tpu.models.hf_import import import_hf_llama
from protoquant_tpu.utils.config import ModelConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _logits_ours(cfg: ModelConfig, sd, tokens_np):
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = import_hf_llama(sd, cfg)
    return np.asarray(model.apply(params, jnp.asarray(tokens_np)))


def _state_dict_np(hf_model):
    return {k: v.detach().cpu().numpy() for k, v in hf_model.state_dict().items()}


def _tokens(vocab, batch=2, t=12, seed=0):
    return np.random.default_rng(seed).integers(0, vocab, (batch, t)).astype(np.int32)


@torch.no_grad()
def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    toks = _tokens(64)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@torch.no_grad()
def test_qwen2_parity():
    """Qwen2 = Llama arch + q/k/v biases + high rope theta."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=1e6,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = Qwen2ForCausalLM(hf_cfg).eval().float()
    # Qwen2's bias init is zeros; make them non-trivial so the test actually
    # exercises the bias path end-to-end.
    sd = hf.state_dict()
    for k in list(sd):
        if k.endswith(("q_proj.bias", "k_proj.bias", "v_proj.bias")):
            sd[k].normal_(0.0, 0.05, generator=torch.Generator().manual_seed(7))
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=1e6,
        attention_bias=True,
    )
    toks = _tokens(64, seed=1)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@torch.no_grad()
def test_gemma_parity():
    """Gemma = GeGLU + zero-centred (1+w) RMSNorm + scaled embeddings +
    head_dim != hidden/heads + tied lm_head."""
    from transformers import GemmaConfig, GemmaForCausalLM

    hf_cfg = GemmaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(2)
    hf = GemmaForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        tie_word_embeddings=True, hidden_act="gelu_tanh",
        rmsnorm_unit_offset=True, scale_embeddings=True, head_dim_override=32,
    )
    toks = _tokens(64, seed=2)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@torch.no_grad()
def test_mistral_sliding_window_parity():
    """Mistral = Llama arch + sliding-window attention. T=12 > window=5 so
    the window mask actually bites in this test."""
    from transformers import MistralConfig, MistralForCausalLM

    hf_cfg = MistralConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=5, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    hf = MistralForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=5,
    )
    toks = _tokens(64, seed=3)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Control: the window changed the math (full-causal differs).
    full = _logits_ours(
        ModelConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64,
        ),
        _state_dict_np(hf),
        toks,
    )
    assert np.abs(full - theirs).max() > 1e-3


@torch.no_grad()
def test_llama3_rope_scaling_parity():
    """Llama-3.1 NTK-by-parts rope scaling, pinned against transformers'
    _compute_llama3_parameters. original_max < T so every band is active."""
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
        rope_scaling={
            "rope_type": "llama3", "factor": 2.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 8,
        },
    )
    torch.manual_seed(4)
    hf = LlamaForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_scaling_type="llama3",
        rope_scaling_factor=2.0, rope_scaling_low_freq_factor=1.0,
        rope_scaling_high_freq_factor=4.0,
        rope_scaling_original_max_position_embeddings=8,
    )
    toks = _tokens(64, seed=4)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Control: scaling changed the math vs unscaled rope.
    unscaled = _logits_ours(
        ModelConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64,
        ),
        _state_dict_np(hf),
        toks,
    )
    assert np.abs(unscaled - theirs).max() > 1e-3


@torch.no_grad()
def test_llama_linear_rope_scaling_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        tie_word_embeddings=False,
        rope_scaling={"rope_type": "linear", "factor": 4.0},
    )
    torch.manual_seed(5)
    hf = LlamaForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_scaling_type="linear",
        rope_scaling_factor=4.0,
    )
    toks = _tokens(64, seed=5)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@torch.no_grad()
def test_gemma2_parity():
    """Gemma-2 = sandwich norms (post-attn + pre/post-FFN, all (1+w)) +
    attention-logit soft-capping + query_pre_attn_scalar score scaling +
    alternating sliding window + final-logit soft-capping. T=12 > window=4
    so the even layers' window bites."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    hf_cfg = Gemma2Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=10000.0, hidden_act="gelu_pytorch_tanh",
        query_pre_attn_scalar=16.0, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, sliding_window=4,
        attn_implementation="eager",
    )
    torch.manual_seed(6)
    hf = Gemma2ForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        tie_word_embeddings=True, hidden_act="gelu_tanh",
        rmsnorm_unit_offset=True, scale_embeddings=True, head_dim_override=32,
        query_pre_attn_scalar=16.0, attn_logit_softcap=50.0,
        final_logit_softcap=30.0, sliding_window=4,
        alternating_sliding_window=True, sandwich_norms=True,
    )
    toks = _tokens(64, seed=6)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


@torch.no_grad()
def test_qwen3_parity():
    """Qwen3 = Llama arch + per-head q/k RMSNorm (pre-RoPE) + high theta."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=1e6, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(8)
    hf = Qwen3ForCausalLM(hf_cfg).eval().float()
    # Non-trivial norm weights so the q/k-norm path is actually exercised.
    sd = hf.state_dict()
    for k in list(sd):
        if k.endswith(("q_norm.weight", "k_norm.weight")):
            sd[k].normal_(1.0, 0.2, generator=torch.Generator().manual_seed(9))
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=1e6,
        head_dim_override=16, qk_norm=True,
    )
    toks = _tokens(64, seed=8)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Control: zeroing the norm path would change the math.
    plain = _logits_ours(
        ModelConfig(
            vocab_size=64, hidden_size=64, intermediate_size=128,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=1e6,
            head_dim_override=16,
        ),
        {k: v for k, v in _state_dict_np(hf).items() if "q_norm" not in k and "k_norm" not in k},
        toks,
    )
    assert np.abs(plain - theirs).max() > 1e-3


@torch.no_grad()
def test_mixtral_parity():
    """Mixtral MoE routing + experts vs transformers, with the capacity
    factor raised so the GShard dispatch drops nothing (HF routes without
    capacity limits; at equal effective routing the math must agree)."""
    from transformers import MixtralConfig, MixtralForCausalLM

    hf_cfg = MixtralConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=1e6,
        num_local_experts=4, num_experts_per_tok=2,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(10)
    hf = MixtralForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=1e6,
        num_local_experts=4, num_experts_per_tok=2,
        expert_capacity_factor=8.0,  # no drops -> comparable to HF routing
    )
    toks = _tokens(64, seed=10)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


@torch.no_grad()
def test_qwen3_moe_parity():
    """Qwen3-MoE = Qwen3 attention (qk-norm) + MoE MLP with its own expert
    width (moe_intermediate_size) and gate_proj/up_proj/down_proj naming."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    hf_cfg = Qwen3MoeConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=1e6, num_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, norm_topk_prob=True,
        decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(11)
    hf = Qwen3MoeForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=1e6,
        head_dim_override=16, qk_norm=True,
        num_local_experts=4, num_experts_per_tok=2,
        moe_intermediate_size=32, expert_capacity_factor=8.0,
    )
    toks = _tokens(64, seed=11)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)


@torch.no_grad()
def test_deepseek_v2_mla_parity():
    """DeepSeek-V2 MLA attention (all-dense layers): latent KV compression,
    decoupled interleaved rope, kv_a/q-side layernorms, (dn+dr)^-0.5 scaling.
    first_k_dense_replace >= layers keeps every MLP dense so this pins the
    attention tier in isolation."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    hf_cfg = DeepseekV2Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        kv_lora_rank=16, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=2,
        topk_method="greedy", norm_topk_prob=False, routed_scaling_factor=1.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(12)
    hf = DeepseekV2ForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        rope_interleave=True, kv_lora_rank=16, q_lora_rank=0,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        num_local_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=2, moe_norm_topk=False,
    )
    toks = _tokens(64, seed=12)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)

    # Control: half-split rope pairing is the wrong math for DeepSeek.
    import dataclasses

    wrong = _logits_ours(
        dataclasses.replace(cfg, rope_interleave=False),
        _state_dict_np(hf), toks,
    )
    assert np.abs(wrong - theirs).max() > 1e-3


@torch.no_grad()
def test_deepseek_v2_moe_parity():
    """DeepSeek-V2 MoE: softmax greedy router with routed_scaling_factor +
    2 shared experts + first_k_dense_replace interleaving."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    hf_cfg = DeepseekV2Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        kv_lora_rank=16, q_lora_rank=None, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=2, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False, routed_scaling_factor=1.5,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(13)
    hf = DeepseekV2ForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        rope_interleave=True, kv_lora_rank=16, q_lora_rank=0,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        num_local_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=2, first_k_dense_replace=1, moe_norm_topk=False,
        routed_scaling_factor=1.5, expert_capacity_factor=8.0,
    )
    toks = _tokens(64, seed=13)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=4e-4, atol=4e-4)


@torch.no_grad()
def test_deepseek_v3_parity():
    """DeepSeek-V3/R1: compressed q (q_a/q_b + layernorm) + sigmoid noaux-tc
    router (e_score_correction_bias for selection only, top-2-sum group
    scores, group-limited top-k, normalized weights * routed_scaling)."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    hf_cfg = DeepseekV3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        kv_lora_rank=16, q_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1,
        n_group=4, topk_group=2, norm_topk_prob=True,
        routed_scaling_factor=2.5, rope_interleave=True,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(14)
    hf = DeepseekV3ForCausalLM(hf_cfg).eval().float()
    # The correction bias ships as zeros; randomize so the biased-selection
    # path (bias changes WHO is picked but not the combine weights) is
    # actually exercised.
    sd = hf.state_dict()
    for k in list(sd):
        if k.endswith("e_score_correction_bias"):
            sd[k].normal_(0.0, 0.5, generator=torch.Generator().manual_seed(15))
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        rope_interleave=True, kv_lora_rank=16, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        num_local_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=1, moe_norm_topk=True,
        routed_scaling_factor=2.5, moe_score_func="sigmoid",
        moe_gate_bias=True, n_group=4, topk_group=2,
        expert_capacity_factor=8.0,
    )
    toks = _tokens(64, seed=14)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=4e-4, atol=4e-4)


@torch.no_grad()
def test_deepseek_v3_yarn_parity():
    """YaRN rope scaling (what real DeepSeek checkpoints ship): ramped
    interpolation between the beta_fast/beta_slow correction dims,
    attention_factor on cos/sin, and V3's mscale^2 softmax-scale term.
    original_max (4) < T (12) so the scaled bands are all active."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    rope_scaling = {
        "rope_type": "yarn", "factor": 16.0, "beta_fast": 32.0,
        "beta_slow": 1.0, "mscale": 0.707, "mscale_all_dim": 0.707,
        "original_max_position_embeddings": 4,
    }
    hf_cfg = DeepseekV3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        kv_lora_rank=16, q_lora_rank=24, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=2,
        n_group=2, topk_group=1, norm_topk_prob=True,
        routed_scaling_factor=1.0, rope_interleave=True,
        rope_scaling=rope_scaling,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(16)
    hf = DeepseekV3ForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=10000.0,
        rope_interleave=True, kv_lora_rank=16, q_lora_rank=24,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
        num_local_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
        n_shared_experts=1, first_k_dense_replace=2, moe_norm_topk=True,
        moe_score_func="sigmoid", moe_gate_bias=True, n_group=2, topk_group=1,
        expert_capacity_factor=8.0,
        rope_scaling_type="yarn", rope_scaling_factor=16.0,
        rope_scaling_beta_fast=32.0, rope_scaling_beta_slow=1.0,
        rope_scaling_mscale=0.707, rope_scaling_mscale_all_dim=0.707,
        rope_scaling_original_max_position_embeddings=4,
    )
    toks = _tokens(64, seed=16)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=4e-4, atol=4e-4)

    # Control: yarn changed the math vs unscaled rope.
    import dataclasses

    unscaled = _logits_ours(
        dataclasses.replace(cfg, rope_scaling_type=""),
        _state_dict_np(hf), toks,
    )
    assert np.abs(unscaled - theirs).max() > 1e-3


@torch.no_grad()
def test_gemma3_parity():
    """Gemma-3 = Gemma-2 machinery (sandwich norms, GeGLU, scaled embeds,
    query_pre_attn_scalar) + zero-centred per-head qk-norms + an every-Nth-
    layer-global sliding pattern with DUAL rope bases: global layers use
    rope_theta with linear scaling, sliding layers rope_local_base_freq
    unscaled. T=12 > window=4 so layer 0's window bites; pattern=2 makes
    layer 1 global."""
    from transformers import Gemma3ForCausalLM, Gemma3TextConfig

    hf_cfg = Gemma3TextConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=32, max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=1_000_000.0, rope_local_base_freq=10_000.0,
        rope_scaling={"rope_type": "linear", "factor": 8.0},
        hidden_activation="gelu_pytorch_tanh", query_pre_attn_scalar=16.0,
        sliding_window=4, sliding_window_pattern=2,
        attn_implementation="eager",
    )
    torch.manual_seed(17)
    hf = Gemma3ForCausalLM(hf_cfg).eval().float()
    # qk-norm weights init to zeros-centred identity; randomize so the path
    # is exercised.
    sd = hf.state_dict()
    for k in list(sd):
        if k.endswith(("q_norm.weight", "k_norm.weight")):
            sd[k].normal_(0.0, 0.2, generator=torch.Generator().manual_seed(18))
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6,
        rope_theta=1_000_000.0, rope_local_theta=10_000.0,
        rope_scaling_type="linear", rope_scaling_factor=8.0,
        tie_word_embeddings=True, hidden_act="gelu_tanh",
        rmsnorm_unit_offset=True, scale_embeddings=True, head_dim_override=32,
        query_pre_attn_scalar=16.0, sliding_window=4,
        sliding_window_pattern=2, sandwich_norms=True, qk_norm=True,
    )
    toks = _tokens(64, seed=17)
    ours = _logits_ours(cfg, sd := {k: v.numpy() for k, v in sd.items()}, toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)

    # Control: a single shared rope base is the wrong math.
    import dataclasses

    wrong = _logits_ours(
        dataclasses.replace(cfg, rope_local_theta=0.0), sd, toks
    )
    assert np.abs(wrong - theirs).max() > 1e-3


@torch.no_grad()
def test_phi3_longrope_parity():
    """Phi-3: natively fused qkv/gate_up projections + longrope scaling
    (per-dim inv_freq divisors, short/long switch at the original-max
    boundary, sqrt(1+ln(s)/ln(orig)) attention factor) + partial rotary
    (rot = head_dim * 0.5; the upper dims pass through unrotated) + sliding
    window. T=12 > original_max=8 so the LONG factors are active; a second
    T=6 forward pins the short branch."""
    from transformers import Phi3Config, Phi3ForCausalLM

    hf_cfg = Phi3Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, original_max_position_embeddings=8,
        rms_norm_eps=1e-5, rope_theta=10000.0, partial_rotary_factor=0.5,
        sliding_window=5, tie_word_embeddings=False, pad_token_id=0,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0, 1.1, 1.3, 1.6],
            "long_factor": [2.0, 2.5, 3.0, 4.0],
        },
        attn_implementation="eager",
    )
    torch.manual_seed(21)
    hf = Phi3ForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        sliding_window=5, partial_rotary_factor=0.5,
        rope_scaling_type="longrope",
        rope_scaling_original_max_position_embeddings=8,
        rope_scaling_short_factor=(1.0, 1.1, 1.3, 1.6),
        rope_scaling_long_factor=(2.0, 2.5, 3.0, 4.0),
    )
    sd = _state_dict_np(hf)

    def ours_fused(c, toks):
        model = LlamaModel(c, mode="fp", dtype=jnp.float32, fused=True)
        return np.asarray(model.apply(import_hf_llama(sd, c), jnp.asarray(toks)))

    toks = _tokens(64, seed=21)  # T=12 > 8: long factors
    ours = ours_fused(cfg, toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=3e-4, atol=3e-4)

    # Short branch: every position fits the original window.
    toks_s = _tokens(64, batch=2, t=6, seed=22)
    ours_s = ours_fused(cfg, toks_s)
    theirs_s = hf(torch.from_numpy(toks_s).long()).logits.numpy()
    np.testing.assert_allclose(ours_s, theirs_s, rtol=3e-4, atol=3e-4)

    import dataclasses

    # Control 1: swapping in the short factors at T=12 changes the math
    # (the runtime switch is load-bearing).
    wrong = ours_fused(
        dataclasses.replace(
            cfg, rope_scaling_long_factor=(1.0, 1.1, 1.3, 1.6)
        ),
        toks,
    )
    assert np.abs(wrong - theirs).max() > 1e-3
    # Control 2: full rotary is the wrong math for partial_rotary=0.5.
    wrong2 = ours_fused(
        dataclasses.replace(
            cfg, partial_rotary_factor=1.0,
            rope_scaling_short_factor=(1.0,) * 8,
            rope_scaling_long_factor=(2.0,) * 8,
        ),
        toks,
    )
    assert np.abs(wrong2 - theirs).max() > 1e-3


@torch.no_grad()
def test_olmo2_parity():
    """OLMo-2: post-norm layers (norms on sublayer OUTPUTS, no input norms)
    + FULL-WIDTH q/k RMSNorms ([H*Dh]/[KV*Dh], before the head split)."""
    from transformers import Olmo2Config, Olmo2ForCausalLM

    hf_cfg = Olmo2Config(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=500000.0,
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(23)
    hf = Olmo2ForCausalLM(hf_cfg).eval().float()
    # Non-trivial norm weights so the full-width q/k-norm path is exercised.
    sd = hf.state_dict()
    for k in list(sd):
        if k.endswith(("q_norm.weight", "k_norm.weight")):
            sd[k].normal_(1.0, 0.2, generator=torch.Generator().manual_seed(24))
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-6, rope_theta=500000.0,
        post_norm=True, qk_norm=True, qk_norm_full=True,
    )
    toks = _tokens(64, seed=23)
    sdn = {k: v.numpy() for k, v in sd.items()}
    ours = _logits_ours(cfg, sdn, toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Control: dropping the q/k norms changes the math (full-width weights
    # are shape-incompatible with the per-head branch, so the meaningful
    # ablation is norm vs no-norm).
    import dataclasses

    plain = _logits_ours(
        dataclasses.replace(cfg, qk_norm=False, qk_norm_full=False),
        {k: v for k, v in sdn.items()
         if not k.endswith(("q_norm.weight", "k_norm.weight"))},
        toks,
    )
    assert np.abs(plain - theirs).max() > 1e-3


@torch.no_grad()
def test_gpt_oss_parity():
    """GPT-OSS: learned per-head attention sinks (a trainable logit joining
    every softmax, probability mass dropped), biases on all four attention
    projections, alternating sliding window, untruncated yarn rope, and a
    fused-interleaved clamped-glu MoE with biased router +
    softmax-after-top-k. T=12 > window=4 so even layers' window bites."""
    from transformers import GptOssConfig, GptOssForCausalLM

    hf_cfg = GptOssConfig(
        vocab_size=64, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, rms_norm_eps=1e-5,
        rope_theta=150000.0, sliding_window=4,
        num_local_experts=4, num_experts_per_tok=2,
        rope_scaling={
            "rope_type": "yarn", "factor": 4.0, "beta_fast": 32.0,
            "beta_slow": 1.0, "truncate": False,
            "original_max_position_embeddings": 8,
        },
        tie_word_embeddings=False, attn_implementation="eager",
    )
    torch.manual_seed(19)
    hf = GptOssForCausalLM(hf_cfg).eval().float()
    # Randomize the sinks so the sink path is actually exercised (init is
    # already normal, but be explicit) and give biases real values.
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(20)
    for k in list(sd):
        if k.endswith("sinks") or k.endswith("bias"):
            sd[k].normal_(0.0, 0.5, generator=g)
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=32,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim_override=16, max_position_embeddings=64, rms_norm_eps=1e-5,
        rope_theta=150000.0, sliding_window=4,
        alternating_sliding_window=True,
        attention_bias=True, attention_out_bias=True,
        learned_attention_sinks=True,
        num_local_experts=4, num_experts_per_tok=2,
        moe_variant="gpt_oss", moe_router_bias=True,
        moe_softmax_after_topk=True, expert_capacity_factor=8.0,
        rope_scaling_type="yarn", rope_scaling_factor=4.0,
        rope_scaling_beta_fast=32.0, rope_scaling_beta_slow=1.0,
        rope_scaling_truncate=False,
        rope_scaling_original_max_position_embeddings=8,
    )
    toks = _tokens(64, seed=19)
    sdn = {k: v.numpy() for k, v in sd.items()}
    ours = _logits_ours(cfg, sdn, toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=4e-4, atol=4e-4)

    # Control: dropping the sinks changes the math.
    import dataclasses

    no_sinks = _logits_ours(
        dataclasses.replace(cfg, learned_attention_sinks=False),
        {k: v for k, v in sdn.items() if not k.endswith("sinks")}, toks,
    )
    assert np.abs(no_sinks - theirs).max() > 1e-3


@torch.no_grad()
def test_gpt_neox_parity():
    """GPT-NeoX/Pythia = a different architecture AXIS entirely: biased
    LayerNorm (mean-centred), PARALLEL residual blocks (attn and mlp both
    read norms of the same input), plain biased 2-layer gelu MLP, fused
    interleaved query_key_value, partial rotary (pct 0.25), untied
    embed_out — with a changed-math control on the parallel-residual flag."""
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    from protoquant_tpu.models.hf_import import import_hf_gpt_neox

    hf_cfg = GPTNeoXConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=64, rotary_pct=0.25, rotary_emb_base=10000,
        use_parallel_residual=True, layer_norm_eps=1e-5,
        tie_word_embeddings=False, attention_bias=True,
        hidden_act="gelu",
    )
    torch.manual_seed(5)
    hf = GPTNeoXForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        norm_type="layernorm", parallel_block=True, mlp_gated=False,
        mlp_bias=True, attention_bias=True, attention_out_bias=True,
        hidden_act="gelu_exact", partial_rotary_factor=0.25,
    )
    toks = _tokens(64, seed=5)
    sd = _state_dict_np(hf)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = import_hf_gpt_neox(sd, cfg)
    ours = np.asarray(model.apply(params, jnp.asarray(toks)))
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Changed-math control: a sequential-residual model must NOT match the
    # parallel-residual reference (guards against the test passing vacuously).
    import dataclasses as _dc

    seq_cfg = _dc.replace(cfg, parallel_block=False)
    seq = np.asarray(
        LlamaModel(seq_cfg, mode="fp", dtype=jnp.float32).apply(
            import_hf_gpt_neox(sd, seq_cfg), jnp.asarray(toks)
        )
    )
    assert np.abs(seq - theirs).max() > 1e-2


@torch.no_grad()
def test_falcon_parity():
    """Falcon-7B style = parallel residual with ONE shared input norm +
    multi-query attention (kv_heads=1) + plain unbiased gelu MLP +
    LayerNorm — exercises parallel_block_single_norm and the MQA edge of
    the GQA grouping."""
    from transformers import FalconConfig, FalconForCausalLM

    from protoquant_tpu.models.hf_import import import_hf_falcon

    hf_cfg = FalconConfig(
        vocab_size=64, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, new_decoder_architecture=False,
        multi_query=True, parallel_attn=True, bias=False, alibi=False,
        max_position_embeddings=64, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(9)
    hf = FalconForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        norm_type="layernorm", parallel_block=True,
        parallel_block_single_norm=True, mlp_gated=False,
        hidden_act="gelu_exact",
    )
    toks = _tokens(64, seed=9)
    sd = _state_dict_np(hf)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = import_hf_falcon(sd, cfg)
    ours = np.asarray(model.apply(params, jnp.asarray(toks)))
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Changed-math control: the two-norm (NeoX-style) parallel block must
    # NOT reproduce the shared-norm reference. The two-norm model has an
    # extra post_attention_layernorm param; initialize it to the imported
    # input norm so the comparison isolates the WIRING, not missing params.
    import dataclasses as _dc

    two_cfg = _dc.replace(cfg, parallel_block_single_norm=False)
    two_params = import_hf_falcon(sd, two_cfg)
    for i in range(cfg.num_hidden_layers):
        layer = two_params["params"][f"layers_{i}"]
        ln = dict(layer["input_layernorm"])
        # Perturb so ln2(x) != ln1(x): the shared-norm model feeds BOTH legs
        # from ln1; with a different ln2 the outputs must diverge.
        layer["post_attention_layernorm"] = {
            "weight": ln["weight"] * 1.5, "bias": ln["bias"] + 0.1,
        }
    two = np.asarray(
        LlamaModel(two_cfg, mode="fp", dtype=jnp.float32).apply(
            two_params, jnp.asarray(toks)
        )
    )
    assert np.abs(two - theirs).max() > 1e-2


@torch.no_grad()
def test_starcoder2_parity():
    """StarCoder2 = the Llama namespace with biased LayerNorms, a plain
    biased gelu MLP (c_fc/c_proj), GQA and biases on every projection —
    the sequential-residual LayerNorm point of the new architecture axis."""
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    hf_cfg = Starcoder2Config(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, sliding_window=None,
        tie_word_embeddings=False, rope_theta=10000.0,
        hidden_act="gelu_pytorch_tanh",
    )
    torch.manual_seed(11)
    hf = Starcoder2ForCausalLM(hf_cfg).eval().float()
    # Bias inits are zeros; randomize so the bias paths are exercised.
    sd = hf.state_dict()
    g = torch.Generator().manual_seed(13)
    for k in list(sd):
        if k.endswith(".bias"):
            sd[k].normal_(0.0, 0.05, generator=g)
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5, rope_theta=10000.0,
        norm_type="layernorm", mlp_gated=False, mlp_bias=True,
        attention_bias=True, attention_out_bias=True, hidden_act="gelu",
    )
    toks = _tokens(64, seed=11)
    ours = _logits_ours(cfg, _state_dict_np(hf), toks)
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@torch.no_grad()
def test_gpt2_parity():
    """GPT-2 = LEARNED absolute positions (no rope at all) + biased
    LayerNorm + plain biased gelu MLP + Conv1D ([in, out]) weights + tied
    lm_head — the learned-position point of the position-embedding axis,
    with a changed-math control on the position table."""
    from transformers import GPT2Config, GPT2LMHeadModel

    from protoquant_tpu.models.hf_import import import_hf_gpt2

    hf_cfg = GPT2Config(
        vocab_size=64, n_embd=64, n_layer=2, n_head=4, n_positions=64,
        n_inner=256, activation_function="gelu_new",
        layer_norm_epsilon=1e-5,
    )
    torch.manual_seed(15)
    hf = GPT2LMHeadModel(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        norm_type="layernorm", position_embedding="learned",
        mlp_gated=False, mlp_bias=True, attention_bias=True,
        attention_out_bias=True, hidden_act="gelu",
        tie_word_embeddings=True,
    )
    toks = _tokens(64, seed=15)
    sd = _state_dict_np(hf)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = import_hf_gpt2(sd, cfg)
    ours = np.asarray(model.apply(params, jnp.asarray(toks)))
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Changed-math control: zeroing the learned position table must change
    # the logits (guards against positions silently not entering at all...
    # which would ALSO fail parity above, but cheap belt-and-braces).
    params0 = import_hf_gpt2(sd, cfg)
    params0["params"]["embed_positions"]["embedding"] = (
        params0["params"]["embed_positions"]["embedding"] * 0.0
    )
    zeroed = np.asarray(model.apply(params0, jnp.asarray(toks)))
    assert np.abs(zeroed - theirs).max() > 1e-2


@torch.no_grad()
def test_bloom_parity():
    """BLOOM = the ALiBi axis: rope-free attention with per-head linear
    distance biases, plus an embedding LayerNorm — on top of the
    biased-LayerNorm / fused-interleaved-qkv / plain-gelu-MLP / tied-head
    machinery. Changed-math control: a rope model on the same weights must
    NOT match."""
    from transformers import BloomConfig, BloomForCausalLM

    from protoquant_tpu.models.hf_import import import_hf_bloom

    hf_cfg = BloomConfig(
        vocab_size=64, hidden_size=64, n_layer=2, n_head=4,
        layer_norm_epsilon=1e-5, tie_word_embeddings=True,
    )
    torch.manual_seed(11)
    hf = BloomForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        norm_type="layernorm", mlp_gated=False, mlp_bias=True,
        attention_bias=True, attention_out_bias=True, hidden_act="gelu",
        position_embedding="alibi", embedding_layernorm=True,
        tie_word_embeddings=True,
    )
    toks = _tokens(64, seed=11)
    sd = _state_dict_np(hf)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = import_hf_bloom(sd, cfg)
    ours = np.asarray(model.apply(params, jnp.asarray(toks)))
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Changed-math control: rope on the same weights diverges well beyond
    # the parity tolerance (2e-4) — a tiny random 2-layer model moves only
    # a few 1e-3 under a position-encoding swap, but that is still ~20x
    # the bound the parity assert holds to.
    import dataclasses as _dc

    rope_cfg = _dc.replace(cfg, position_embedding="rope")
    r = np.asarray(
        LlamaModel(rope_cfg, mode="fp", dtype=jnp.float32).apply(
            params, jnp.asarray(toks)
        )
    )
    assert np.abs(r - theirs).max() > 1e-3


@torch.no_grad()
def test_mpt_parity():
    """MPT = ALiBi + bias-free LayerNorms + fused NON-interleaved Wqkv +
    plain exact-gelu MLP, no biases anywhere — the second family on the
    alibi axis (power-of-two heads; see import_hf_mpt's slope note)."""
    from transformers import MptConfig, MptForCausalLM

    from protoquant_tpu.models.hf_import import import_hf_mpt

    hf_cfg = MptConfig(
        vocab_size=64, d_model=64, n_heads=4, n_layers=2, max_seq_len=64,
    )
    torch.manual_seed(13)
    hf = MptForCausalLM(hf_cfg).eval().float()
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        norm_type="layernorm", mlp_gated=False, hidden_act="gelu_exact",
        position_embedding="alibi", tie_word_embeddings=True,
    )
    toks = _tokens(64, seed=13)
    sd = _state_dict_np(hf)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = import_hf_mpt(sd, cfg)
    ours = np.asarray(model.apply(params, jnp.asarray(toks)))
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@torch.no_grad()
def test_cohere_parity():
    """Cohere Command-R = parallel attention+MLP sharing ONE bias-free
    LayerNorm, INTERLEAVED rope on a gated-SwiGLU model, tied head with a
    constant logit_scale multiplier. Changed-math control: half-split rope
    on the same weights diverges."""
    from transformers import CohereConfig, CohereForCausalLM

    from protoquant_tpu.models.hf_import import import_hf_cohere

    hf_cfg = CohereConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, layer_norm_eps=1e-5, rope_theta=10000.0,
        use_qk_norm=False, logit_scale=0.0625, tie_word_embeddings=True,
    )
    torch.manual_seed(17)
    hf = CohereForCausalLM(hf_cfg).eval().float()
    # Amplify q/k so the rope PAIRING is load-bearing (random tiny weights
    # are nearly rotation-invariant — interleaved vs half-split differs by
    # only ~3e-4 at default init, too close to the parity tolerance for
    # the changed-math control to mean anything).
    with torch.no_grad():
        for name, t in hf.named_parameters():
            if "q_proj" in name or "k_proj" in name:
                t.mul_(3.0)
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rms_norm_eps=1e-5,
        norm_type="layernorm", parallel_block=True,
        parallel_block_single_norm=True, rope_interleave=True,
        logit_scale=0.0625, tie_word_embeddings=True,
    )
    toks = _tokens(64, seed=17)
    sd = _state_dict_np(hf)
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = import_hf_cohere(sd, cfg)
    ours = np.asarray(model.apply(params, jnp.asarray(toks)))
    theirs = hf(torch.from_numpy(toks).long()).logits.numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)

    # Changed-math control: half-split rope pairing diverges.
    import dataclasses as _dc

    half = _dc.replace(cfg, rope_interleave=False)
    h = np.asarray(
        LlamaModel(half, mode="fp", dtype=jnp.float32).apply(
            params, jnp.asarray(toks)
        )
    )
    assert np.abs(h - theirs).max() > 1e-3
