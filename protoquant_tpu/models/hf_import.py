"""HF-layout Llama weight import from *local* tensors (component A5).

No network / no cached weights exist in this environment (SURVEY.md §0.3), so
this maps an in-memory HF-style state dict (name -> array, torch Linear
layout [out, in]) onto our flax params tree. Works with
``transformers.LlamaForCausalLM.state_dict()`` converted to numpy, or with
safetensors files loaded locally.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from ..utils.config import ModelConfig

_PROJS_ATTN = ("q_proj", "k_proj", "v_proj", "o_proj")
_PROJS_MLP = ("gate_proj", "up_proj", "down_proj")


def _kernel(sd: Mapping[str, np.ndarray], name: str) -> jnp.ndarray:
    # torch nn.Linear weight is [out, in]; our kernel is [in, out].
    return jnp.asarray(np.asarray(sd[name]).astype(np.float32).T)


def import_hf_gpt_neox(
    sd: Mapping[str, np.ndarray], cfg: ModelConfig, dtype=jnp.float32
) -> dict:
    """HF GPT-NeoX/Pythia state dict -> fp flax params.

    The NeoX namespace differs structurally from Llama's: a FUSED
    query_key_value projection whose rows interleave per head as
    [q_h; k_h; v_h] (HF GPTNeoXAttention reshapes to [..., H, 3*hd] and
    splits on the last axis), `dense` for o_proj, a plain biased MLP
    (dense_h_to_4h/dense_4h_to_h -> our up_proj/down_proj), biased
    LayerNorms, embed_in/embed_out, final_layer_norm."""
    H, hd = cfg.num_attention_heads, cfg.head_dim

    def _ln(prefix):
        return {
            "weight": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
        }

    p: dict = {
        "embed_tokens": {
            "embedding": jnp.asarray(
                np.asarray(sd["gpt_neox.embed_in.weight"], np.float32)
            )
        }
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"gpt_neox.layers.{i}"
        qkv_w = np.asarray(
            sd[f"{pre}.attention.query_key_value.weight"], np.float32
        ).reshape(H, 3, hd, cfg.hidden_size)
        qkv_b = np.asarray(
            sd[f"{pre}.attention.query_key_value.bias"], np.float32
        ).reshape(H, 3, hd)
        self_attn = {}
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            self_attn[name] = {
                # torch [out, in] -> our kernel [in, out]
                "kernel": jnp.asarray(qkv_w[:, j].reshape(H * hd, -1).T),
                "bias": jnp.asarray(qkv_b[:, j].reshape(H * hd)),
            }
        self_attn["o_proj"] = {
            "kernel": _kernel(sd, f"{pre}.attention.dense.weight"),
            "bias": jnp.asarray(
                np.asarray(sd[f"{pre}.attention.dense.bias"], np.float32)
            ),
        }
        p[f"layers_{i}"] = {
            "input_layernorm": _ln(f"{pre}.input_layernorm"),
            "post_attention_layernorm": _ln(f"{pre}.post_attention_layernorm"),
            "self_attn": self_attn,
            "mlp": {
                "up_proj": {
                    "kernel": _kernel(sd, f"{pre}.mlp.dense_h_to_4h.weight"),
                    "bias": jnp.asarray(
                        np.asarray(sd[f"{pre}.mlp.dense_h_to_4h.bias"], np.float32)
                    ),
                },
                "down_proj": {
                    "kernel": _kernel(sd, f"{pre}.mlp.dense_4h_to_h.weight"),
                    "bias": jnp.asarray(
                        np.asarray(sd[f"{pre}.mlp.dense_4h_to_h.bias"], np.float32)
                    ),
                },
            },
        }
    p["norm"] = _ln("gpt_neox.final_layer_norm")
    lm = (
        sd["gpt_neox.embed_in.weight"]
        if cfg.tie_word_embeddings or "embed_out.weight" not in sd
        else sd["embed_out.weight"]
    )
    p["lm_head"] = {"kernel": jnp.asarray(np.asarray(lm, np.float32).T)}
    return {"params": p}


def import_hf_falcon(
    sd: Mapping[str, np.ndarray], cfg: ModelConfig, dtype=jnp.float32
) -> dict:
    """HF Falcon-7B-style state dict -> fp flax params.

    Layout (multi_query + parallel_attn, new_decoder_architecture=False):
    transformer.h.{i}.self_attention.query_key_value rows are
    [H*hd queries; hd key; hd value] (HF FalconAttention._split_heads),
    `dense` is o_proj, ONE biased input_layernorm feeds both sublayers
    (cfg.parallel_block_single_norm), plain unbiased gelu MLP."""
    H, hd = cfg.num_attention_heads, cfg.head_dim

    def _ln(prefix):
        return {
            "weight": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
        }

    p: dict = {
        "embed_tokens": {
            "embedding": jnp.asarray(
                np.asarray(sd["transformer.word_embeddings.weight"], np.float32)
            )
        }
    }
    kvh = cfg.num_key_value_heads
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.h.{i}"
        qkv = np.asarray(
            sd[f"{pre}.self_attention.query_key_value.weight"], np.float32
        )
        q, k, v = np.split(qkv, [H * hd, H * hd + kvh * hd], axis=0)
        p[f"layers_{i}"] = {
            "input_layernorm": _ln(f"{pre}.input_layernorm"),
            "self_attn": {
                "q_proj": {"kernel": jnp.asarray(q.T)},
                "k_proj": {"kernel": jnp.asarray(k.T)},
                "v_proj": {"kernel": jnp.asarray(v.T)},
                "o_proj": {
                    "kernel": _kernel(sd, f"{pre}.self_attention.dense.weight")
                },
            },
            "mlp": {
                "up_proj": {
                    "kernel": _kernel(sd, f"{pre}.mlp.dense_h_to_4h.weight")
                },
                "down_proj": {
                    "kernel": _kernel(sd, f"{pre}.mlp.dense_4h_to_h.weight")
                },
            },
        }
    p["norm"] = _ln("transformer.ln_f")
    lm = (
        sd["transformer.word_embeddings.weight"]
        if cfg.tie_word_embeddings or "lm_head.weight" not in sd
        else sd["lm_head.weight"]
    )
    p["lm_head"] = {"kernel": jnp.asarray(np.asarray(lm, np.float32).T)}
    return {"params": p}


def import_hf_bloom(
    sd, cfg, dtype=jnp.float32
) -> dict:
    """HF BLOOM state dict -> fp flax params.

    BLOOM namespace: transformer.word_embeddings (+ a dedicated
    word_embeddings_layernorm -> cfg.embedding_layernorm), h.{i} blocks with
    a FUSED self_attention.query_key_value whose rows interleave per head as
    [q_h; k_h; v_h] (like NeoX), self_attention.dense for o_proj, a plain
    biased gelu MLP (dense_h_to_4h/dense_4h_to_h), biased LayerNorms, ln_f,
    tied lm_head. Positions are ALiBi (cfg.position_embedding="alibi") — no
    rope, no position table."""
    H, hd = cfg.num_attention_heads, cfg.head_dim

    def _ln(prefix):
        return {
            "weight": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
        }

    p: dict = {
        "embed_tokens": {
            "embedding": jnp.asarray(
                np.asarray(sd["transformer.word_embeddings.weight"], np.float32)
            )
        },
        "embed_norm": _ln("transformer.word_embeddings_layernorm"),
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.h.{i}"
        qkv_w = np.asarray(
            sd[f"{pre}.self_attention.query_key_value.weight"], np.float32
        ).reshape(H, 3, hd, cfg.hidden_size)
        qkv_b = np.asarray(
            sd[f"{pre}.self_attention.query_key_value.bias"], np.float32
        ).reshape(H, 3, hd)
        self_attn = {}
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            self_attn[name] = {
                "kernel": jnp.asarray(qkv_w[:, j].reshape(H * hd, -1).T),
                "bias": jnp.asarray(qkv_b[:, j].reshape(H * hd)),
            }
        self_attn["o_proj"] = {
            "kernel": _kernel(sd, f"{pre}.self_attention.dense.weight"),
            "bias": jnp.asarray(
                np.asarray(sd[f"{pre}.self_attention.dense.bias"], np.float32)
            ),
        }
        p[f"layers_{i}"] = {
            "input_layernorm": _ln(f"{pre}.input_layernorm"),
            "post_attention_layernorm": _ln(f"{pre}.post_attention_layernorm"),
            "self_attn": self_attn,
            "mlp": {
                "up_proj": {
                    "kernel": _kernel(sd, f"{pre}.mlp.dense_h_to_4h.weight"),
                    "bias": jnp.asarray(
                        np.asarray(
                            sd[f"{pre}.mlp.dense_h_to_4h.bias"], np.float32
                        )
                    ),
                },
                "down_proj": {
                    "kernel": _kernel(sd, f"{pre}.mlp.dense_4h_to_h.weight"),
                    "bias": jnp.asarray(
                        np.asarray(
                            sd[f"{pre}.mlp.dense_4h_to_h.bias"], np.float32
                        )
                    ),
                },
            },
        }
    p["norm"] = _ln("transformer.ln_f")
    # lm_head is tied to the embedding.
    p["lm_head"] = {
        "kernel": jnp.asarray(
            np.asarray(sd["transformer.word_embeddings.weight"], np.float32).T
        )
    }
    return {"params": p}


def import_hf_mpt(sd, cfg, dtype=jnp.float32) -> dict:
    """HF MPT state dict -> fp flax params.

    MPT namespace: transformer.wte, blocks.{i} with a fused NON-interleaved
    attn.Wqkv ([q; k; v] blocks stacked on the out axis), attn.out_proj,
    ffn.up_proj/down_proj (plain exact-gelu MLP), BIAS-FREE LayerNorms
    (norm_1/norm_2/norm_f — zero biases synthesized for our biased
    LayerNorm), tied lm_head, ALiBi positions. NOTE: for non-power-of-two
    head counts MPT's slope interpolation differs from the BLOOM recipe in
    models/llama.py::alibi_slopes — import power-of-two-headed configs (all
    released MPT models are)."""
    D = cfg.hidden_size

    def _ln(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
        return {"weight": jnp.asarray(w),
                "bias": jnp.zeros((w.shape[0],), jnp.float32)}

    p: dict = {
        "embed_tokens": {
            "embedding": jnp.asarray(
                np.asarray(sd["transformer.wte.weight"], np.float32)
            )
        }
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.blocks.{i}"
        qkv = np.asarray(sd[f"{pre}.attn.Wqkv.weight"], np.float32)
        q_w, k_w, v_w = qkv[:D], qkv[D : 2 * D], qkv[2 * D :]
        p[f"layers_{i}"] = {
            "input_layernorm": _ln(f"{pre}.norm_1"),
            "post_attention_layernorm": _ln(f"{pre}.norm_2"),
            "self_attn": {
                "q_proj": {"kernel": jnp.asarray(q_w.T)},
                "k_proj": {"kernel": jnp.asarray(k_w.T)},
                "v_proj": {"kernel": jnp.asarray(v_w.T)},
                "o_proj": {
                    "kernel": _kernel(sd, f"{pre}.attn.out_proj.weight")
                },
            },
            "mlp": {
                "up_proj": {
                    "kernel": _kernel(sd, f"{pre}.ffn.up_proj.weight")
                },
                "down_proj": {
                    "kernel": _kernel(sd, f"{pre}.ffn.down_proj.weight")
                },
            },
        }
    p["norm"] = _ln("transformer.norm_f")
    lm = sd.get("lm_head.weight", sd["transformer.wte.weight"])
    p["lm_head"] = {"kernel": jnp.asarray(np.asarray(lm, np.float32).T)}
    return {"params": p}


def import_hf_cohere(sd, cfg, dtype=jnp.float32) -> dict:
    """HF Cohere (Command-R) state dict -> fp flax params.

    Llama namespace with three twists: ONE input_layernorm feeds the
    PARALLEL attention+MLP block (cfg.parallel_block +
    parallel_block_single_norm), LayerNorms are bias-free (zero biases
    synthesized), rope is INTERLEAVED (cfg.rope_interleave), and the tied
    lm_head logits are multiplied by cfg.logit_scale."""

    def _ln(prefix):
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
        return {"weight": jnp.asarray(w),
                "bias": jnp.zeros((w.shape[0],), jnp.float32)}

    p: dict = {
        "embed_tokens": {
            "embedding": jnp.asarray(
                np.asarray(sd["model.embed_tokens.weight"], np.float32)
            )
        }
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        p[f"layers_{i}"] = {
            "input_layernorm": _ln(f"{pre}.input_layernorm"),
            "self_attn": {
                name: {"kernel": _kernel(sd, f"{pre}.self_attn.{name}.weight")}
                for name in ("q_proj", "k_proj", "v_proj", "o_proj")
            },
            "mlp": {
                name: {"kernel": _kernel(sd, f"{pre}.mlp.{name}.weight")}
                for name in ("gate_proj", "up_proj", "down_proj")
            },
        }
    p["norm"] = _ln("model.norm")
    lm = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
    p["lm_head"] = {"kernel": jnp.asarray(np.asarray(lm, np.float32).T)}
    return {"params": p}


def import_hf_gpt2(
    sd: Mapping[str, np.ndarray], cfg: ModelConfig, dtype=jnp.float32
) -> dict:
    """HF GPT-2 state dict -> fp flax params.

    GPT-2 uses Conv1D modules whose weights are ALREADY [in, out] (no
    transpose, unlike nn.Linear), a fused c_attn = [q; k; v] along the
    output axis (plain column split, not per-head interleave), learned
    position table wpe (-> embed_positions), ln_1/ln_2 biased LayerNorms,
    tied lm_head."""

    def _ln(prefix):
        return {
            "weight": jnp.asarray(np.asarray(sd[f"{prefix}.weight"], np.float32)),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.bias"], np.float32)),
        }

    def _conv(name):  # Conv1D: [in, out] as-is
        return jnp.asarray(np.asarray(sd[name], np.float32))

    def _b(name):
        return jnp.asarray(np.asarray(sd[name], np.float32))

    D = cfg.hidden_size
    p: dict = {
        "embed_tokens": {
            "embedding": jnp.asarray(
                np.asarray(sd["transformer.wte.weight"], np.float32)
            )
        },
        "embed_positions": {
            "embedding": jnp.asarray(
                np.asarray(sd["transformer.wpe.weight"], np.float32)
            )
        },
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.h.{i}"
        ca_w = _conv(f"{pre}.attn.c_attn.weight")  # [D, 3D]
        ca_b = _b(f"{pre}.attn.c_attn.bias")  # [3D]
        self_attn = {}
        for j, name in enumerate(("q_proj", "k_proj", "v_proj")):
            self_attn[name] = {
                "kernel": ca_w[:, j * D : (j + 1) * D],
                "bias": ca_b[j * D : (j + 1) * D],
            }
        self_attn["o_proj"] = {
            "kernel": _conv(f"{pre}.attn.c_proj.weight"),
            "bias": _b(f"{pre}.attn.c_proj.bias"),
        }
        p[f"layers_{i}"] = {
            "input_layernorm": _ln(f"{pre}.ln_1"),
            "post_attention_layernorm": _ln(f"{pre}.ln_2"),
            "self_attn": self_attn,
            "mlp": {
                "up_proj": {
                    "kernel": _conv(f"{pre}.mlp.c_fc.weight"),
                    "bias": _b(f"{pre}.mlp.c_fc.bias"),
                },
                "down_proj": {
                    "kernel": _conv(f"{pre}.mlp.c_proj.weight"),
                    "bias": _b(f"{pre}.mlp.c_proj.bias"),
                },
            },
        }
    p["norm"] = _ln("transformer.ln_f")
    p["lm_head"] = {
        "kernel": jnp.asarray(
            np.asarray(sd["transformer.wte.weight"], np.float32).T
        )
    }
    return {"params": p}


def import_hf_llama(
    sd: Mapping[str, np.ndarray], cfg: ModelConfig, dtype=jnp.float32
) -> dict:
    """HF Llama state dict -> fp flax params for models.llama.LlamaModel.

    Feed the result through ``nn.quantize_params`` to obtain the quantized
    tree (the reference's qlinear_from_linear step, SURVEY.md §3.5).
    """
    p: dict = {}
    p["embed_tokens"] = {
        "embedding": jnp.asarray(
            np.asarray(sd["model.embed_tokens.weight"], dtype=np.float32)
        )
    }

    def _norm(prefix):
        """Norm loader honoring the config's norm family: LayerNorm models
        (StarCoder2) carry a bias alongside the weight."""
        out = {
            "weight": jnp.asarray(
                np.asarray(sd[f"{prefix}.weight"], np.float32)
            )
        }
        if cfg.norm_type == "layernorm":
            out["bias"] = jnp.asarray(
                np.asarray(sd[f"{prefix}.bias"], np.float32)
            )
        return out

    for i in range(cfg.num_hidden_layers):
        pre = f"model.layers.{i}"
        if cfg.is_mla:
            # DeepSeek MLA projection set (models/mla.py). kv_b_proj maps to
            # a _Weight kernel — same {kernel: [in, out]} layout as QLinear.
            attn_projs = ["kv_a_proj_with_mqa", "kv_b_proj", "o_proj"]
            attn_projs += (
                ["q_a_proj", "q_b_proj"] if cfg.q_lora_rank > 0 else ["q_proj"]
            )
            self_attn = {
                proj: {"kernel": _kernel(sd, f"{pre}.self_attn.{proj}.weight")}
                for proj in attn_projs
            }
            self_attn["kv_a_layernorm"] = {
                "weight": jnp.asarray(
                    np.asarray(sd[f"{pre}.self_attn.kv_a_layernorm.weight"], np.float32)
                )
            }
            if cfg.q_lora_rank > 0:
                self_attn["q_a_layernorm"] = {
                    "weight": jnp.asarray(
                        np.asarray(sd[f"{pre}.self_attn.q_a_layernorm.weight"], np.float32)
                    )
                }
        elif f"{pre}.self_attn.qkv_proj.weight" in sd:
            # Phi-3: natively fused QKV ([q; k; v] rows — the same concat
            # order as nn.fuse_projections). Build the model with fused=True.
            self_attn = {
                proj: {"kernel": _kernel(sd, f"{pre}.self_attn.{proj}.weight")}
                for proj in ("qkv_proj", "o_proj")
            }
        else:
            self_attn = {
                proj: {"kernel": _kernel(sd, f"{pre}.self_attn.{proj}.weight")}
                for proj in _PROJS_ATTN
            }
        layer: dict = {
            "post_attention_layernorm": _norm(
                f"{pre}.post_attention_layernorm"
            ),
            "self_attn": self_attn,
        }
        if cfg.post_norm:
            # OLMo-2: no input norm; norms sit on the sublayer outputs.
            layer["post_feedforward_layernorm"] = _norm(
                f"{pre}.post_feedforward_layernorm"
            )
        else:
            layer["input_layernorm"] = _norm(f"{pre}.input_layernorm")
        if cfg.sandwich_norms:
            # Gemma-2: post_attention_layernorm already mapped above (it
            # normalizes the attention OUTPUT there); add the pre/post-FFN
            # pair.
            for nm in ("pre_feedforward_layernorm", "post_feedforward_layernorm"):
                layer[nm] = {
                    "weight": jnp.asarray(
                        np.asarray(sd[f"{pre}.{nm}.weight"], np.float32)
                    )
                }
        if cfg.qk_norm:
            for nm in ("q_norm", "k_norm"):
                layer["self_attn"][nm] = {
                    "weight": jnp.asarray(
                        np.asarray(sd[f"{pre}.self_attn.{nm}.weight"], np.float32)
                    )
                }
        if cfg.attention_bias:
            # Qwen2 family: q/k/v carry biases (o_proj does not).
            for proj in ("q_proj", "k_proj", "v_proj"):
                layer["self_attn"][proj]["bias"] = jnp.asarray(
                    np.asarray(sd[f"{pre}.self_attn.{proj}.bias"], np.float32)
                )
        if cfg.attention_out_bias:
            # GPT-OSS: o_proj carries a bias too.
            layer["self_attn"]["o_proj"]["bias"] = jnp.asarray(
                np.asarray(sd[f"{pre}.self_attn.o_proj.bias"], np.float32)
            )
        if cfg.learned_attention_sinks:
            layer["self_attn"]["sinks"] = jnp.asarray(
                np.asarray(sd[f"{pre}.self_attn.sinks"], np.float32)
            )
        if cfg.layer_is_moe(i) and cfg.moe_variant == "gpt_oss":
            # GPT-OSS ships experts PRE-STACKED ([E, d, 2I] / [E, I, d],
            # already input-major) with per-expert biases and a biased
            # router (HF name "router" -> our "gate").
            mp = f"{pre}.mlp"
            layer["block_sparse_moe"] = {
                "gate": {
                    "kernel": _kernel(sd, f"{mp}.router.weight"),
                    "bias": jnp.asarray(
                        np.asarray(sd[f"{mp}.router.bias"], np.float32)
                    ),
                },
                "gate_up_proj": {
                    "kernel": jnp.asarray(
                        np.asarray(sd[f"{mp}.experts.gate_up_proj"], np.float32)
                    )
                },
                "gate_up_proj_bias": jnp.asarray(
                    np.asarray(sd[f"{mp}.experts.gate_up_proj_bias"], np.float32)
                ),
                "down_proj": {
                    "kernel": jnp.asarray(
                        np.asarray(sd[f"{mp}.experts.down_proj"], np.float32)
                    )
                },
                "down_proj_bias": jnp.asarray(
                    np.asarray(sd[f"{mp}.experts.down_proj_bias"], np.float32)
                ),
            }
        elif cfg.layer_is_moe(i):
            # Three HF layouts map onto our block_sparse_moe/w1,w2,w3:
            #   Mixtral:   block_sparse_moe.gate + experts.{e}.w1/w2/w3
            #   Qwen3-MoE / DeepSeek: mlp.gate + mlp.experts.{e}.gate/up/down
            if f"{pre}.block_sparse_moe.gate.weight" in sd:
                moepre, names = f"{pre}.block_sparse_moe", ("w1", "w2", "w3")
            else:
                moepre = f"{pre}.mlp"
                names = ("gate_proj", "down_proj", "up_proj")
            layer["block_sparse_moe"] = {
                "gate": {"kernel": _kernel(sd, f"{moepre}.gate.weight")},
                **{
                    ours: {
                        "kernel": jnp.stack(
                            [
                                _kernel(sd, f"{moepre}.experts.{e}.{theirs}.weight")
                                for e in range(cfg.num_local_experts)
                            ]
                        )
                    }
                    for ours, theirs in zip(("w1", "w2", "w3"), names)
                },
            }
            if cfg.moe_gate_bias:
                # DeepSeek-V3 selection-bias buffer.
                layer["block_sparse_moe"]["e_score_correction_bias"] = (
                    jnp.asarray(
                        np.asarray(
                            sd[f"{moepre}.gate.e_score_correction_bias"],
                            np.float32,
                        )
                    )
                )
            if cfg.n_shared_experts > 0:
                layer["block_sparse_moe"]["shared_experts"] = {
                    proj: {
                        "kernel": _kernel(
                            sd, f"{moepre}.shared_experts.{proj}.weight"
                        )
                    }
                    for proj in _PROJS_MLP
                }
        elif f"{pre}.mlp.gate_up_proj.weight" in sd:
            # Phi-3: natively fused [gate; up] MLP input projection.
            layer["mlp"] = {
                proj: {"kernel": _kernel(sd, f"{pre}.mlp.{proj}.weight")}
                for proj in ("gate_up_proj", "down_proj")
            }
        elif not cfg.mlp_gated:
            # Plain 2-layer MLP (StarCoder2: c_fc/c_proj) -> up/down.
            layer["mlp"] = {
                ours: {"kernel": _kernel(sd, f"{pre}.mlp.{theirs}.weight")}
                for ours, theirs in (("up_proj", "c_fc"), ("down_proj", "c_proj"))
            }
            if cfg.mlp_bias:
                for ours, theirs in (("up_proj", "c_fc"), ("down_proj", "c_proj")):
                    layer["mlp"][ours]["bias"] = jnp.asarray(
                        np.asarray(sd[f"{pre}.mlp.{theirs}.bias"], np.float32)
                    )
        else:
            layer["mlp"] = {
                proj: {"kernel": _kernel(sd, f"{pre}.mlp.{proj}.weight")}
                for proj in _PROJS_MLP
            }
        p[f"layers_{i}"] = layer
    p["norm"] = _norm("model.norm")
    if cfg.tie_word_embeddings or "lm_head.weight" not in sd:
        lm = sd["model.embed_tokens.weight"]
    else:
        lm = sd["lm_head.weight"]
    p["lm_head"] = {"kernel": jnp.asarray(np.asarray(lm, np.float32).T)}
    return {"params": p}
