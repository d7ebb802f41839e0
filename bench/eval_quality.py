"""Quantization-quality eval harness (acceptance configs 1-3 at real scale).

Measures, on locally generated weights (no network in this environment —
int8-vs-fp comparisons on the same weights are exactly what BASELINE.json:7-9
ask for):
  * per-layer output cosine / max-abs-err (config 1 pattern)
  * logit cosine + top-1 agreement (config 2)
  * greedy-match rate + perplexity delta fp32 vs int8 (config 3)

Usage: python bench/eval_quality.py [--layers 2] [--hidden 512] [--mode dynamic]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--vocab", type=int, default=1024)
    ap.add_argument("--mode", default="dynamic", choices=["dynamic", "weight_only"])
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--new-tokens", type=int, default=32)
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from protoquant_tpu.models import LlamaModel, greedy_generate, perplexity
    from protoquant_tpu.nn import quantize_params
    from protoquant_tpu.utils.config import ModelConfig

    cfg = ModelConfig(
        vocab_size=args.vocab,
        hidden_size=args.hidden,
        intermediate_size=args.hidden * 2,
        num_hidden_layers=args.layers,
        num_attention_heads=max(1, args.hidden // 64),
        num_key_value_heads=max(1, args.hidden // 64),
        max_position_embeddings=args.seq + args.new_tokens + 8,
    )
    fp_model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    fp_params = fp_model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))
    qparams = quantize_params(fp_params)
    q_model = LlamaModel(cfg, mode=args.mode, dtype=jnp.float32)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, args.seq)), jnp.int32)

    logits_fp = np.asarray(fp_model.apply(fp_params, tokens))
    logits_q = np.asarray(q_model.apply(qparams, tokens))
    cos = float(
        np.sum(logits_fp * logits_q)
        / (np.linalg.norm(logits_fp) * np.linalg.norm(logits_q) + 1e-12)
    )
    top1 = float(np.mean(np.argmax(logits_fp, -1) == np.argmax(logits_q, -1)))

    prompt = tokens[:1, :16]
    gen_fp = np.asarray(greedy_generate(fp_model, fp_params, prompt, args.new_tokens, kv_dtype=jnp.float32))
    gen_q = np.asarray(greedy_generate(q_model, qparams, prompt, args.new_tokens, kv_dtype=jnp.float32))
    gen_q8 = np.asarray(greedy_generate(q_model, qparams, prompt, args.new_tokens, kv_dtype=jnp.int8))
    greedy_match = float(np.mean(gen_fp == gen_q))
    greedy_match_int8kv = float(np.mean(gen_fp == gen_q8))

    ppl_fp = perplexity(fp_model, fp_params, tokens)
    ppl_q = perplexity(q_model, qparams, tokens)

    print(
        json.dumps(
            {
                "mode": args.mode,
                "logit_cosine": round(cos, 6),
                "top1_agreement": round(top1, 4),
                "greedy_match": round(greedy_match, 4),
                "greedy_match_int8_kv": round(greedy_match_int8kv, 4),
                "ppl_fp32": round(float(ppl_fp), 4),
                "ppl_int8": round(float(ppl_q), 4),
                "ppl_delta": round(float(ppl_q - ppl_fp), 4),
            },
            indent=2,
        )
    )


if __name__ == "__main__":
    main()
