"""Trained-proposer tier A/B: Medusa vs Hydra vs EAGLE acceptance on the
SAME self-distilled setup (ROADMAP r3 item 7's gating measurement).

One tiny base model; one corpus = the model's own greedy continuations of
random prompts (the distribution the engine will decode); each tier's
proposer trains on it head/draft-only (base frozen); acceptance = the
engine's spec_acceptance_rate serving fresh in-distribution prompts at
matched lookahead (tree tiers: depth d over J branches; EAGLE: linear
gamma=d — per-PROPOSAL acceptance is comparable, tick economics are
measured separately by medusa_bench/eagle_bench).

CPU-runnable (quality measurement, not speed): python bench/draft_tier_ab.py
Prints one JSON line per tier + a summary.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if not os.environ.get("AB_TPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.models import (
        LlamaModel,
        greedy_generate,
        init_eagle,
        train_eagle,
    )
    from protoquant_tpu.models.medusa import (
        init_hydra,
        init_medusa,
        train_medusa_heads,
    )
    from protoquant_tpu.utils.config import ModelConfig

    d = int(os.environ.get("AB_DEPTH", "3"))
    J = int(os.environ.get("AB_BRANCHES", "3"))
    steps = int(os.environ.get("AB_STEPS", "150"))
    cfg = ModelConfig(
        vocab_size=int(os.environ.get("AB_VOCAB", "128")),
        hidden_size=int(os.environ.get("AB_HIDDEN", "128")),
        intermediate_size=int(os.environ.get("AB_HIDDEN", "128")) * 2,
        num_hidden_layers=int(os.environ.get("AB_LAYERS", "4")),
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    rng = np.random.default_rng(7)
    prompts = jnp.asarray(rng.integers(1, cfg.vocab_size, (8, 8)), jnp.int32)
    out = greedy_generate(model, params, prompts, 56, 80,
                          kv_dtype=jnp.float32)
    corpus = jnp.concatenate([prompts, jnp.asarray(out, jnp.int32)], axis=1)

    # Eval ON the training prompts (their continuations are deterministic
    # greedy streams the proposers trained to reproduce): a random tiny
    # base has NO transferable text structure — fresh random prompts'
    # continuations are arbitrary and every tier measures ~1% (probed
    # while writing this bench). Same protocol as the r3 Hydra-vs-Medusa
    # A/B; real-checkpoint transfer stays gated on real weights
    # (ROADMAP real-weights item).
    eval_prompts = [[int(t) for t in row] for row in np.asarray(prompts)]

    def engine_acceptance(**kw):
        ecfg = EngineConfig(max_batch_size=4, max_seq_len=192,
                            prefill_chunk=16, max_new_tokens=48,
                            temperature=0.0)
        eng = Engine(model, params, ecfg, kv_dtype=jnp.float32, **kw)
        for p in eval_prompts:
            eng.add_request(p, 48)
        eng.run()
        m = eng.metrics()
        return m["spec_acceptance_rate"], m

    results = {}

    heads_m, hm0 = init_medusa(model, depth=d, rng=jax.random.PRNGKey(1),
                               dtype=jnp.float32)
    hm1, lm = train_medusa_heads(model, params, heads_m, hm0,
                                 [corpus] * steps, lr=3e-3)
    acc, _ = engine_acceptance(medusa_heads=heads_m, medusa_params=hm1,
                               gamma=d, lookup_branches=J)
    results["medusa"] = {"acceptance": round(acc, 4),
                         "loss": [round(lm[0], 3), round(lm[-1], 3)]}
    print(json.dumps({"tier": "medusa", **results["medusa"]}), flush=True)

    heads_h, hh0 = init_hydra(model, depth=d, rng=jax.random.PRNGKey(2),
                              dtype=jnp.float32)
    hh1, lh = train_medusa_heads(model, params, heads_h, hh0,
                                 [corpus] * steps, lr=3e-3)
    acc, _ = engine_acceptance(medusa_heads=heads_h, medusa_params=hh1,
                               gamma=d, lookup_branches=J)
    results["hydra"] = {"acceptance": round(acc, 4),
                        "loss": [round(lh[0], 3), round(lh[-1], 3)]}
    print(json.dumps({"tier": "hydra", **results["hydra"]}), flush=True)

    draft, de0 = init_eagle(model, jax.random.PRNGKey(3), dtype=jnp.float32,
                            base_params=params)
    de1, le = train_eagle(model, params, draft, de0, [corpus] * steps,
                          lr=3e-3, w_ce=1.0)
    acc, _ = engine_acceptance(eagle_draft=draft, eagle_params=de1, gamma=d)
    results["eagle"] = {"acceptance": round(acc, 4),
                        "loss": [round(le[0], 3), round(le[-1], 3)]}
    print(json.dumps({"tier": "eagle", **results["eagle"]}), flush=True)

    print(json.dumps({
        "metric": "draft_tier_ab", "depth": d, "branches": J,
        "train_steps": steps,
        "acceptance": {k: v["acceptance"] for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
