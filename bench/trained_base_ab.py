"""Trained-BASE proposer A/B: acceptance transfer on FRESH prompts.

VERDICT r4 weak-4: the draft-tier A/B (bench/draft_tier_ab.py) measures
acceptance ON the training prompts because a random-weight base has no
transferable structure — fresh prompts collapse every tier to ~1%, so the
measurement is memorization, not the thing speculation exists for. This
bench removes that confound without real checkpoints (none are reachable —
zero egress): it gives the base model a LEARNABLE synthetic language and
trains the base itself first.

Protocol:
  1. Language = order-2 Markov chain over V tokens with peaked random
     per-(a, b) next distributions (Dirichlet alpha=0.05) — enough entropy
     that sequences differ, enough structure that a 4-layer model learns it.
  2. Train the BASE (full params, AdamW, next-token CE) on sampled text;
     report its held-out agreement with the chain's argmax (the "did it
     learn" gate — ~0.9+ means greedy continuations are structured, not
     arbitrary).
  3. Self-distill each proposer tier (Medusa / Hydra / EAGLE; base frozen)
     on the base's OWN greedy continuations of training-set prompts — the
     standard recipe, same as draft_tier_ab.
  4. Measure engine `spec_acceptance_rate` serving FRESH prompts (disjoint
     from base-training text and from the distillation prompts), at matched
     lookahead. Controls: an UNTRAINED EAGLE draft (tied-head start) on the
     same fresh prompts bounds how much of the acceptance is training
     transfer vs head architecture.

CPU-runnable (quality measurement, not speed):
    python bench/trained_base_ab.py
Prints one JSON line per stage + a summary line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_chain(V, rng, alpha=0.05):
    """Per-(a, b) peaked next-token distributions, [V, V, V] float32."""
    t = rng.dirichlet(np.full(V, alpha), size=(V, V)).astype(np.float32)
    return t


def sample_chain(chain, rng, n, T):
    """[n, T] int32 sequences from the chain (first two tokens uniform)."""
    V = chain.shape[0]
    out = np.empty((n, T), np.int64)
    out[:, 0] = rng.integers(0, V, n)
    out[:, 1] = rng.integers(0, V, n)
    for t in range(2, T):
        # Vectorized categorical draw per row via inverse-CDF.
        p = chain[out[:, t - 2], out[:, t - 1]]  # [n, V]
        c = np.cumsum(p, axis=1)
        u = rng.random((n, 1)) * c[:, -1:]
        out[:, t] = np.argmax(c >= u, axis=1)
    return out.astype(np.int32)


def main():
    import jax

    if not os.environ.get("AB_TPU"):
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

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

    V = int(os.environ.get("AB_VOCAB", "64"))
    d = int(os.environ.get("AB_DEPTH", "3"))
    J = int(os.environ.get("AB_BRANCHES", "3"))
    base_steps = int(os.environ.get("AB_BASE_STEPS", "600"))
    distill_steps = int(os.environ.get("AB_STEPS", "200"))
    T = 64

    rng = np.random.default_rng(11)
    chain = make_chain(V, rng)

    cfg = ModelConfig(
        vocab_size=V,
        hidden_size=int(os.environ.get("AB_HIDDEN", "128")),
        intermediate_size=int(os.environ.get("AB_HIDDEN", "128")) * 2,
        num_hidden_layers=int(os.environ.get("AB_LAYERS", "4")),
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    # ---- stage 1: train the base on the language --------------------------
    opt = optax.adamw(3e-3, weight_decay=1e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, toks):
        def loss_fn(p):
            logits = model.apply(p, toks)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, :-1], toks[:, 1:]
            )
            return ce.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss

    losses = []
    for i in range(base_steps):
        toks = jnp.asarray(sample_chain(chain, rng, 32, T))
        params, opt_state, loss = step(params, opt_state, toks)
        losses.append(float(loss))

    # "Did it learn" gate: base greedy next-token vs the chain argmax on
    # held-out contexts (fresh seed — never trained on).
    hrng = np.random.default_rng(999)
    held = sample_chain(chain, hrng, 16, T)
    logits = np.asarray(model.apply(params, jnp.asarray(held)))
    pred = np.argmax(logits[:, 2:-1], axis=-1)
    want = np.argmax(chain[held[:, 1:-2], held[:, 2:-1]], axis=-1)
    learned = float(np.mean(pred == want))
    print(json.dumps({
        "stage": "base_training", "steps": base_steps,
        "ce": [round(losses[0], 3), round(losses[-1], 3)],
        "heldout_argmax_agreement": round(learned, 4),
    }), flush=True)

    # ---- stage 2: self-distillation corpus from the trained base ----------
    train_prompts = jnp.asarray(sample_chain(chain, rng, 8, 8))
    out = greedy_generate(model, params, train_prompts, 56, 80,
                          kv_dtype=jnp.float32)
    corpus = jnp.concatenate([train_prompts, jnp.asarray(out, jnp.int32)],
                             axis=1)

    # FRESH eval prompts: disjoint seed from base training AND distillation.
    frng = np.random.default_rng(4242)
    fresh = sample_chain(chain, frng, 8, 8)
    eval_prompts = [[int(t) for t in row] for row in fresh]

    def engine_acceptance(**kw):
        ecfg = EngineConfig(max_batch_size=4, max_seq_len=192,
                            prefill_chunk=16, max_new_tokens=48,
                            temperature=0.0)
        eng = Engine(model, params, ecfg, kv_dtype=jnp.float32, **kw)
        for p in eval_prompts:
            eng.add_request(p, 48)
        eng.run()
        return eng.metrics()["spec_acceptance_rate"]

    results = {}

    heads_m, hm0 = init_medusa(model, depth=d, rng=jax.random.PRNGKey(1),
                               dtype=jnp.float32)
    hm1, lm = train_medusa_heads(model, params, heads_m, hm0,
                                 [corpus] * distill_steps, lr=3e-3)
    acc = engine_acceptance(medusa_heads=heads_m, medusa_params=hm1,
                            gamma=d, lookup_branches=J)
    results["medusa"] = round(acc, 4)
    print(json.dumps({"tier": "medusa", "acceptance_fresh": results["medusa"],
                      "loss": [round(lm[0], 3), round(lm[-1], 3)]}),
          flush=True)

    heads_h, hh0 = init_hydra(model, depth=d, rng=jax.random.PRNGKey(2),
                              dtype=jnp.float32)
    hh1, lh = train_medusa_heads(model, params, heads_h, hh0,
                                 [corpus] * distill_steps, lr=3e-3)
    acc = engine_acceptance(medusa_heads=heads_h, medusa_params=hh1,
                            gamma=d, lookup_branches=J)
    results["hydra"] = round(acc, 4)
    print(json.dumps({"tier": "hydra", "acceptance_fresh": results["hydra"],
                      "loss": [round(lh[0], 3), round(lh[-1], 3)]}),
          flush=True)

    draft, de0 = init_eagle(model, jax.random.PRNGKey(3), dtype=jnp.float32,
                            base_params=params)
    # Control FIRST (untrained tied-head draft): bounds architecture-only
    # acceptance before any distillation.
    acc0 = engine_acceptance(eagle_draft=draft, eagle_params=de0, gamma=d)
    results["eagle_untrained"] = round(acc0, 4)
    print(json.dumps({"tier": "eagle_untrained",
                      "acceptance_fresh": results["eagle_untrained"]}),
          flush=True)

    de1, le = train_eagle(model, params, draft, de0,
                          [corpus] * distill_steps, lr=3e-3, w_ce=1.0)
    acc = engine_acceptance(eagle_draft=draft, eagle_params=de1, gamma=d)
    results["eagle"] = round(acc, 4)
    print(json.dumps({"tier": "eagle", "acceptance_fresh": results["eagle"],
                      "loss": [round(le[0], 3), round(le[-1], 3)]}),
          flush=True)

    # EAGLE-tree on the same trained draft: same proposer, tree expansion.
    acc = engine_acceptance(eagle_draft=draft, eagle_params=de1, gamma=d,
                            lookup_branches=J)
    results["eagle_tree"] = round(acc, 4)
    print(json.dumps({"tier": "eagle_tree",
                      "acceptance_fresh": results["eagle_tree"]}), flush=True)

    print(json.dumps({
        "metric": "trained_base_ab", "vocab": V, "depth": d, "branches": J,
        "base_steps": base_steps, "distill_steps": distill_steps,
        "heldout_argmax_agreement": round(learned, 4),
        "acceptance_fresh": results,
    }), flush=True)


if __name__ == "__main__":
    main()
