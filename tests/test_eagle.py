"""EAGLE-style feature-space drafting (ROADMAP item 7 / VERDICT r3
missing 5).

The one-layer draft attends over accumulated base features through its own
KV cache and proposes linear chains; acceptance rides the SAME
rejection-sampling program as draft-model speculation, so the invariants
mirror tests/test_spec_engine + test_speculative_sampling:

1. Greedy exactness: whatever the (untrained, junk) draft proposes, the
   engine's stream equals plain greedy decoding token-for-token.
2. Distribution invariance at temperature > 0 (TVD vs plain sampling).
3. Training: the combined CE + feature-regression loss decreases, and a
   trained draft's acceptance beats the untrained one on repetitive text.
4. Conversion: quantize_eagle serves int8 draft weights through the same
   engine mode.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel, init_eagle, train_eagle
from protoquant_tpu.models.eagle import quantize_eagle
from protoquant_tpu.utils.config import ModelConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    vocab_size=64,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


@pytest.fixture(scope="module")
def eagle(model_and_params):
    model, params = model_and_params
    return init_eagle(model, jax.random.PRNGKey(3), dtype=jnp.float32,
                      base_params=params)


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_eagle_engine_matches_plain_greedy(model_and_params, eagle,
                                           kv_dtype):
    """Untrained draft => junk proposals => the greedy stream must STILL be
    exact (multi-chunk prefill + slot reuse included)."""
    model, params = model_and_params
    draft, dp = eagle
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=8,
                        max_new_tokens=20, temperature=0.0)
    prompts = [[5, 9, 2, 7, 1, 3, 8, 8, 4, 2], [1, 2, 3], [9, 8, 7, 6],
               [4, 4]]

    plain = Engine(model, params, ecfg, kv_dtype=kv_dtype)
    prids = [plain.add_request(p, 20) for p in prompts]
    pouts = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=kv_dtype,
                 eagle_draft=draft, eagle_params=dp, gamma=3)
    rids = [eng.add_request(p, 20) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])


def test_eagle_sampling_distribution_matches_plain(model_and_params, eagle):
    """temperature 0.8 + top_k 8: draft logits feed q~ in the
    rejection-sampling accept, so emitted tokens are distribution-identical
    to plain sampling. top_k concentrates the support (a random tiny
    model's filtered distribution is otherwise near-uniform over V=64 and
    the n=300 TVD noise floor alone is ~0.14 — measured while writing this
    test; at n=2000 the unfiltered eagle TVD sits AT the floor, 0.093 vs
    0.094)."""
    model, params = model_and_params
    draft, dp = eagle
    n = 300
    prompt = [3, 1, 4, 1, 5]

    def hist(make_engine):
        h = np.zeros(CFG.vocab_size, np.int64)
        for seed in range(n):
            eng = make_engine(seed)
            rid = eng.add_request(prompt, 3)
            out = eng.run()[rid]
            h[out[1]] += 1
        return h / n

    def ecfg(temp, s):
        return EngineConfig(max_batch_size=1, max_seq_len=32,
                            prefill_chunk=16, max_new_tokens=3,
                            temperature=temp, top_k=8, seed=s)

    plain = hist(lambda s: Engine(model, params, ecfg(0.8, s),
                                  kv_dtype=jnp.float32))
    spec = hist(lambda s: Engine(model, params, ecfg(0.8, s),
                                 kv_dtype=jnp.float32, eagle_draft=draft,
                                 eagle_params=dp, gamma=3))
    tvd = 0.5 * float(np.abs(plain - spec).sum())
    assert tvd < 0.15, tvd
    # Power control: a genuinely different distribution fails the bound.
    cold = hist(lambda s: Engine(model, params, ecfg(0.2, s),
                                 kv_dtype=jnp.float32))
    assert 0.5 * float(np.abs(plain - cold).sum()) > 0.25


def test_eagle_training_improves_acceptance(model_and_params):
    """Self-distillation on the BASE MODEL'S OWN greedy rollout: acceptance
    measures draft/base agreement, so the training text must be
    base-generated (an arbitrary corpus teaches the draft a distribution
    the base does not follow — measured while writing this test: training
    on repetitive synthetic text DROPPED acceptance 0.015 -> 0.0)."""
    from protoquant_tpu.models import greedy_generate

    model, params = model_and_params
    prompt = [5, 9, 2, 7, 1, 3]
    gen = greedy_generate(
        model, params, jnp.asarray([prompt], jnp.int32), 40,
        kv_dtype=jnp.float32,
    )
    corpus = jnp.concatenate(
        [jnp.asarray([prompt], jnp.int32), gen], axis=1
    )

    draft, dp0 = init_eagle(model, jax.random.PRNGKey(5), dtype=jnp.float32,
                            base_params=params)
    dp1, losses = train_eagle(model, params, draft, dp0, [corpus] * 150,
                              lr=3e-3, w_ce=1.0)
    assert losses[-1] < 0.7 * losses[0], (losses[0], losses[-1])

    def acceptance(dparams):
        ecfg = EngineConfig(max_batch_size=1, max_seq_len=96,
                            prefill_chunk=16, max_new_tokens=24,
                            temperature=0.0)
        eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                     eagle_draft=draft, eagle_params=dparams, gamma=3)
        eng.add_request(prompt, 24)
        eng.run()
        return eng.metrics()["spec_acceptance_rate"]

    a0, a1 = acceptance(dp0), acceptance(dp1)
    assert a1 > a0, (a0, a1)


def test_eagle_quantized_draft_serves(model_and_params, eagle):
    """quantize_eagle -> int8 draft weights through the same engine mode:
    greedy stays exact (acceptance may differ; exactness must not)."""
    model, params = model_and_params
    draft, dp = eagle
    qdraft, qdp = quantize_eagle(draft, dp, mode="dynamic")
    ecfg = EngineConfig(max_batch_size=1, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=12, temperature=0.0)
    plain = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    prid = plain.add_request([5, 9, 2, 7], 12)
    ref = plain.run()[prid]
    eng = Engine(model, params, ecfg, kv_dtype=jnp.int8,
                 eagle_draft=qdraft, eagle_params=qdp, gamma=3)
    rid = eng.add_request([5, 9, 2, 7], 12)
    assert eng.run()[rid] == ref


def test_eagle_guards(model_and_params, eagle):
    model, params = model_and_params
    draft, dp = eagle
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64)
    with pytest.raises(ValueError, match="go together"):
        Engine(model, params, ecfg, kv_dtype=jnp.float32, eagle_draft=draft)
    with pytest.raises(ValueError, match="exclusive"):
        Engine(model, params, ecfg, kv_dtype=jnp.float32, eagle_draft=draft,
               eagle_params=dp, prompt_lookup=2)


# -- EAGLE-tree (EAGLE-2-style; VERDICT r4 item 2) ---------------------------


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_eagle_tree_matches_plain_greedy(model_and_params, eagle, kv_dtype):
    """lookup_branches > 1 with an eagle draft = tree speculation: the
    draft's top-J step-1 candidates continue greedily to depth gamma, the
    target scores the candidate tree in one forward — and the stream is
    EXACTLY plain greedy decoding (multi-chunk prefill, slot reuse, junk
    untrained proposals included)."""
    model, params = model_and_params
    draft, dp = eagle
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=8,
                        max_new_tokens=20, temperature=0.0)
    prompts = [[5, 9, 2, 7, 1, 3, 8, 8, 4, 2], [1, 2, 3], [9, 8, 7, 6],
               [4, 4]]

    plain = Engine(model, params, ecfg, kv_dtype=kv_dtype)
    prids = [plain.add_request(p, 20) for p in prompts]
    pouts = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=kv_dtype,
                 eagle_draft=draft, eagle_params=dp, gamma=3,
                 lookup_branches=3)
    rids = [eng.add_request(p, 20) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])


def test_eagle_tree_sampling_distribution_matches_plain(model_and_params,
                                                        eagle):
    """temperature 0.8 + top_k 8: tree rejection sampling over the EAGLE
    candidate tree keeps emitted tokens distribution-identical to plain
    sampling (the scorer's exactness never depends on the proposal
    source). Same TVD harness + power control as the linear EAGLE test."""
    model, params = model_and_params
    draft, dp = eagle
    n = 300
    prompt = [3, 1, 4, 1, 5]

    def hist(make_engine):
        h = np.zeros(CFG.vocab_size, np.int64)
        for seed in range(n):
            eng = make_engine(seed)
            rid = eng.add_request(prompt, 3)
            out = eng.run()[rid]
            h[out[1]] += 1
        return h / n

    def ecfg(temp, s):
        return EngineConfig(max_batch_size=1, max_seq_len=32,
                            prefill_chunk=16, max_new_tokens=3,
                            temperature=temp, top_k=8, seed=s)

    plain = hist(lambda s: Engine(model, params, ecfg(0.8, s),
                                  kv_dtype=jnp.float32))
    tree = hist(lambda s: Engine(model, params, ecfg(0.8, s),
                                 kv_dtype=jnp.float32, eagle_draft=draft,
                                 eagle_params=dp, gamma=2,
                                 lookup_branches=3))
    tvd = 0.5 * float(np.abs(plain - tree).sum())
    assert tvd < 0.15, tvd
    cold = hist(lambda s: Engine(model, params, ecfg(0.2, s),
                                 kv_dtype=jnp.float32))
    assert 0.5 * float(np.abs(plain - cold).sum()) > 0.25


def test_eagle_tree_adaptive_depth(model_and_params, eagle):
    """adaptive_gamma now composes with tree modes: depth shrinks toward 1
    under an untrained draft's ~0 acceptance, and the greedy stream stays
    exact through every depth change."""
    model, params = model_and_params
    draft, dp = eagle
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=24, temperature=0.0)
    prompts = [[5, 9, 2, 7, 1, 3], [1, 2, 3]]
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    prids = [plain.add_request(p, 24) for p in prompts]
    pouts = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 eagle_draft=draft, eagle_params=dp, gamma=4,
                 lookup_branches=2, adaptive_gamma=True)
    rids = [eng.add_request(p, 24) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])
    # Junk proposals -> acceptance ~0 -> depth adapted down to the floor.
    assert eng._gamma_cur == 1


def test_eagle_tree_logprobs_and_top_logprobs_match_plain(model_and_params,
                                                          eagle):
    """Per-request logprobs AND top-k alternatives through the EAGLE-tree
    tick equal plain decode's token-for-token (winning-branch parent-node
    gathers)."""
    model, params = model_and_params
    draft, dp = eagle
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    pr = plain.add_request([3, 17, 5, 9], 8, logprobs=True, top_logprobs=3)
    plain.run()
    pref = next(r for r in plain.finished if r.rid == pr)

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 eagle_draft=draft, eagle_params=dp, gamma=3,
                 lookup_branches=2)
    rid = eng.add_request([3, 17, 5, 9], 8, logprobs=True, top_logprobs=3)
    eng.run()
    req = next(r for r in eng.finished if r.rid == rid)
    assert req.out == pref.out
    np.testing.assert_allclose(req.logprobs, pref.logprobs,
                               rtol=1e-4, atol=1e-4)
    for g, w in zip(req.top_lps, pref.top_lps):
        assert [t for t, _ in g] == [t for t, _ in w]
        np.testing.assert_allclose([lp for _, lp in g],
                                   [lp for _, lp in w],
                                   rtol=1e-4, atol=1e-4)


def test_medusa_adaptive_depth_exact(model_and_params):
    """The lifted adaptive_gamma x medusa guard: trained-head trees adapt
    depth on acceptance while the greedy stream stays exactly plain (the
    stored next-tick proposals re-shape across depth changes)."""
    from protoquant_tpu.models.medusa import MedusaHeads, init_medusa

    model, params = model_and_params
    heads, hp = init_medusa(model, depth=4, rng=jax.random.PRNGKey(5),
                            dtype=jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=20, temperature=0.0)
    prompts = [[5, 9, 2, 7, 1, 3], [1, 2, 3]]
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    prids = [plain.add_request(p, 20) for p in prompts]
    pouts = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 medusa_heads=heads, medusa_params=hp, gamma=4,
                 lookup_branches=2, adaptive_gamma=True)
    rids = [eng.add_request(p, 20) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])


def test_eagle_tree_ring_layout_exact():
    """EAGLE-tree on the RING layout (round 5): the draft keeps its own
    dense feature cache while the target compacts through ring columns —
    stream must equal the plain dense engine's windowed greedy exactly.
    (Branch compaction with accepted>0 is stressed by the lookup-tree ring
    tests; reorder_tail is proposer-agnostic.)"""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=24,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    draft, dp = init_eagle(model, jax.random.PRNGKey(3), dtype=jnp.float32,
                           base_params=params)
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=32, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 2, 9, 2, 9, 2]]

    dense = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    drids = [dense.add_request(p, 32) for p in prompts]
    douts = dense.run()

    ring = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="ring",
                  eagle_draft=draft, eagle_params=dp, gamma=3,
                  lookup_branches=3)
    rrids = [ring.add_request(p, 32) for p in prompts]
    routs = ring.run()
    for ra, rb in zip(drids, rrids):
        assert douts[ra] == routs[rb], (douts[ra], routs[rb])
