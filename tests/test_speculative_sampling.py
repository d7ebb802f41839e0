"""Non-greedy speculative decoding (VERDICT r2 item 10).

Rejection-sampling acceptance (Leviathan et al., 2023) must leave every
emitted token's distribution EXACTLY the filtered target distribution p~ at
temperature > 0 — for any draft. Gates:

1. Distribution invariance: empirical token frequencies from the speculative
   engine match plain sampling across many seeds (TVD bound), with a power
   control showing the bound would catch a genuinely different distribution.
2. Perfect draft (q == p): acceptance probability min(1, p/q) = 1, so the
   acceptance rate is ~1 even at temperature > 0.
3. Adaptive gamma: lookahead widens under a perfect draft and collapses to 1
   under an adversarial one, driven by the measured per-tick acceptance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.utils.config import ModelConfig

# Subsystem matrix: full-coverage tier (fast tier: -m 'not slow').
pytestmark = pytest.mark.slow

CFG = ModelConfig(
    vocab_size=32,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    max_position_embeddings=64,
)

PROMPT = [3, 1, 4, 1, 5]


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def _ecfg(temperature, **kw):
    return EngineConfig(
        max_batch_size=1, max_seq_len=32, prefill_chunk=16,
        max_new_tokens=3, temperature=temperature, **kw,
    )


def _token1_histogram(make_engine, n_trials):
    """Frequency of the SECOND generated token (the first token comes from
    the prefill's host sampling — identical in both engines; token 1 is the
    first one the speculative tick emits)."""
    h = np.zeros(CFG.vocab_size, np.int64)
    for seed in range(n_trials):
        eng = make_engine(seed)
        rid = eng.add_request(PROMPT, 3)
        out = eng.run()[rid]
        h[out[1]] += 1
    return h / n_trials


def _tvd(a, b):
    return 0.5 * float(np.abs(a - b).sum())


def test_spec_sampling_distribution_matches_plain(model_and_params):
    """Speculative rejection sampling at temperature 0.8 produces the same
    token distribution as plain sampling (TVD over 300 seeds), including
    with a DIVERGENT draft (where rejections + residual draws do the work)."""
    model, params = model_and_params
    n = 300

    plain = _token1_histogram(
        lambda s: Engine(model, params, _ecfg(0.8, seed=s),
                         kv_dtype=jnp.float32),
        n,
    )
    # Divergent draft: differently-initialized weights — proposals are
    # frequently rejected, so the residual-sampling path is load-bearing.
    bad = model.init(jax.random.PRNGKey(99), jnp.zeros((1, 4), jnp.int32))
    spec = _token1_histogram(
        lambda s: Engine(model, params, _ecfg(0.8, seed=s),
                         kv_dtype=jnp.float32, draft_model=model,
                         draft_params=bad, gamma=3),
        n,
    )
    assert _tvd(plain, spec) < 0.18, _tvd(plain, spec)

    # Power control: the same bound separates a genuinely different
    # distribution (temperature 0.2) from the 0.8 reference.
    cold = _token1_histogram(
        lambda s: Engine(model, params, _ecfg(0.2, seed=s),
                         kv_dtype=jnp.float32),
        n,
    )
    assert _tvd(plain, cold) > 0.25, _tvd(plain, cold)


def test_prompt_lookup_sampling_distribution_matches_plain(model_and_params):
    """Prompt-lookup proposals are point masses (q~ = one-hot): acceptance
    prob is p~(x), the residual removes x and renormalizes — distribution
    still exactly p~."""
    model, params = model_and_params
    n = 300
    # A repetitive prompt so the n-gram matcher actually proposes.
    prompt = [5, 6, 7, 5, 6, 7, 5, 6]

    def hist(make_engine):
        h = np.zeros(CFG.vocab_size, np.int64)
        for seed in range(n):
            eng = make_engine(seed)
            rid = eng.add_request(prompt, 3)
            out = eng.run()[rid]
            h[out[1]] += 1
        return h / n

    plain = hist(lambda s: Engine(model, params, _ecfg(0.8, seed=s),
                                  kv_dtype=jnp.float32))
    spec = hist(lambda s: Engine(model, params, _ecfg(0.8, seed=s),
                                 kv_dtype=jnp.float32, prompt_lookup=3,
                                 gamma=3))
    assert _tvd(plain, spec) < 0.18, _tvd(plain, spec)


def test_spec_sampling_perfect_draft_accepts(model_and_params):
    """q == p => accept prob min(1, p/q) = 1: acceptance stays ~1 at
    temperature > 0 even though both streams are stochastic."""
    model, params = model_and_params
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=48, prefill_chunk=16,
                     max_new_tokens=16, temperature=0.7, seed=5),
        kv_dtype=jnp.float32, draft_model=model, draft_params=params, gamma=3,
    )
    rids = [eng.add_request(PROMPT, 16), eng.add_request([7, 8, 9], 16)]
    outs = eng.run()
    assert all(len(outs[r]) == 16 for r in rids)
    assert eng.metrics()["spec_acceptance_rate"] > 0.95, eng.metrics()


def test_spec_sampling_filters_compose(model_and_params):
    """top-k/top-p filters thread through the accept program: every emitted
    token must lie inside the target's top-k set (k=2 here), whatever the
    draft proposed."""
    model, params = model_and_params
    bad = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 4), jnp.int32))
    eng = Engine(
        model, params,
        _ecfg(0.9, top_k=2, seed=11),
        kv_dtype=jnp.float32, draft_model=model, draft_params=bad, gamma=3,
    )
    rid = eng.add_request(PROMPT, 3)
    out = eng.run()[rid]

    # Recompute the target's top-2 set at each emitted position.
    toks = jnp.asarray([PROMPT + out], jnp.int32)
    logits = np.asarray(model.apply(params, toks))
    for i, tok in enumerate(out):
        pos = len(PROMPT) - 1 + i  # logits at pos predict token pos+1
        top2 = set(np.argsort(logits[0, pos])[-2:].tolist())
        assert tok in top2, (i, tok, top2)


def test_adaptive_gamma(model_and_params):
    """Acceptance-rate feedback: a perfect draft widens the lookahead to the
    cap; an adversarial draft collapses it to 1."""
    model, params = model_and_params
    cfg = EngineConfig(max_batch_size=1, max_seq_len=64, prefill_chunk=16,
                       max_new_tokens=24, temperature=0.0)

    eng = Engine(model, params, cfg, kv_dtype=jnp.float32,
                 draft_model=model, draft_params=params, gamma=5,
                 adaptive_gamma=True)
    eng._gamma_cur = 1  # start narrow; perfect acceptance must widen it
    rid = eng.add_request(PROMPT, 24)
    eng.run()
    assert eng._gamma_cur == 5, eng._gamma_cur

    bad = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 4), jnp.int32))
    eng2 = Engine(model, params, cfg, kv_dtype=jnp.float32,
                  draft_model=model, draft_params=bad, gamma=5,
                  adaptive_gamma=True)
    rid2 = eng2.add_request(PROMPT, 24)
    outs2 = eng2.run()
    assert eng2._gamma_cur == 1, eng2._gamma_cur

    # Whatever gamma did, the greedy stream is still exactly greedy.
    plain = Engine(model, params, cfg, kv_dtype=jnp.float32)
    prid = plain.add_request(PROMPT, 24)
    pouts = plain.run()
    assert pouts[prid] == outs2[rid2]


def test_spec_sampling_with_paged_target(model_and_params):
    """Rejection-sampling speculation composes with the paged target cache
    at temperature > 0: runs, fills, and keeps acceptance ~1 with a perfect
    draft (the length-rewind rollback works the same on paged pools)."""
    model, params = model_and_params
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, page_size=16,
                     prefill_chunk=16, max_new_tokens=12, temperature=0.7,
                     seed=3),
        kv_dtype=jnp.int8, kv_layout="paged",
        draft_model=model, draft_params=params, gamma=3,
    )
    rids = [eng.add_request(PROMPT, 12), eng.add_request([7, 8, 9], 12)]
    outs = eng.run()
    assert all(len(outs[r]) == 12 for r in rids)
    assert eng.metrics()["spec_acceptance_rate"] > 0.9, eng.metrics()
