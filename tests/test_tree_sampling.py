"""Tree speculation at temperature > 0 (VERDICT r3 item 2).

The tree acceptance rule (engine._tree_score_and_accept_body) must leave
every emitted token's distribution EXACTLY the filtered target p~: the root
uses SpecInfer-style multi-round rejection over the branches' first tokens,
the chosen chain uses single-candidate rejection, and corrections sample the
residual. Gates mirror tests/test_speculative_sampling.py:

1. Distribution invariance for the lookup-tree engine (TVD bound over many
   seeds, with a power control separating a genuinely colder distribution).
2. Distribution invariance for the trained-heads (Medusa) tree engine —
   head proposals are arbitrary, exactness must not depend on them.
3. Filter composition: every emitted token lies in the target's top-k set.
4. Greedy rows in the SAME batch as sampled rows stay exactly greedy.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.models.medusa import init_medusa
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

# Repetitive prompt so the n-gram matcher proposes real branches.
PROMPT = [5, 6, 7, 5, 6, 7, 5, 6]


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


def _hist(make_engine, n_trials):
    """Frequency of the SECOND generated token (token 0 comes from the
    prefill's sampling — identical in both engines; token 1 is the first
    one the tree tick emits)."""
    h = np.zeros(CFG.vocab_size, np.int64)
    for seed in range(n_trials):
        eng = make_engine(seed)
        rid = eng.add_request(PROMPT, 3)
        out = eng.run()[rid]
        h[out[1]] += 1
    return h / n_trials


def _tvd(a, b):
    return 0.5 * float(np.abs(a - b).sum())


def test_tree_lookup_sampling_distribution_matches_plain(model_and_params):
    """Lookup-tree speculation at temperature 0.8 produces the same token
    distribution as plain sampling (TVD over 300 seeds). Branch proposals
    are point masses; the root multi-round + chain rejection must keep the
    marginal exactly p~."""
    model, params = model_and_params
    n = 300

    plain = _hist(
        lambda s: Engine(model, params, _ecfg(0.8, seed=s),
                         kv_dtype=jnp.float32),
        n,
    )
    tree = _hist(
        lambda s: Engine(model, params, _ecfg(0.8, seed=s),
                         kv_dtype=jnp.float32, prompt_lookup=3, gamma=3,
                         lookup_branches=3),
        n,
    )
    assert _tvd(plain, tree) < 0.18, _tvd(plain, tree)

    # Power control: the bound separates a genuinely different distribution.
    cold = _hist(
        lambda s: Engine(model, params, _ecfg(0.2, seed=s),
                         kv_dtype=jnp.float32),
        n,
    )
    assert _tvd(plain, cold) > 0.25, _tvd(plain, cold)


def test_medusa_tree_sampling_distribution_matches_plain(model_and_params):
    """Trained-heads tree ticks at temperature 0.8: UNtrained (random) heads
    propose junk — rejection + residual draws must still reproduce plain
    sampling's distribution exactly."""
    model, params = model_and_params
    n = 300
    heads, hp = init_medusa(model, 3, jax.random.PRNGKey(5),
                            dtype=jnp.float32)

    plain = _hist(
        lambda s: Engine(model, params, _ecfg(0.8, seed=s),
                         kv_dtype=jnp.float32),
        n,
    )
    med = _hist(
        lambda s: Engine(model, params, _ecfg(0.8, seed=s),
                         kv_dtype=jnp.float32, medusa_heads=heads,
                         medusa_params=hp, gamma=3, lookup_branches=2),
        n,
    )
    assert _tvd(plain, med) < 0.18, _tvd(plain, med)


def test_tree_sampling_filters_compose(model_and_params):
    """top-k threads through the tree accept program: every emitted token
    lies inside the target's top-2 set, whatever the branches proposed."""
    model, params = model_and_params
    eng = Engine(
        model, params, _ecfg(0.9, top_k=2, seed=11),
        kv_dtype=jnp.float32, prompt_lookup=3, gamma=3, lookup_branches=3,
    )
    rid = eng.add_request(PROMPT, 3)
    out = eng.run()[rid]

    toks = jnp.asarray([PROMPT + out], jnp.int32)
    logits = np.asarray(model.apply(params, toks))
    for i, tok in enumerate(out):
        pos = len(PROMPT) - 1 + i  # logits at pos predict token pos+1
        top2 = set(np.argsort(logits[0, pos])[-2:].tolist())
        assert tok in top2, (i, tok, top2)


def test_tree_mixed_greedy_and_sampled_batch(model_and_params):
    """A greedy request (per-request temperature 0) sharing a tree-tick
    batch with a sampled one still emits EXACTLY the plain greedy stream."""
    from protoquant_tpu.models import greedy_generate

    model, params = model_and_params
    N = 16
    ref = list(np.asarray(greedy_generate(
        model, params, jnp.asarray([PROMPT], jnp.int32), N, 96))[0])

    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                     max_new_tokens=N, temperature=0.8, seed=7),
        kv_dtype=jnp.float32, prompt_lookup=3, gamma=3, lookup_branches=3,
    )
    rid_g = eng.add_request(PROMPT, N, temperature=0.0)
    rid_s = eng.add_request([7, 8, 9], N)
    outs = eng.run()
    assert outs[rid_g] == ref, (outs[rid_g], ref)
    assert len(outs[rid_s]) == N
