"""Block-level prefix caching over the paged engine (engine/prefix_cache.py).

Exactness gate: a prefix-cache hit must produce bit-identical output to full
recomputation (shared pages hold the same quantized KV as a fresh prefill of
the same tokens at the same positions). Plus lifecycle invariants: refcounts,
zero-ref caching, LRU eviction under pool pressure, no partial-page sharing.
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
    vocab_size=64,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
)

PS = 8  # tiny pages so short prompts span several


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def _engine(model, params, prefix=True, max_batch=2, max_new=6):
    cfg = EngineConfig(
        max_batch_size=max_batch,
        max_seq_len=64,
        page_size=PS,
        prefill_chunk=16,
        max_new_tokens=max_new,
        temperature=0.0,
        prefix_cache=prefix,
    )
    return Engine(model, params, cfg, kv_dtype=jnp.int8, kv_layout="paged")


def _prompt(n, seed=0):
    rng = np.random.default_rng(seed)
    return list(map(int, rng.integers(1, CFG.vocab_size, n)))


def test_prefix_hit_is_exact(model_and_params):
    """Second identical prompt adopts cached pages and emits identical
    tokens to the no-prefix-cache engine."""
    model, params = model_and_params
    prompt = _prompt(20, seed=3)  # 2 full pages + 4-token tail at PS=8

    ref_eng = _engine(model, params, prefix=False)
    r0 = ref_eng.add_request(prompt)
    ref_out = ref_eng.run()[r0]

    eng = _engine(model, params, prefix=True)
    a = eng.add_request(prompt)
    out_a = eng.run()[a]
    assert eng.metrics()["prefix_hit_tokens"] == 0
    b = eng.add_request(prompt)
    out_b = eng.run()[b]

    assert out_a == ref_out
    assert out_b == ref_out
    # 20 tokens => 2 publishable pages => 16 adopted tokens on the rerun.
    assert eng.metrics()["prefix_hit_tokens"] == 16
    assert eng.metrics()["prefix_cached_pages"] == 2


def test_prefix_partial_prefix_extends(model_and_params):
    """A longer prompt sharing only a prefix adopts the shared pages and
    prefills just its tail; output matches the uncached engine."""
    model, params = model_and_params
    base = _prompt(16, seed=5)  # exactly 2 pages
    longer = base + _prompt(10, seed=6)

    ref_eng = _engine(model, params, prefix=False)
    r = ref_eng.add_request(longer)
    ref_out = ref_eng.run()[r]

    eng = _engine(model, params, prefix=True)
    eng.add_request(base)
    eng.run()
    b = eng.add_request(longer)
    out = eng.run()[b]
    assert out == ref_out
    # base is page-aligned (16 = 2*PS): at most (len-1)//PS = 1 page may be
    # adopted when base itself reruns, but `longer` extends past it, so both
    # full base pages match => 16 hit tokens.
    assert eng.metrics()["prefix_hit_tokens"] == 16


def test_prefix_page_aligned_prompt_leaves_tail(model_and_params):
    """A fully page-aligned prompt may adopt at most (len-1)//ps pages —
    at least one token must remain for prefill to produce logits."""
    model, params = model_and_params
    prompt = _prompt(16, seed=7)  # exactly 2*PS

    ref_eng = _engine(model, params, prefix=False)
    r = ref_eng.add_request(prompt)
    ref_out = ref_eng.run()[r]

    eng = _engine(model, params, prefix=True)
    eng.add_request(prompt)
    eng.run()
    b = eng.add_request(prompt)
    out = eng.run()[b]
    assert out == ref_out
    assert eng.metrics()["prefix_hit_tokens"] == PS  # 1 page, not 2


def test_prefix_no_partial_page_sharing(model_and_params):
    """Prompts shorter than one page never share."""
    model, params = model_and_params
    prompt = _prompt(PS - 1, seed=9)
    eng = _engine(model, params, prefix=True)
    eng.add_request(prompt)
    eng.run()
    eng.add_request(prompt)
    eng.run()
    assert eng.metrics()["prefix_hit_tokens"] == 0


def test_prefix_page_lifecycle_accounting(model_and_params):
    """After all requests retire: no live refs, cached pages + free pages
    account for the whole pool."""
    model, params = model_and_params
    eng = _engine(model, params, prefix=True)
    total = eng.allocator.num_pages
    for seed in (1, 2, 1):  # seed 1 repeats -> one hit
        eng.add_request(_prompt(20, seed=seed))
        eng.run()
    assert not eng.prefix.refs  # nothing live
    m = eng.metrics()
    assert m["prefix_hit_tokens"] == 16
    assert m["kv_pages_free"] + m["prefix_cached_pages"] == total
    assert m["prefix_reusable_pages"] == m["prefix_cached_pages"]


def test_prefix_eviction_under_pressure(model_and_params):
    """When the pool can't satisfy an allocation, zero-ref cached pages are
    evicted (oldest first) and the request still runs correctly."""
    model, params = model_and_params
    eng = _engine(model, params, prefix=True, max_batch=1, max_new=4)
    total = eng.allocator.num_pages  # max_batch=1 * 64 / 8 = 8 pages

    eng.add_request(_prompt(20, seed=11))  # needs 3 pages, caches 2
    eng.run()
    assert eng.metrics()["prefix_cached_pages"] == 2

    # 33 prompt + 31 new = 64 tokens -> all 8 pages: must evict the 2 cached.
    big = _prompt(33, seed=12)
    ref_eng = _engine(model, params, prefix=False, max_batch=1, max_new=4)
    rr = ref_eng.add_request(big, max_new_tokens=31)
    ref_out = ref_eng.run()[rr]

    rid = eng.add_request(big, max_new_tokens=31)
    out = eng.run()[rid]
    assert out == ref_out
    m = eng.metrics()
    assert m["prefix_evictions"] >= 1
    assert m["kv_pages_free"] + m["prefix_cached_pages"] == total


def test_prefix_requires_paged_layout(model_and_params):
    model, params = model_and_params
    cfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefix_cache=True)
    with pytest.raises(ValueError, match="paged"):
        Engine(model, params, cfg, kv_layout="dense")


def test_prefix_rejects_speculative_mode(model_and_params):
    model, params = model_and_params
    cfg = EngineConfig(
        max_batch_size=2, max_seq_len=64, page_size=PS, prefix_cache=True
    )
    with pytest.raises(ValueError, match="speculative"):
        Engine(
            model, params, cfg, kv_layout="paged",
            draft_model=model, draft_params=params,
        )


def test_prefix_cancel_mid_prefill_releases_refs(model_and_params):
    """Cancelling a request that adopted shared pages mid-prefill drops its
    references without freeing the cached pages."""
    model, params = model_and_params
    eng = _engine(model, params, prefix=True)
    total = eng.allocator.num_pages
    prompt = _prompt(40, seed=21)  # several chunks at prefill_chunk=16
    eng.add_request(prompt)
    eng.run()
    cached = eng.metrics()["prefix_cached_pages"]
    assert cached == 5  # 40 // 8

    rid = eng.add_request(prompt)
    eng.step()  # admits + first (only remaining) chunk may not finish
    eng.cancel(rid)
    eng.run()
    assert not eng.prefix.refs
    m = eng.metrics()
    assert m["kv_pages_free"] + m["prefix_cached_pages"] == total


# -- tree speculation x prefix cache (round 5, VERDICT r4 item 7) ------------


def _tree_engine(model, params, prefix=True, **spec):
    cfg = EngineConfig(
        max_batch_size=2, max_seq_len=64, page_size=PS, prefill_chunk=16,
        max_new_tokens=8, temperature=0.0, prefix_cache=prefix,
    )
    return Engine(model, params, cfg, kv_dtype=jnp.int8, kv_layout="paged",
                  **spec)


def test_prefix_tree_speculation_exact(model_and_params):
    """Prompt-lookup TREE speculation composes with the prefix cache (the
    round-3 guard lifted): a prefix hit under tree decoding emits exactly
    the no-prefix engine's stream, and the hit metrics match the plain
    engine's (tree-transient writes never touch published pages)."""
    model, params = model_and_params
    spec = dict(prompt_lookup=3, lookup_branches=2, gamma=3)
    prompt = _prompt(20, seed=3)

    ref_eng = _tree_engine(model, params, prefix=False, **spec)
    r0 = ref_eng.add_request(prompt)
    ref_out = ref_eng.run()[r0]

    eng = _tree_engine(model, params, prefix=True, **spec)
    a = eng.add_request(prompt)
    out_a = eng.run()[a]
    b = eng.add_request(prompt)
    out_b = eng.run()[b]
    assert out_a == ref_out
    assert out_b == ref_out
    assert eng.metrics()["prefix_hit_tokens"] == 16
    assert eng.metrics()["prefix_cached_pages"] == 2


def test_prefix_medusa_tree_exact(model_and_params):
    """Trained-drafting-heads trees (medusa) x prefix cache: greedy stream
    equals the plain (non-tree, non-prefix) engine's on hit and miss."""
    from protoquant_tpu.models.medusa import init_medusa

    model, params = model_and_params
    heads, hp = init_medusa(model, depth=3, rng=jax.random.PRNGKey(5),
                            dtype=jnp.float32)
    prompt = _prompt(20, seed=4)

    plain = _engine(model, params, prefix=False, max_new=8)
    r0 = plain.add_request(prompt)
    ref_out = plain.run()[r0]

    eng = _tree_engine(model, params, prefix=True,
                       medusa_heads=heads, medusa_params=hp,
                       lookup_branches=2, gamma=3)
    a = eng.add_request(prompt)
    out_a = eng.run()[a]
    b = eng.add_request(prompt)
    out_b = eng.run()[b]
    assert out_a == ref_out
    assert out_b == ref_out
    assert eng.metrics()["prefix_hit_tokens"] == 16


def test_prefix_adoption_during_tree_decode(model_and_params):
    """The adversarial interleaving: request B adopts the prefix request A
    published while A is STILL tree-decoding in the same batch — A's
    transient candidate writes (losing branches, compactions) land only in
    its private tail pages, so B's stream is exact."""
    model, params = model_and_params
    spec = dict(prompt_lookup=3, lookup_branches=2, gamma=3)
    prompt = _prompt(20, seed=6)

    ref_eng = _tree_engine(model, params, prefix=False, **spec)
    r0 = ref_eng.add_request(prompt)
    ref_out = ref_eng.run()[r0]

    eng = _tree_engine(model, params, prefix=True, **spec)
    a = eng.add_request(prompt)
    # Drive A through prefill (publication) and a few tree ticks.
    for _ in range(4):
        eng.step()
    req_a = next(r for r in eng.slot_req if r is not None and r.rid == a)
    assert len(req_a.out) >= 1  # A is mid-decode
    b = eng.add_request(prompt)  # adopts A's published pages now
    outs = eng.run()
    assert outs[a] == ref_out
    assert outs[b] == ref_out
    assert eng.metrics()["prefix_hit_tokens"] == 16
