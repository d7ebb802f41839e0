"""Tree-structured (Medusa-style) draft-free speculation.

The defining invariant, exactly as for chain speculation: whatever the
candidate tree proposes, the engine's output equals plain greedy decoding
token-for-token — acceptance only ever commits proposals that match the
target's own greedy choice, the rejected branches' K/V rows are dead by
construction (the winning branch compacts into chain slots before lengths
advance), and the correction token is the target's own pick.

The compaction (cache.reorder_tail) is load-bearing: if a non-first branch
ever wins and its rows were NOT moved into chain order, every subsequent
token would attend to wrong K/V and the stream would diverge — so the
engine-level exact-match over long generations is also the compaction test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.engine.engine import (
    _ngram_propose_branches,
    _tree_topology,
)
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


@pytest.fixture(scope="module")
def model_and_params():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    return model, params


def test_tree_topology():
    depths, mask = _tree_topology(branches=3, depth=2)
    assert list(depths) == [0, 1, 2, 1, 2, 1, 2]
    # Node 4 (branch 1, depth 2) sees itself, node 3, root — nothing else.
    assert list(mask[4]) == [True, False, False, True, True, False, False]
    # Root sees only itself.
    assert list(mask[0]) == [True] + [False] * 6


def test_ngram_branch_proposals_distinct_first_tokens():
    hist = [1, 2, 9, 1, 2, 7, 5, 1, 2]
    props = _ngram_propose_branches(hist, n=2, depth=2, branches=3)
    firsts = [int(p[0]) for p in props if p[0] != 0]
    # Both continuations of (1, 2) — most recent first — with distinct
    # first tokens: 7 (from index 3) and 9 (from index 0).
    assert firsts == [7, 9]
    assert list(props[0]) == [7, 5]
    assert list(props[1]) == [9, 1]


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_tree_engine_matches_plain_greedy(model_and_params, kv_dtype):
    """Engine-level exact-match vs plain greedy across slot reuse + long
    generations (compaction correctness rides on this — see module doc)."""
    model, params = model_and_params
    ecfg = EngineConfig(max_batch_size=3, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=24, temperature=0.0)
    # Repetitive prompts so the n-gram matcher proposes several branches.
    rng = np.random.default_rng(3)
    base = [int(t) for t in rng.integers(1, 8, 6)]
    prompts = [base * 2, [5, 6, 7, 5, 6, 7, 5, 6], base + base[:3],
               [9, 2, 9, 2, 9, 2, 9]]

    plain = Engine(model, params, ecfg, kv_dtype=kv_dtype)
    plain_rids = [plain.add_request(p, 24) for p in prompts]
    plain_outs = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=kv_dtype,
                 prompt_lookup=3, gamma=3, lookup_branches=3)
    rids = [eng.add_request(p, 24) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    # Speculation actually committed multi-token ticks.
    assert eng.stats["steps"] < eng.stats["tokens_generated"], eng.stats
    assert eng.metrics()["spec_acceptance_rate"] > 0.0


def test_tree_beats_or_matches_chain_acceptance(model_and_params):
    """On self-repeating streams, J=3 branches accept at least as many
    proposals as the single-chain lookup (same n, same depth) — the point
    of paying for tree width."""
    model, params = model_and_params
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=32, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2, 1]]

    def run(branches):
        eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                     prompt_lookup=3, gamma=3, lookup_branches=branches)
        for p in prompts:
            eng.add_request(p, 32)
        eng.run()
        return eng.metrics()["spec_acceptance_rate"]

    chain, tree = run(1), run(3)
    assert tree >= chain - 1e-9, (tree, chain)


def test_tree_guards(model_and_params):
    model, params = model_and_params
    with pytest.raises(ValueError, match="prompt_lookup"):
        Engine(model, params,
               EngineConfig(max_batch_size=2, max_seq_len=64),
               kv_dtype=jnp.float32, lookup_branches=2)
    # Tree x ring composes since round 5 (reorder_tail through ring
    # columns); a window wide enough for the tree must CONSTRUCT — the
    # too-narrow case is test_tree_ring_window_narrower_than_tree_is_refused.
    eng_ring = Engine(model, params,
                      EngineConfig(max_batch_size=2, max_seq_len=64,
                                   stream_window=16),
                      kv_dtype=jnp.int8, kv_layout="ring",
                      prompt_lookup=2, lookup_branches=2)
    assert eng_ring._tree_mode
    # Tree x prefix_cache composes since round 5 (transient candidate
    # writes stay in private tail pages — tests/test_prefix_cache.py);
    # constructing must succeed.
    eng = Engine(model, params,
                 EngineConfig(max_batch_size=2, max_seq_len=64, page_size=16,
                              prefix_cache=True),
                 kv_dtype=jnp.int8, kv_layout="paged",
                 prompt_lookup=2, lookup_branches=2)
    assert eng.prefix is not None


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_tree_nonfirst_branch_commit_compacts_cache(model_and_params,
                                                    kv_dtype, monkeypatch):
    """Force branch 1 (not 0) to hold the true greedy continuation every
    tick: the engine must accept it fully, COMPACT its K/V rows from the
    scattered tree slots into chain order, and keep producing the exact
    greedy stream afterwards — the direct regression for
    cache.reorder_tail (branch 0 commits are an identity move and cannot
    catch a broken gather/scatter)."""
    import protoquant_tpu.engine.engine as E
    from protoquant_tpu.models import greedy_generate

    model, params = model_and_params
    prompt = [5, 6, 7, 5, 6, 7, 5, 6]
    N = 24
    ref = list(np.asarray(greedy_generate(
        model, params, jnp.asarray([prompt], jnp.int32), N, 96,
        kv_dtype=kv_dtype))[0])

    bests = []
    real_score = E._tree_score_and_accept

    def spy_score(model_, params_, caches, window, active, key, samp,
                  branches, depth, bias=None, **kw):
        best, accepted, corr, caches = real_score(
            model_, params_, caches, window, active, key, samp,
            branches=branches, depth=depth, bias=bias, **kw)
        bests.append((np.asarray(best).copy(), np.asarray(accepted).copy()))
        return best, accepted, corr, caches

    def rigged_propose(hist, n, depth, branches):
        # Branch 0: junk the target will reject at node 1. Branch 1: the
        # TRUE greedy continuation (read from the reference stream).
        done = len(hist) - len(prompt)
        future = ref[done : done + depth]
        out = np.zeros((branches, depth), np.int32)
        out[0, :] = 63  # vocab-edge junk
        out[1, : len(future)] = future
        return out

    monkeypatch.setattr(E, "_ngram_propose_branches", rigged_propose)
    monkeypatch.setattr(E, "_tree_score_and_accept", spy_score)

    eng = Engine(model, params,
                 EngineConfig(max_batch_size=1, max_seq_len=96,
                              prefill_chunk=16, max_new_tokens=N,
                              temperature=0.0),
                 kv_dtype=kv_dtype, prompt_lookup=3, gamma=3,
                 lookup_branches=3)
    rid = eng.add_request(prompt, N)
    out = eng.run()[rid]
    assert out == ref, (out, ref)

    b = np.concatenate([x[0] for x in bests])
    a = np.concatenate([x[1] for x in bests])
    # Branch 1 won with real acceptances (junk branch 0 lost) — the
    # compaction path genuinely moved rows.
    assert ((b == 1) & (a > 0)).sum() >= 3, (b.tolist(), a.tolist())


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_tree_dp_tp_engine_matches_single_device(model_and_params):
    """Tree speculation under a dp=2 x tp=2 mesh: scoring + branch
    compaction run batch/head-sharded — outputs match the single-device
    tree engine (and therefore plain greedy) exactly."""
    # XLA:CPU's JIT segfaults compiling this test's mesh programs when the
    # full suite's hundreds of compiled executables are still loaded
    # (reproduced twice at exactly this test; fine standalone). Dropping
    # the caches first releases that pressure.
    jax.clear_caches()
    from protoquant_tpu.parallel import make_mesh, shard_params, tp_model
    from protoquant_tpu.utils.config import MeshConfig

    model, params = model_and_params
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=16, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2, 1],
               [9, 2, 9, 2, 9], [3, 3, 3, 3]]

    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 16) for p in prompts]
    plain_outs = plain.run()

    mesh = make_mesh(MeshConfig(dp=2, tp=2), jax.devices()[:4])
    model_tp = tp_model(CFG, "fp", mesh, dtype=jnp.float32)
    sparams = shard_params(params, mesh)
    with mesh:
        eng = Engine(model_tp, sparams, ecfg, kv_dtype=jnp.float32,
                     mesh=mesh, prompt_lookup=3, gamma=3, lookup_branches=3)
        rids = [eng.add_request(p, 16) for p in prompts]
        outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    assert eng.metrics()["spec_acceptance_rate"] > 0.0


def test_tree_paged_engine_matches_plain_greedy(model_and_params):
    """Tree speculation over the PAGED int8 layout: the branch compaction
    routes through the page table (moves past the mapped window land on the
    trash page) — outputs equal the plain greedy paged engine exactly."""
    model, params = model_and_params
    ecfg = EngineConfig(max_batch_size=3, max_seq_len=96, page_size=16,
                        prefill_chunk=16, max_new_tokens=24, temperature=0.0)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [1, 2, 1, 2, 1, 2, 1],
               [9, 2, 9, 2, 9]]

    plain = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="paged")
    plain_rids = [plain.add_request(p, 24) for p in prompts]
    plain_outs = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="paged",
                 prompt_lookup=3, gamma=3, lookup_branches=3)
    rids = [eng.add_request(p, 24) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    assert eng.stats["steps"] < eng.stats["tokens_generated"], eng.stats


def test_tree_speculation_int4_kv_exact(model_and_params):
    """Tree speculation on the KIVI int4 cache (round-4 guard lift): the
    candidate nodes live in the int8 tail, reorder_tail compacts tail rows
    only, and advance() re-flushes completed chunks FROM the compacted
    tail — so the engine's greedy stream EXACTLY matches plain greedy
    decoding on the same int4 cache across many chunk boundaries (G=8
    forces flushes mid-run)."""
    from protoquant_tpu.models import kv_cache as kvc

    model, params = model_and_params
    prompt = [5, 6, 7, 5, 6, 7, 5, 6]
    N = 24
    ecfg = EngineConfig(max_batch_size=1, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=N, temperature=0.0)
    old = kvc.INT4_KV_GROUP
    kvc.INT4_KV_GROUP = 8
    try:
        plain = Engine(model, params, ecfg, kv_dtype=jnp.int4)
        prid = plain.add_request(prompt, N)
        ref = plain.run()[prid]

        eng = Engine(model, params, ecfg, kv_dtype=jnp.int4,
                     prompt_lookup=3, gamma=3, lookup_branches=2)
        rid = eng.add_request(prompt, N)
        out = eng.run()[rid]
    finally:
        kvc.INT4_KV_GROUP = old
    assert out == ref, (out, ref)

    # Width guard: a tree wider than the KIVI chunk is rejected.
    kvc.INT4_KV_GROUP = 8
    try:
        with pytest.raises(ValueError, match="tree width"):
            Engine(model, params, ecfg, kv_dtype=jnp.int4,
                   prompt_lookup=3, gamma=4, lookup_branches=2)
    finally:
        kvc.INT4_KV_GROUP = old


@pytest.mark.parametrize("kv_dtype", [jnp.float32, jnp.int8])
def test_tree_speculation_sliding_window_exact(kv_dtype):
    """Tree speculation on a SLIDING-WINDOW model (round-4 guard lift):
    the ancestor relation replaces in-window causality and the window's
    lower bound uses depth-based query positions — the stream must equal
    plain windowed greedy decoding across many window-bound steps (the
    generation runs well past the 24-token window)."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=24,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 2, 9, 2, 9, 2]]
    N = 40  # >> window
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=N, temperature=0.0)

    plain = Engine(model, params, ecfg, kv_dtype=kv_dtype)
    prids = [plain.add_request(p, N) for p in prompts]
    pouts = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=kv_dtype,
                 prompt_lookup=3, lookup_branches=3, gamma=3)
    rids = [eng.add_request(p, N) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])
    # The run actually speculated (committed multi-token ticks).
    assert eng.stats["spec_accepted"] > 0


def test_tree_window_narrower_than_tree_is_refused():
    """A window smaller than the tree width cannot express the in-window
    node visibility — the model layer asserts rather than decoding wrong."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=4,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=1, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 prompt_lookup=3, lookup_branches=3, gamma=3)
    eng.add_request([5, 6, 7, 5, 6, 7, 5, 6], 8)
    with pytest.raises(AssertionError, match="tree width"):
        eng.run()


def test_tree_speculation_ring_layout_exact():
    """Tree speculation on the RING layout (round-5 guard lift — the last
    layout-reasoned tree guard): candidate nodes map to ring columns,
    reorder_tail compacts through _column, and stale rejected rows
    reconstruct as out-of-window positions the mask kills. The stream must
    equal the dense sliding-window engine's token-for-token, far past the
    ring's wrap point — with and without StreamingLLM sinks."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=24,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 2, 9, 2, 9, 2]]
    N = 40  # >> window: the ring wraps many times
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=N, temperature=0.0)

    dense = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    drids = [dense.add_request(p, N) for p in prompts]
    douts = dense.run()

    ring = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="ring",
                  prompt_lookup=3, lookup_branches=3, gamma=3)
    rrids = [ring.add_request(p, N) for p in prompts]
    routs = ring.run()
    for ra, rb in zip(drids, rrids):
        assert douts[ra] == routs[rb], (douts[ra], routs[rb])
    assert ring.stats["spec_accepted"] > 0  # trees actually committed
    # O(window) memory: the ring cache is smaller than max_seq_len.
    assert ring.caches[0].capacity < ecfg.max_seq_len


def test_tree_speculation_ring_sinks_exact():
    """Tree x ring x StreamingLLM sinks: a full-attention model served with
    stream_window + sinks under tree speculation matches the same engine
    WITHOUT trees (plain streaming decode is the ground truth here — dense
    full attention would differ once eviction starts)."""
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6]]
    N = 32
    ecfg = EngineConfig(max_batch_size=1, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=N, temperature=0.0,
                        stream_window=24, attention_sinks=4)

    plain = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="ring")
    prids = [plain.add_request(p, N) for p in prompts]
    pouts = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="ring",
                 prompt_lookup=3, lookup_branches=3, gamma=3)
    rids = [eng.add_request(p, N) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])


def test_tree_ring_window_narrower_than_tree_is_refused():
    """Ring + tree with a window the tree cannot fit is rejected EAGERLY
    at engine construction (readable error, not a scoring-time assert)."""
    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, sliding_window=8,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=1, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    with pytest.raises(ValueError, match="tree width"):
        Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="ring",
               prompt_lookup=3, lookup_branches=3, gamma=3)


def test_tree_speculation_hybrid_ring_exact():
    """Tree x PER-LAYER HYBRID ring (Gemma-2 alternating windows): sliding
    layers compact through RingInt8KVCache.reorder_tail, full-attention
    layers through the dense one — the mixed per-layer commit must still
    reproduce the all-dense engine's stream exactly."""
    from protoquant_tpu.models.kv_cache import Int8KVCache, RingInt8KVCache

    cfg = ModelConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, tie_word_embeddings=True,
        hidden_act="gelu_tanh", rmsnorm_unit_offset=True,
        scale_embeddings=True, head_dim_override=32,
        attn_logit_softcap=50.0, final_logit_softcap=30.0,
        sliding_window=16, alternating_sliding_window=True,
        sandwich_norms=True,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=96, prefill_chunk=16,
                        max_new_tokens=32, temperature=0.0)
    prompts = [[5, 9, 2, 7, 1, 3, 8, 8], [1, 2, 3, 1, 2, 3]]

    dense = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    drids = [dense.add_request(p, 32) for p in prompts]
    douts = dense.run()

    ring = Engine(model, params, ecfg, kv_dtype=jnp.int8, kv_layout="ring",
                  prompt_lookup=2, lookup_branches=2, gamma=2)
    assert isinstance(ring.caches[0], RingInt8KVCache)
    assert isinstance(ring.caches[1], Int8KVCache)
    rrids = [ring.add_request(p, 32) for p in prompts]
    routs = ring.run()
    for rd, rr in zip(drids, rrids):
        assert douts[rd] == routs[rr], (douts[rd], routs[rr])
