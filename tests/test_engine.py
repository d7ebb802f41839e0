"""M5: continuous-batching engine.

Key invariant (SURVEY.md §4.2 item 5): batched continuous decoding produces
exactly the same tokens as one-request-at-a-time generation with the same
params (greedy), including across slot reuse and interleaved admission.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel, greedy_generate
from protoquant_tpu.utils.config import ModelConfig

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


def _engine(model, params, **over):
    cfg = EngineConfig(
        max_batch_size=over.pop("max_batch_size", 4),
        max_seq_len=64,
        prefill_chunk=16,
        max_new_tokens=over.pop("max_new_tokens", 8),
        temperature=0.0,
    )
    return Engine(model, params, cfg, kv_dtype=over.pop("kv_dtype", jnp.int8))


def _prompts(n, seed=0):
    rng = np.random.default_rng(seed)
    return [list(map(int, rng.integers(1, CFG.vocab_size, rng.integers(3, 12)))) for _ in range(n)]


def test_engine_single_request_matches_generate(model_and_params):
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    eng = _engine(model, params, kv_dtype=jnp.float32)
    rid = eng.add_request(prompt, max_new_tokens=8)
    out = eng.run()[rid]

    ref = greedy_generate(
        model,
        params,
        jnp.asarray([prompt], jnp.int32),
        max_new_tokens=8,
        max_seq=64,
        kv_dtype=jnp.float32,
    )
    assert out == list(np.asarray(ref)[0]), (out, np.asarray(ref)[0])


def test_engine_batched_equals_sequential(model_and_params):
    """The continuous-batching determinism gate."""
    model, params = model_and_params
    prompts = _prompts(6, seed=1)

    # Sequential reference: each prompt alone.
    seq_outs = []
    for p in prompts:
        ref = greedy_generate(
            model, params, jnp.asarray([p], jnp.int32), 8, 64, kv_dtype=jnp.float32
        )
        seq_outs.append(list(np.asarray(ref)[0]))

    # Batched: 6 requests through 4 slots (forces slot reuse).
    eng = _engine(model, params, kv_dtype=jnp.float32)
    rids = [eng.add_request(p, 8) for p in prompts]
    outs = eng.run()
    for rid, ref in zip(rids, seq_outs):
        assert outs[rid] == ref, f"request {rid}: {outs[rid]} != {ref}"


def test_engine_int8_kv_close_to_fp_kv(model_and_params):
    """Int8 KV cache: same greedy stream for at least the first tokens."""
    model, params = model_and_params
    prompts = _prompts(3, seed=2)
    out8 = {}
    out16 = {}
    for kv_dtype, sink in ((jnp.int8, out8), (jnp.float32, out16)):
        eng = _engine(model, params, kv_dtype=kv_dtype)
        rids = [eng.add_request(p, 6) for p in prompts]
        res = eng.run()
        for i, rid in enumerate(rids):
            sink[i] = res[rid]
    agree = np.mean(
        [a == b for i in out8 for a, b in zip(out8[i], out16[i])]
    )
    assert agree > 0.6, (agree, out8, out16)


def test_engine_interleaved_admission(model_and_params):
    """Requests added mid-flight produce the same outputs (continuous
    batching must not disturb already-running slots)."""
    model, params = model_and_params
    p1, p2 = _prompts(2, seed=3)

    ref1 = list(
        np.asarray(
            greedy_generate(model, params, jnp.asarray([p1], jnp.int32), 8, 64, kv_dtype=jnp.float32)
        )[0]
    )
    ref2 = list(
        np.asarray(
            greedy_generate(model, params, jnp.asarray([p2], jnp.int32), 8, 64, kv_dtype=jnp.float32)
        )[0]
    )

    eng = _engine(model, params, kv_dtype=jnp.float32)
    r1 = eng.add_request(p1, 8)
    eng.step()
    eng.step()
    r2 = eng.add_request(p2, 8)  # admitted while r1 decodes
    outs = eng.run()
    assert outs[r1] == ref1
    assert outs[r2] == ref2


def test_engine_metrics(model_and_params):
    model, params = model_and_params
    eng = _engine(model, params)
    eng.add_request([1, 2, 3], 4)
    eng.run()
    m = eng.metrics()
    assert m["tokens_generated"] >= 3  # prefill emits the first token
    assert m["prefills"] == 1
    assert m["queue_depth"] == 0


def test_engine_long_prompt_chunked_prefill(model_and_params):
    """Prompt longer than prefill_chunk exercises _extend_slot."""
    model, params = model_and_params
    rng = np.random.default_rng(4)
    prompt = list(map(int, rng.integers(1, CFG.vocab_size, 37)))  # > chunk=16
    ref = list(
        np.asarray(
            greedy_generate(model, params, jnp.asarray([prompt], jnp.int32), 6, 64, kv_dtype=jnp.float32)
        )[0]
    )
    eng = _engine(model, params, kv_dtype=jnp.float32)
    rid = eng.add_request(prompt, 6)
    outs = eng.run()
    assert outs[rid] == ref


def test_engine_prefill_interleaves_with_decode(model_and_params):
    """A long prompt admitted mid-stream must NOT stall running requests:
    at most one prefill chunk runs per tick, so an already-decoding slot
    emits exactly one token on every tick of the newcomer's prefill
    (VERDICT round-1 item 4; SURVEY.md §5.7)."""
    model, params = model_and_params
    eng = _engine(model, params, kv_dtype=jnp.float32, max_new_tokens=16)
    got1, got2 = [], []
    r1 = eng.add_request([1, 2, 3], 16, on_token=lambda r, t: got1.append(t))
    eng.step()
    # r1 prefilled (single chunk) -> first token, then the tick's decode
    # emitted a second.
    assert len(got1) == 2

    long_prompt = list(range(1, 49))  # 48 tokens = 3 chunks of prefill_chunk=16
    r2 = eng.add_request(long_prompt, 4, on_token=lambda r, t: got2.append(t))
    for i in range(3):
        n1 = len(got1)
        eng.step()
        # r1 kept decoding: exactly one new token per tick, even while r2's
        # prompt was streaming through prefill.
        assert len(got1) == n1 + 1, (i, n1, got1)
        if i < 2:
            assert got2 == []  # r2 still mid-prefill
    # Tick 3 ran r2's last chunk -> first token, then the batched decode
    # added its second.
    assert len(got2) == 2

    # Interleaving must not change outputs (greedy exactness).
    outs = eng.run()
    ref1 = list(
        np.asarray(
            greedy_generate(model, params, jnp.asarray([[1, 2, 3]], jnp.int32), 16, 64, kv_dtype=jnp.float32)
        )[0]
    )
    ref2 = list(
        np.asarray(
            greedy_generate(model, params, jnp.asarray([long_prompt], jnp.int32), 4, 64, kv_dtype=jnp.float32)
        )[0]
    )
    assert outs[r1] == ref1
    assert outs[r2] == ref2


def test_engine_top_p_sampling(model_and_params):
    """top_p < 1 samples valid tokens and stays deterministic per seed."""
    model, params = model_and_params
    cfg = EngineConfig(
        max_batch_size=2, max_seq_len=64, prefill_chunk=16,
        max_new_tokens=8, temperature=0.8, top_p=0.9, seed=7,
    )
    outs = []
    for _ in range(2):
        eng = Engine(model, params, cfg, kv_dtype=jnp.float32)
        rid = eng.add_request([3, 1, 4], 8)
        outs.append(eng.run()[rid])
    assert outs[0] == outs[1]  # same seed -> same stream
    assert all(0 <= t < CFG.vocab_size for t in outs[0])


def test_top_p_masks_tail():
    """Unit check: with a peaked distribution and small top_p, only the top
    token survives the nucleus filter."""
    from protoquant_tpu.engine.sampling import sample

    logits = jnp.asarray([[10.0, 0.0, -1.0, -2.0]])
    for seed in range(5):
        tok = sample(logits, jax.random.PRNGKey(seed), temperature=1.0, top_p=0.5)
        assert int(tok[0]) == 0


def test_engine_eos_and_streaming(model_and_params):
    """Per-request eos stops decode; on_token streams every emitted token."""
    model, params = model_and_params
    eng = _engine(model, params, kv_dtype=jnp.float32, max_new_tokens=16)
    streamed = []
    rid = eng.add_request([1, 2, 3], 16, on_token=lambda r, t: streamed.append((r, t)))
    out = eng.run()[rid]
    assert [t for r, t in streamed] == out and all(r == rid for r, t in streamed)

    # eos: pick the first emitted token as eos of a fresh identical request;
    # generation must stop right after it appears.
    eos = out[0]
    eng2 = _engine(model, params, kv_dtype=jnp.float32, max_new_tokens=16)
    rid2 = eng2.add_request([1, 2, 3], 16, eos_id=eos)
    out2 = eng2.run()[rid2]
    assert out2[-1] == eos and len(out2) <= len(out)


def test_http_server_end_to_end(model_and_params):
    """HTTP frontend: concurrent /generate requests batch through the engine
    and match direct engine outputs."""
    import json
    import threading
    import urllib.request

    from protoquant_tpu.engine.server import EngineServer

    model, params = model_and_params
    eng = _engine(model, params, kv_dtype=jnp.float32)
    srv = EngineServer(eng, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(base + "/health", timeout=10) as r:
            assert json.load(r)["ok"]

        prompts = [[3, 17, 5, 9], [1, 2, 3], [9, 9, 1]]
        results = {}

        def call(i, p):
            req = urllib.request.Request(
                base + "/generate",
                data=json.dumps({"tokens": p, "max_new_tokens": 6}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.load(r)["tokens"]

        threads = [threading.Thread(target=call, args=(i, p)) for i, p in enumerate(prompts)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)

        for i, p in enumerate(prompts):
            ref_eng = _engine(model, params, kv_dtype=jnp.float32)
            rid = ref_eng.add_request(p, 6)
            ref = ref_eng.run()[rid]
            assert results[i] == ref, (i, results[i], ref)

        with urllib.request.urlopen(base + "/metrics", timeout=10) as r:
            m = json.load(r)
        assert m["tokens_generated"] >= 15
    finally:
        srv.stop()


def test_http_server_bad_request(model_and_params):
    import json
    import urllib.error
    import urllib.request

    from protoquant_tpu.engine.server import EngineServer

    model, params = model_and_params
    srv = EngineServer(_engine(model, params, kv_dtype=jnp.float32), port=0).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/generate",
            data=json.dumps({"max_new_tokens": 4}).encode(),  # no tokens
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


def test_engine_rejects_oversized_prompt(model_and_params):
    model, params = model_and_params
    eng = _engine(model, params, kv_dtype=jnp.float32)
    with pytest.raises(ValueError, match="max_seq_len"):
        eng.add_request(list(range(200)), 4)  # max_seq_len is 64


def test_engine_edge_request_validation(model_and_params):
    model, params = model_and_params
    eng = _engine(model, params, kv_dtype=jnp.float32)
    with pytest.raises(ValueError, match="empty"):
        eng.add_request([], 4)
    # Exactly max_seq_len is allowed (full-context prefill, finishes at once).
    rid = eng.add_request(list(range(1, 65)), 4)
    outs = eng.run()
    assert len(outs[rid]) >= 1
    # max_new_tokens=0 means literally zero generated tokens.
    eng2 = _engine(model, params, kv_dtype=jnp.float32)
    rid2 = eng2.add_request([1, 2, 3], 0)
    outs2 = eng2.run()
    assert outs2[rid2] == []


def test_http_server_oversized_prompt_returns_400(model_and_params):
    import json
    import urllib.error
    import urllib.request

    from protoquant_tpu.engine.server import EngineServer

    model, params = model_and_params
    srv = EngineServer(_engine(model, params, kv_dtype=jnp.float32), port=0).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/generate",
            data=json.dumps({"tokens": list(range(200)), "max_new_tokens": 2}).encode(),
        )
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()


@pytest.mark.slow
def test_engine_speculative_matches_plain_greedy(model_and_params):
    """Speculative engine mode (draft proposes, target verifies) must emit
    EXACTLY the plain greedy engine's streams — with a perfect draft (the
    target itself: ~100% acceptance) and with a divergent draft (an
    independently initialized model: low acceptance), across slot reuse and
    eos stops (VERDICT round-1 item 9)."""
    model, params = model_and_params
    prompts = _prompts(5, seed=9)

    plain = _engine(model, params, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 8) for p in prompts]
    plain_outs = plain.run()

    # Perfect draft: the target model itself.
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=8, temperature=0.0),
        kv_dtype=jnp.float32, draft_model=model, draft_params=params, gamma=3,
    )
    rids = [eng.add_request(p, 8) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    m = eng.metrics()
    assert m["spec_acceptance_rate"] > 0.9, m  # perfect draft accepts ~all
    # Fewer target ticks than tokens: speculation actually batched commits.
    assert eng.stats["steps"] < eng.stats["tokens_generated"], eng.stats

    # Divergent draft: differently-initialized weights — acceptance may be
    # near zero, output must STILL be exactly the plain greedy stream.
    bad_params = model.init(jax.random.PRNGKey(42), jnp.zeros((1, 4), jnp.int32))
    eng2 = Engine(
        model, params,
        EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=8, temperature=0.0),
        kv_dtype=jnp.float32, draft_model=model, draft_params=bad_params, gamma=3,
    )
    rids2 = [eng2.add_request(p, 8) for p in prompts]
    outs2 = eng2.run()
    for ra, rb in zip(plain_rids, rids2):
        assert plain_outs[ra] == outs2[rb], (plain_outs[ra], outs2[rb])


@pytest.mark.slow
def test_engine_speculative_accepts_sampling():
    """temperature > 0 + speculation is supported (rejection sampling keeps
    the target distribution invariant — tests/test_speculative_sampling.py);
    smoke: the engine runs and emits valid tokens."""
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=6, temperature=0.5),
        kv_dtype=jnp.float32, draft_model=model, draft_params=params, gamma=3,
    )
    rid = eng.add_request([3, 1, 4, 1, 5], 6)
    out = eng.run()[rid]
    assert len(out) == 6 and all(0 <= t < CFG.vocab_size for t in out)
    assert eng.metrics()["spec_acceptance_rate"] > 0.5  # perfect draft


@pytest.mark.slow
def test_engine_speculative_with_paged_target(model_and_params):
    """Speculative mode composes with the paged target cache: the draft
    stays dense, the target's gamma+1-wide writes land in mapped pages (or
    the trash page past the reserved chain) and the length rewind gives free
    rollback — output must exactly equal the plain greedy paged engine."""
    model, params = model_and_params
    prompts = _prompts(4, seed=11)

    plain = Engine(
        model, params,
        EngineConfig(max_batch_size=3, max_seq_len=64, page_size=16,
                     prefill_chunk=16, max_new_tokens=8, temperature=0.0),
        kv_dtype=jnp.int8, kv_layout="paged",
    )
    plain_rids = [plain.add_request(p, 8) for p in prompts]
    plain_outs = plain.run()

    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=3, max_seq_len=64, page_size=16,
                     prefill_chunk=16, max_new_tokens=8, temperature=0.0),
        kv_dtype=jnp.int8, kv_layout="paged",
        draft_model=model, draft_params=params, gamma=3,
    )
    rids = [eng.add_request(p, 8) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    assert eng.allocator.num_free == eng.allocator.num_pages


def test_engine_cancel_waiting_request(model_and_params):
    """Cancelling a queued (never-admitted) request retires it with no
    output and does not disturb the other requests."""
    model, params = model_and_params
    prompts = _prompts(3, seed=7)
    eng = _engine(model, params, max_batch_size=2, kv_dtype=jnp.float32)
    rids = [eng.add_request(p, 6) for p in prompts]
    assert eng.cancel(rids[2])
    out = eng.run()
    assert out[rids[2]] == []
    cancelled = {r.rid: r.cancelled for r in eng.finished}
    assert cancelled[rids[2]] and not cancelled[rids[0]] and not cancelled[rids[1]]

    for i in range(2):  # survivors match solo runs
        ref_eng = _engine(model, params, kv_dtype=jnp.float32)
        ref_rid = ref_eng.add_request(prompts[i], 6)
        assert out[rids[i]] == ref_eng.run()[ref_rid]

    assert not eng.cancel(rids[2])  # already finished -> False
    assert not eng.cancel(10_000)  # unknown rid -> False


def test_engine_cancel_mid_decode_frees_slot(model_and_params):
    """Cancelling a decoding request keeps its partial tokens, frees the
    slot, and the next tenant of that slot decodes correctly."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    full = _engine(model, params, max_batch_size=1, kv_dtype=jnp.float32)
    full_rid = full.add_request(prompt, 8)
    ref = full.run()[full_rid]

    eng = _engine(model, params, max_batch_size=1, kv_dtype=jnp.float32)
    rid = eng.add_request(prompt, 8)
    for _ in range(4):  # prefill tick + a few decode ticks
        eng.step()
    assert eng.cancel(rid)
    eng.step()  # applies the cancel; may also be a no-op decode-wise
    req = eng.finished[-1]
    assert req.rid == rid and req.cancelled and req.done
    assert 0 < len(req.out) < 8
    assert req.out == ref[: len(req.out)]  # partial output is a true prefix
    assert eng.slot_req == [None]

    rid2 = eng.add_request(prompt, 8)  # slot reuse after cancel
    assert eng.run()[rid2] == ref


def test_engine_cancel_mid_prefill(model_and_params):
    """Cancelling between prefill chunks drops the request before it ever
    decodes and releases its slot for the next request."""
    model, params = model_and_params
    long_prompt = list(range(1, 41))  # 40 tokens, chunk=16 -> 3 ticks
    eng = _engine(model, params, max_batch_size=1, kv_dtype=jnp.float32)
    rid = eng.add_request(long_prompt, 6)
    eng.step()  # first chunk only
    assert eng.prefilling and eng.prefilling[0].rid == rid
    assert eng.cancel(rid)
    eng.step()
    req = eng.finished[-1]
    assert req.rid == rid and req.cancelled and req.out == []
    assert not eng.prefilling and eng.slot_req == [None]

    prompt = [3, 17, 5, 9]
    ref_eng = _engine(model, params, kv_dtype=jnp.float32)
    ref_rid = ref_eng.add_request(prompt, 6)
    ref = ref_eng.run()[ref_rid]
    rid2 = eng.add_request(prompt, 6)
    assert eng.run()[rid2] == ref


def test_http_server_cancel_endpoint(model_and_params):
    import json
    import threading
    import time as _time
    import urllib.request

    from protoquant_tpu.engine.server import EngineServer

    model, params = model_and_params
    eng = _engine(model, params, kv_dtype=jnp.float32)
    srv = EngineServer(eng, port=0).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"

        def post(path, obj):
            req = urllib.request.Request(
                base + path,
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.load(r)

        # Unknown rid -> cancelled false.
        assert post("/cancel", {"request": 999})["cancelled"] is False

        result = {}

        def call():
            result.update(post("/generate", {"tokens": [3, 1, 4], "max_new_tokens": 40}))

        t = threading.Thread(target=call)
        t.start()
        _time.sleep(0.15)
        # rid 0 is the first request of this engine.
        cancel = post("/cancel", {"request": 0})
        t.join(timeout=120)
        if cancel["cancelled"]:
            assert result["cancelled"] is True
            assert len(result["tokens"]) <= 40
        else:  # lost the race: request already finished normally
            assert result["cancelled"] is False
    finally:
        srv.stop()


# -- prompt-lookup (draft-free) speculation ----------------------------------


def test_ngram_propose_unit():
    from protoquant_tpu.engine.engine import _ngram_propose

    # Trailing bigram (5, 6) occurred earlier at index 1; continuation 7 8 9.
    hist = [4, 5, 6, 7, 8, 9, 5, 6]
    assert _ngram_propose(hist, 2, 3) == [7, 8, 9]
    # Shorter continuation than gamma: pad with 0.
    hist = [1, 2, 3, 9, 2, 3]
    assert _ngram_propose(hist, 2, 4) == [9, 2, 3, 0]
    # Backoff: no bigram match, unigram 3 matched at index 0 -> continuation.
    hist = [3, 7, 8, 1, 3]
    assert _ngram_propose(hist, 2, 2) == [7, 8]
    # Nothing matches anywhere: all padding.
    assert _ngram_propose([1, 2, 3], 2, 3) == [0, 0, 0]
    # Most RECENT earlier occurrence wins.
    hist = [5, 1, 5, 2, 5]
    assert _ngram_propose(hist, 1, 1) == [2]


def test_engine_prompt_lookup_matches_greedy(model_and_params):
    """Prompt-lookup speculation emits exactly the plain greedy stream —
    with repetitive prompts (where lookup proposals can accept) and
    arbitrary ones (where acceptance may be zero)."""
    model, params = model_and_params
    prompts = _prompts(3, seed=13) + [[7, 9, 7, 9, 7, 9, 7, 9, 7]]

    plain = _engine(model, params, kv_dtype=jnp.float32)
    plain_rids = [plain.add_request(p, 10) for p in prompts]
    plain_outs = plain.run()

    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=10, temperature=0.0),
        kv_dtype=jnp.float32, prompt_lookup=2, gamma=3,
    )
    rids = [eng.add_request(p, 10) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(plain_rids, rids):
        assert plain_outs[ra] == outs[rb], (plain_outs[ra], outs[rb])
    assert eng.stats["spec_proposed"] > 0


@pytest.mark.slow
def test_engine_prompt_lookup_with_paged_prefix_cache(model_and_params):
    """Draft-free speculation has no second cache, so it composes with the
    paged layout AND prefix caching — exact greedy output, prefix hits."""
    model, params = model_and_params
    prompt = list(range(1, 25))

    plain = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, page_size=8,
                     prefill_chunk=16, max_new_tokens=8, temperature=0.0),
        kv_dtype=jnp.int8, kv_layout="paged",
    )
    r = plain.add_request(prompt, 8)
    ref = plain.run()[r]

    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, page_size=8,
                     prefill_chunk=16, max_new_tokens=8, temperature=0.0,
                     prefix_cache=True),
        kv_dtype=jnp.int8, kv_layout="paged", prompt_lookup=2, gamma=3,
    )
    a = eng.add_request(prompt, 8)
    assert eng.run()[a] == ref
    b = eng.add_request(prompt, 8)
    assert eng.run()[b] == ref
    assert eng.metrics()["prefix_hit_tokens"] > 0


def test_engine_prompt_lookup_guards(model_and_params):
    model, params = model_and_params
    with pytest.raises(ValueError, match="exclusive"):
        Engine(
            model, params,
            EngineConfig(max_batch_size=2, max_seq_len=64),
            kv_dtype=jnp.float32, prompt_lookup=2,
            draft_model=model, draft_params=params,
        )


# -- sampling extras: repetition penalty, min-p, logprobs ---------------------


def test_engine_repetition_penalty_blocks_repeats(model_and_params):
    """With an extreme penalty, no generated token may repeat anything seen
    (prompt or generated) while unseen vocabulary remains."""
    model, params = model_and_params
    prompt = [5, 9, 13]
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=16, temperature=0.0,
                     repetition_penalty=1e6),
        kv_dtype=jnp.float32,
    )
    rid = eng.add_request(prompt, 16)
    out = eng.run()[rid]
    seen = list(prompt)
    for t in out:
        assert t not in seen, (t, seen)
        seen.append(t)


def test_engine_min_p_one_is_greedy(model_and_params):
    """min_p=1.0 keeps only the argmax token, so sampled output == greedy."""
    model, params = model_and_params
    prompts = _prompts(3, seed=21)

    greedy = _engine(model, params, kv_dtype=jnp.float32)
    g_rids = [greedy.add_request(p, 8) for p in prompts]
    g_outs = greedy.run()

    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=8, temperature=0.9, min_p=1.0),
        kv_dtype=jnp.float32,
    )
    rids = [eng.add_request(p, 8) for p in prompts]
    outs = eng.run()
    for ga, rb in zip(g_rids, rids):
        assert g_outs[ga] == outs[rb]


def test_engine_logprobs(model_and_params):
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=6, temperature=0.0, return_logprobs=True),
        kv_dtype=jnp.float32,
    )
    rid = eng.add_request(prompt, 6)
    eng.run()
    req = next(r for r in eng.finished if r.rid == rid)
    assert len(req.logprobs) == len(req.out) == 6
    assert all(np.isfinite(lp) and lp <= 0.0 for lp in req.logprobs)
    # First token's logprob matches a scoring-pass recompute.
    logits = np.asarray(model.apply(params, jnp.asarray([prompt], jnp.int32)))
    last = logits[0, -1]
    ref = last[req.out[0]] - np.log(np.sum(np.exp(last - last.max()))) - last.max()
    np.testing.assert_allclose(req.logprobs[0], ref, rtol=1e-4, atol=1e-4)


def test_engine_penalties_and_logprobs_tree_speculation(model_and_params):
    """Penalties AND logprobs compose with TREE speculation: the tree
    scoring program penalizes each node with path-adjusted counts (the
    ancestor mask over window one-hots), so the greedy stream exactly
    equals plain penalized decoding; logprobs along the winning branch
    match the plain engine's token-for-token."""
    model, params = model_and_params
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 2, 9, 2, 9, 2]]
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=10, temperature=0.0,
                        repetition_penalty=1.4, presence_penalty=0.3,
                        return_logprobs=True)
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    prids = [plain.add_request(p, 10) for p in prompts]
    pouts = plain.run()
    prefs = {r.rid: r.logprobs for r in plain.finished}

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 prompt_lookup=3, lookup_branches=3, gamma=3)
    rids = [eng.add_request(p, 10) for p in prompts]
    outs = eng.run()
    refs = {r.rid: r.logprobs for r in eng.finished}
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])
        np.testing.assert_allclose(refs[rb], prefs[ra],
                                   rtol=1e-4, atol=1e-4)


def test_engine_penalties_linear_speculation_matches_plain(model_and_params):
    """Repetition + presence/frequency penalties compose with linear
    speculation: the scoring program penalizes each window position with
    prefix-adjusted counts, so the greedy stream exactly equals plain
    penalized decoding (and differs from the unpenalized stream)."""
    model, params = model_and_params
    prompts = [[3, 17, 5, 9], [1, 2, 3]]
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=10, temperature=0.0,
                        repetition_penalty=1.4, presence_penalty=0.4,
                        frequency_penalty=0.2)
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    prids = [plain.add_request(p, 10) for p in prompts]
    pouts = plain.run()

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 draft_model=model, draft_params=params, gamma=3)
    rids = [eng.add_request(p, 10) for p in prompts]
    outs = eng.run()
    for ra, rb in zip(prids, rids):
        assert pouts[ra] == outs[rb], (pouts[ra], outs[rb])

    # Control: penalties actually changed the stream.
    free = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=10, temperature=0.0),
        kv_dtype=jnp.float32,
    )
    frids = [free.add_request(p, 10) for p in prompts]
    fouts = free.run()
    assert any(fouts[fa] != pouts[pa] for fa, pa in zip(frids, prids))


def test_engine_logprobs_linear_speculation_matches_plain(model_and_params):
    """Linear speculation (self-draft) + return_logprobs: the greedy stream
    AND the per-token target logprobs are exactly the plain engine's (the
    scoring forward reports pre-truncation logprobs for committed
    proposals and corrections alike)."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=6, temperature=0.0,
                        return_logprobs=True)
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    prid = plain.add_request(prompt, 6)
    plain.run()
    pref = next(r for r in plain.finished if r.rid == prid)

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 draft_model=model, draft_params=params, gamma=3)
    rid = eng.add_request(prompt, 6)
    eng.run()
    req = next(r for r in eng.finished if r.rid == rid)
    assert req.out == pref.out
    assert len(req.logprobs) == len(req.out)
    np.testing.assert_allclose(req.logprobs, pref.logprobs,
                               rtol=1e-4, atol=1e-4)


def test_engine_per_request_sampling(model_and_params):
    """Requests with different sampling configs share ONE batched decode:
    a greedy request in the batch stays exactly greedy while a sampled
    request (temp>0) runs beside it; per-request top_k=1 is greedy too."""
    model, params = model_and_params
    prompts = _prompts(3, seed=31)

    plain = _engine(model, params, kv_dtype=jnp.float32)
    g_rids = [plain.add_request(p, 8) for p in prompts]
    g_outs = plain.run()

    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=8, temperature=0.9, top_p=0.8),
        kv_dtype=jnp.float32,
    )
    rids = [
        eng.add_request(prompts[0], 8, temperature=0.0),  # greedy override
        eng.add_request(prompts[1], 8),  # engine default: sampled
        eng.add_request(prompts[2], 8, top_k=1, temperature=0.7),  # = greedy
    ]
    outs = eng.run()
    assert outs[rids[0]] == g_outs[g_rids[0]]
    assert outs[rids[2]] == g_outs[g_rids[2]]
    # All finite/vocab-valid for the sampled one.
    assert all(0 <= t < CFG.vocab_size for t in outs[rids[1]])


def test_engine_stop_sequences(model_and_params):
    """Generation retires as soon as the output suffix matches a stop
    sequence (multi-token analogue of eos)."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    # Learn the greedy stream first, then stop on a 2-gram from its middle.
    eng = _engine(model, params, kv_dtype=jnp.float32)
    rid = eng.add_request(prompt, 8)
    stream = eng.run()[rid]
    assert len(stream) == 8
    stop = stream[2:4]

    eng2 = _engine(model, params, kv_dtype=jnp.float32)
    rid2 = eng2.add_request(prompt, 8, stop_sequences=[stop, [999, 998]])
    out = eng2.run()[rid2]
    # Stops right after the FIRST suffix match of the stop pair.
    first = next(
        k for k in range(len(stop), 9) if stream[k - len(stop):k] == stop
    )
    assert out == stream[:first], (out, stream, stop)


def test_server_streaming_sse(model_and_params):
    """POST /generate with stream=true emits one SSE event per token AS IT
    DECODES (not after completion), then a done event whose token list
    equals the non-streaming response for the same request."""
    import http.client
    import json as _json

    from protoquant_tpu.engine.server import EngineServer

    model, params = model_and_params
    eng = _engine(model, params, kv_dtype=jnp.float32)
    srv = EngineServer(eng, port=0).start()
    try:
        body = _json.dumps({"tokens": [3, 1, 4], "max_new_tokens": 6,
                            "stream": True})
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
        conn.request("POST", "/generate", body,
                     {"Content-Type": "application/json"})
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "text/event-stream"
        events = []
        buf = b""
        while True:
            chunk = resp.read(1)
            if not chunk:
                break
            buf += chunk
            while b"\n\n" in buf:
                raw, buf = buf.split(b"\n\n", 1)
                if raw.startswith(b"data: "):
                    events.append(_json.loads(raw[len(b"data: "):]))
            if events and events[-1].get("done"):
                break
        conn.close()
        toks = [e["token"] for e in events if "token" in e]
        done = events[-1]
        assert done.get("done") is True
        assert done["tokens"] == toks, (done, toks)
        assert len(toks) == 6

        # Non-streaming request for the same prompt agrees (greedy).
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
        conn.request("POST", "/generate",
                     _json.dumps({"tokens": [3, 1, 4], "max_new_tokens": 6}),
                     {"Content-Type": "application/json"})
        r2 = _json.loads(conn.getresponse().read())
        conn.close()
        assert r2["tokens"] == toks
    finally:
        srv.stop()


def test_scheduler_priority_and_sjf(model_and_params):
    """Admission policies: with 1 slot and a backlog, "priority" admits the
    high-priority request next (FIFO among equals), "sjf" admits the
    shortest prompt next, and "fcfs" preserves arrival order. Outputs stay
    greedy-exact regardless of admission order."""
    model, params = model_and_params

    def run(scheduler, reqs):
        eng = Engine(
            model, params,
            EngineConfig(max_batch_size=1, max_seq_len=64, prefill_chunk=16,
                         max_new_tokens=4, temperature=0.0),
            kv_dtype=jnp.float32, scheduler=scheduler,
        )
        order = []
        rids = {}
        for prompt, prio in reqs:
            rid = eng.add_request(prompt, 4, priority=prio,
                                  on_token=lambda r, t: (
                                      order.append(r) if r not in order else None))
            rids[rid] = prompt
        outs = eng.run()
        return order, rids, outs

    reqs = [([5, 6, 7, 8, 9, 10], 0),   # long, low prio
            ([1, 2, 3, 4, 5, 6, 7], 0),  # long, low prio
            ([9, 9], 0),                 # short
            ([4, 4, 4], 5)]              # high priority

    # All four wait when the first admission happens (run() starts after
    # every add), so the policies fully control the order.
    order_f, _, outs_f = run("fcfs", reqs)
    assert order_f == [0, 1, 2, 3]

    order_p, _, outs_p = run("priority", reqs)
    # Priority-5 jumps the whole tier-0 backlog; FIFO within tier 0.
    assert order_p == [3, 0, 1, 2], order_p

    order_s, _, outs_s = run("sjf", reqs)
    # Shortest prompts first: len 2, 3, 6, 7.
    assert order_s == [2, 3, 0, 1], order_s

    # Admission order never changes the tokens (greedy exactness).
    assert outs_f == outs_p == outs_s

    m_metrics = Engine(model, params,
                       EngineConfig(max_batch_size=1, max_seq_len=64,
                                    prefill_chunk=16, max_new_tokens=2),
                       kv_dtype=jnp.float32)
    m_metrics.add_request([1, 2], 2)
    m_metrics.run()
    assert "queue_wait_p50_ms" in m_metrics.metrics()


def test_scheduler_priority_aging_prevents_starvation(model_and_params):
    """A tier-0 request that has waited long enough outranks a fresh tier-1
    arrival (aging: +1 effective tier per 60s)."""
    model, params = model_and_params
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=1, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=2, temperature=0.0),
        kv_dtype=jnp.float32, scheduler="priority",
    )
    blocker = eng.add_request([1, 2, 3], 2)
    old = eng.add_request([4, 5], 2, priority=0)
    fresh = eng.add_request([6, 7], 2, priority=1)
    # Simulate 2 minutes of waiting for the tier-0 request.
    for r in eng.waiting:
        if r.rid == old:
            r.t_enqueue -= 120.0
    picked = eng._pick_next()
    assert picked.rid == old, (picked.rid, old, fresh)


def test_engine_presence_penalty_blocks_repeats(model_and_params):
    """An extreme presence penalty forbids any seen token (prompt or
    generated) from recurring while unseen vocabulary remains — the
    OpenAI-style additive analogue of the repetition-penalty test above."""
    model, params = model_and_params
    prompt = [5, 9, 13]
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=16, temperature=0.0,
                     presence_penalty=1e6),
        kv_dtype=jnp.float32,
    )
    rid = eng.add_request(prompt, 16)
    out = eng.run()[rid]
    seen = list(prompt)
    for t in out:
        assert t not in seen, (t, seen)
        seen.append(t)


def test_engine_frequency_penalty_semantics(model_and_params):
    """frequency_penalty scales with COUNT: logits -= f * count. Verified
    against a hand-rolled reference decode on the same model."""
    from protoquant_tpu.models.llama import init_cache

    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    f = 2.5
    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=1, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=10, temperature=0.0,
                     frequency_penalty=f),
        kv_dtype=jnp.float32,
    )
    rid = eng.add_request(prompt, 10)
    out = eng.run()[rid]

    # Reference: cache-free rescoring with explicit count bookkeeping.
    counts = np.zeros(64, np.float64)
    for t in prompt:
        counts[t] += 1
    cur = list(prompt)
    ref = []
    for _ in range(10):
        logits = np.asarray(
            model.apply(params, jnp.asarray([cur], jnp.int32))
        )[0, -1].astype(np.float64)
        t = int(np.argmax(logits - f * counts))
        ref.append(t)
        counts[t] += 1
        cur.append(t)
    assert out == ref, (out, ref)


def test_engine_per_request_penalty_overrides(model_and_params):
    """One slot penalized, one not, in the same batch: the unpenalized
    request matches the plain engine exactly; per-request overrides need
    the count buffer (clear error otherwise)."""
    model, params = model_and_params
    prompts = [[3, 17, 5, 9], [5, 9, 13]]
    plain = _engine(model, params, kv_dtype=jnp.float32)
    p_rid = plain.add_request(prompts[0], 10)
    p_out = plain.run()[p_rid]

    eng = Engine(
        model, params,
        EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                     max_new_tokens=10, temperature=0.0,
                     presence_penalty=0.0, frequency_penalty=1e-9),
        kv_dtype=jnp.float32,
    )
    r0 = eng.add_request(prompts[0], 10,
                         presence_penalty=0.0, frequency_penalty=0.0)
    r1 = eng.add_request(prompts[1], 10, presence_penalty=1e6)
    outs = eng.run()
    assert outs[r0] == p_out, (outs[r0], p_out)
    seen = list(prompts[1])
    for t in outs[r1]:
        assert t not in seen
        seen.append(t)

    no_counts = _engine(model, params, kv_dtype=jnp.float32)
    with pytest.raises(ValueError, match="count buffer"):
        no_counts.add_request(prompts[0], 4, presence_penalty=0.5)


def test_engine_min_new_tokens(model_and_params):
    """eos/stop-sequences are ignored below the min_new_tokens floor; the
    stream continues and the hard max still applies."""
    model, params = model_and_params
    # Find the plain greedy stream, pick its 2nd token as eos.
    probe = _engine(model, params, kv_dtype=jnp.float32, max_new_tokens=12)
    rid = probe.add_request([3, 17, 5, 9], 12)
    ref = probe.run()[rid]
    eos = ref[1]

    # Without the floor: retires at the eos.
    e1 = _engine(model, params, kv_dtype=jnp.float32, max_new_tokens=12)
    r1 = e1.add_request([3, 17, 5, 9], 12, eos_id=eos)
    out1 = e1.run()[r1]
    assert out1[-1] == eos and len(out1) == 2

    # With min_new_tokens=6: the early eos passes through, generation
    # continues to at least 6 (greedy stream unchanged => same prefix).
    e2 = _engine(model, params, kv_dtype=jnp.float32, max_new_tokens=12)
    r2 = e2.add_request([3, 17, 5, 9], 12, eos_id=eos, min_new_tokens=6)
    out2 = e2.run()[r2]
    assert len(out2) >= 6
    assert out2[:2] == ref[:2]


def test_engine_per_request_logprobs(model_and_params):
    """Per-request logprobs opt-in (OpenAI semantics): a requesting and a
    non-requesting request share one batch — only the opt-in request
    records logprobs, and they match the engine-wide-config run exactly."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    base = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=6, temperature=0.0)
    eng = Engine(model, params, base, kv_dtype=jnp.float32)
    r_yes = eng.add_request(prompt, 6, logprobs=True)
    r_no = eng.add_request([1, 2, 3], 6)
    eng.run()
    req_yes = next(r for r in eng.finished if r.rid == r_yes)
    req_no = next(r for r in eng.finished if r.rid == r_no)
    assert len(req_yes.logprobs) == len(req_yes.out) == 6
    assert req_no.logprobs == []

    cfg_on = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                          max_new_tokens=6, temperature=0.0,
                          return_logprobs=True)
    ref = Engine(model, params, cfg_on, kv_dtype=jnp.float32)
    rr = ref.add_request(prompt, 6)
    ref.run()
    ref_req = next(r for r in ref.finished if r.rid == rr)
    assert req_yes.out == ref_req.out
    np.testing.assert_allclose(req_yes.logprobs, ref_req.logprobs,
                               rtol=1e-5, atol=1e-5)


def test_engine_per_request_logprobs_speculative(model_and_params):
    """Per-request logprobs through a speculative engine (self-draft):
    stream and logprobs equal the plain per-request run."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=6, temperature=0.0)
    plain = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    pr = plain.add_request(prompt, 6, logprobs=True)
    plain.run()
    pref = next(r for r in plain.finished if r.rid == pr)

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                 draft_model=model, draft_params=params, gamma=3)
    rid = eng.add_request(prompt, 6, logprobs=True)
    eng.run()
    req = next(r for r in eng.finished if r.rid == rid)
    assert req.out == pref.out
    np.testing.assert_allclose(req.logprobs, pref.logprobs,
                               rtol=1e-4, atol=1e-4)


def test_engine_per_request_seed_reproducible(model_and_params):
    """OpenAI `seed`: a seeded request's sampled stream is identical
    across runs with DIFFERENT co-tenants, different engine seeds, and
    different admission order — the draw chain depends only on the
    request's own key."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]

    def run(engine_seed, others, where):
        ecfg = EngineConfig(max_batch_size=3, max_seq_len=64,
                            prefill_chunk=16, max_new_tokens=8,
                            temperature=0.9, top_k=8, seed=engine_seed)
        eng = Engine(model, params, ecfg, kv_dtype=jnp.float32)
        rids = []
        for i in range(where):
            rids.append(eng.add_request(others[i], 8))
        target = eng.add_request(prompt, 8, seed=1234)
        for i in range(where, len(others)):
            rids.append(eng.add_request(others[i], 8))
        outs = eng.run()
        return outs[target]

    a = run(0, [[1, 2, 3], [9, 8, 7]], 0)
    b = run(7, [[5, 5], [2, 4, 6, 8]], 2)
    c = run(3, [], 0)
    assert a == b == c, (a, b, c)

    # A different seed gives a different stream (temp 0.9 on a random
    # model: collision is vanishingly unlikely).
    d = run_other = None
    ecfg = EngineConfig(max_batch_size=1, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.9, top_k=8)
    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    rid = eng.add_request(prompt, 8, seed=999)
    assert eng.run()[rid] != a


def test_engine_batched_sampling_equals_sequential(model_and_params):
    """Per-slot key chains make SAMPLED decoding co-tenancy-invariant:
    batched temperature>0 serving now exactly equals one-request-at-a-time
    generation (previously only greedy held this invariant)."""
    model, params = model_and_params
    prompts = [[3, 17, 5, 9], [1, 2, 3], [7, 8, 9, 10]]
    seeds = [11, 22, 33]
    ecfg = EngineConfig(max_batch_size=3, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.8, top_k=8)

    seq = []
    for p, sd in zip(prompts, seeds):
        e = Engine(model, params, ecfg, kv_dtype=jnp.float32)
        rid = e.add_request(p, 8, seed=sd)
        seq.append(e.run()[rid])

    eng = Engine(model, params, ecfg, kv_dtype=jnp.float32)
    rids = [eng.add_request(p, 8, seed=sd) for p, sd in zip(prompts, seeds)]
    outs = eng.run()
    for ref, rid in zip(seq, rids):
        assert outs[rid] == ref, (outs[rid], ref)


def test_engine_seeded_speculative_sampling_reproducible(model_and_params):
    """Seeded sampling through a speculative engine: same seed -> same
    stream across runs (same speculative config; co-tenants differ)."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    ecfg = EngineConfig(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.8, top_k=8)

    def run(other):
        eng = Engine(model, params, ecfg, kv_dtype=jnp.float32,
                     draft_model=model, draft_params=params, gamma=3)
        rid = eng.add_request(prompt, 8, seed=77)
        if other:
            eng.add_request(other, 8)
        return eng.run()[rid]

    assert run(None) == run([9, 8, 7, 6])


def test_http_seed_and_logprobs(model_and_params):
    """HTTP surface: {"seed", "logprobs"} per request — a seeded sampled
    request reproduces across calls and returns one logprob per token."""
    import json as _json
    import urllib.request

    from protoquant_tpu.engine.server import EngineServer

    model, params = model_and_params
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.8, top_k=8)
    srv = EngineServer(
        Engine(model, params, ecfg, kv_dtype=jnp.float32), port=0
    ).start()
    try:
        base = f"http://127.0.0.1:{srv.port}"

        def post(payload):
            req = urllib.request.Request(
                base + "/generate", data=_json.dumps(payload).encode()
            )
            with urllib.request.urlopen(req, timeout=30) as r:
                return _json.load(r)

        a = post({"tokens": [3, 17, 5, 9], "max_new_tokens": 6,
                  "seed": 42, "logprobs": True})
        b = post({"tokens": [3, 17, 5, 9], "max_new_tokens": 6,
                  "seed": 42})
        c = post({"tokens": [3, 17, 5, 9], "max_new_tokens": 6,
                  "seed": 43})
        assert a["tokens"] == b["tokens"]
        assert c["tokens"] != a["tokens"]
        assert len(a["logprobs"]) == len(a["tokens"]) == 6
        assert all(lp <= 0.0 for lp in a["logprobs"])
        assert "logprobs" not in b
    finally:
        srv.stop()
