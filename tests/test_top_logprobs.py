"""OpenAI ``top_logprobs``: per-token top-k alternative (token, logprob)
pairs from the same scoring forwards on every decode path — plain decode,
linear speculation, tree speculation — and over HTTP (VERDICT r4 item 8).

The reference has no serving surface at all (SURVEY.md §1.1); the OpenAI
logprobs semantics are the binding convention the engine targets
(engine/sampling.py::top_logprobs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.models import LlamaModel
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


def _ecfg(**over):
    base = dict(max_batch_size=2, max_seq_len=64, prefill_chunk=16,
                max_new_tokens=6, temperature=0.0)
    base.update(over)
    return EngineConfig(**base)


def _check_entries(req, k):
    """Structural contract: one k-entry list per emitted token, logprobs
    finite, <= 0, descending, token ids in range."""
    assert len(req.top_lps) == len(req.out)
    for pairs in req.top_lps:
        assert len(pairs) == k
        lps = [lp for _, lp in pairs]
        assert all(np.isfinite(lp) and lp <= 1e-6 for lp in lps)
        assert lps == sorted(lps, reverse=True)
        assert all(0 <= t < CFG.vocab_size for t, _ in pairs)


def test_top_logprobs_plain_greedy(model_and_params):
    """Plain decode: greedy rows' emitted token IS the top-1 alternative at
    every position (prefill first token AND decode ticks), and the first
    position's pairs match a host recompute from the model's own logits."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    k = 3
    eng = Engine(model, params, _ecfg(), kv_dtype=jnp.float32)
    rid = eng.add_request(prompt, 6, top_logprobs=k)
    r_no = eng.add_request([1, 2, 3], 6)  # co-tenant without opt-in
    eng.run()
    req = next(r for r in eng.finished if r.rid == rid)
    req_no = next(r for r in eng.finished if r.rid == r_no)
    _check_entries(req, k)
    assert req_no.top_lps == []
    # top_logprobs implies the chosen-token logprob stream too (OpenAI:
    # top_logprobs requires logprobs).
    assert len(req.logprobs) == len(req.out)
    for tok, pairs, lp in zip(req.out, req.top_lps, req.logprobs):
        assert pairs[0][0] == tok  # greedy: emitted == argmax == top-1
        np.testing.assert_allclose(pairs[0][1], lp, rtol=1e-5, atol=1e-5)

    # First generated position: recompute top-k from a scoring forward.
    logits = np.asarray(
        model.apply(params, jnp.asarray([prompt], jnp.int32))
    )[0, -1].astype(np.float64)
    logz = np.log(np.sum(np.exp(logits - logits.max()))) + logits.max()
    order = np.argsort(-logits)[:k]
    for (tok, lp), ref_tok in zip(req.top_lps[0], order):
        assert tok == int(ref_tok)
        np.testing.assert_allclose(lp, logits[ref_tok] - logz,
                                   rtol=1e-4, atol=1e-4)


def test_top_logprobs_rejects_over_cap(model_and_params):
    model, params = model_and_params
    eng = Engine(model, params, _ecfg(max_top_logprobs=4),
                 kv_dtype=jnp.float32)
    with pytest.raises(ValueError, match="top_logprobs"):
        eng.add_request([1, 2, 3], 4, top_logprobs=5)


def test_top_logprobs_linear_speculation_matches_plain(model_and_params):
    """Self-draft linear speculation: greedy stream and per-token top-k
    alternatives equal the plain engine's token-for-token (committed
    proposals read their window position, corrections theirs)."""
    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    k = 4
    plain = Engine(model, params, _ecfg(), kv_dtype=jnp.float32)
    pr = plain.add_request(prompt, 6, top_logprobs=k)
    plain.run()
    pref = next(r for r in plain.finished if r.rid == pr)

    eng = Engine(model, params, _ecfg(), kv_dtype=jnp.float32,
                 draft_model=model, draft_params=params, gamma=3)
    rid = eng.add_request(prompt, 6, top_logprobs=k)
    eng.run()
    req = next(r for r in eng.finished if r.rid == rid)
    assert req.out == pref.out
    _check_entries(req, k)
    for got, want in zip(req.top_lps, pref.top_lps):
        assert [t for t, _ in got] == [t for t, _ in want]
        np.testing.assert_allclose([lp for _, lp in got],
                                   [lp for _, lp in want],
                                   rtol=1e-4, atol=1e-4)


def test_top_logprobs_tree_speculation_matches_plain(model_and_params):
    """Tree speculation (prompt-lookup branches): winning-branch parents'
    top-k alternatives equal plain decode's at every committed position."""
    model, params = model_and_params
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 2, 9, 2, 9, 2]]
    k = 3
    plain = Engine(model, params, _ecfg(max_new_tokens=10),
                   kv_dtype=jnp.float32)
    prids = [plain.add_request(p, 10, top_logprobs=k) for p in prompts]
    plain.run()
    prefs = {r.rid: r for r in plain.finished}

    eng = Engine(model, params, _ecfg(max_new_tokens=10),
                 kv_dtype=jnp.float32,
                 prompt_lookup=3, lookup_branches=3, gamma=3)
    rids = [eng.add_request(p, 10, top_logprobs=k) for p in prompts]
    eng.run()
    refs = {r.rid: r for r in eng.finished}
    for ra, rb in zip(prids, rids):
        want, got = prefs[ra], refs[rb]
        assert got.out == want.out
        _check_entries(got, k)
        for g, w in zip(got.top_lps, want.top_lps):
            assert [t for t, _ in g] == [t for t, _ in w]
            np.testing.assert_allclose([lp for _, lp in g],
                                       [lp for _, lp in w],
                                       rtol=1e-4, atol=1e-4)


def test_top_logprobs_eagle_matches_plain(model_and_params):
    """EAGLE speculation reports the same alternatives as plain decode
    (the hidden-returning scorer shares the spec lp plumbing)."""
    from protoquant_tpu.models.eagle import init_eagle

    model, params = model_and_params
    prompt = [3, 17, 5, 9]
    k = 3
    plain = Engine(model, params, _ecfg(), kv_dtype=jnp.float32)
    pr = plain.add_request(prompt, 6, top_logprobs=k)
    plain.run()
    pref = next(r for r in plain.finished if r.rid == pr)

    draft, dparams = init_eagle(model, jax.random.PRNGKey(7),
                                dtype=jnp.float32)
    eng = Engine(model, params, _ecfg(), kv_dtype=jnp.float32,
                 eagle_draft=draft, eagle_params=dparams, gamma=2)
    rid = eng.add_request(prompt, 6, top_logprobs=k)
    eng.run()
    req = next(r for r in eng.finished if r.rid == rid)
    assert req.out == pref.out
    for g, w in zip(req.top_lps, pref.top_lps):
        assert [t for t, _ in g] == [t for t, _ in w]
        np.testing.assert_allclose([lp for _, lp in g],
                                   [lp for _, lp in w],
                                   rtol=1e-4, atol=1e-4)


def test_http_top_logprobs(model_and_params):
    """HTTP surface (VERDICT r4 item 8 'done' bar): top_logprobs=k returns
    k alternatives per emitted token, with the chosen token present (greedy)
    and all probabilities <= 0; absent without the flag."""
    import json as _json
    import urllib.request

    from protoquant_tpu.engine.server import EngineServer

    model, params = model_and_params
    ecfg = _ecfg(max_batch_size=4)
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
                  "top_logprobs": 3})
        assert len(a["top_logprobs"]) == len(a["tokens"]) == 6
        for tok, pairs, lp in zip(a["tokens"], a["top_logprobs"],
                                  a["logprobs"]):
            assert len(pairs) == 3
            assert pairs[0][0] == tok  # greedy: chosen token is top-1
            assert all(p <= 1e-6 for _, p in pairs)
            assert abs(pairs[0][1] - lp) < 1e-4
        b = post({"tokens": [3, 17, 5, 9], "max_new_tokens": 6})
        assert "top_logprobs" not in b

        bad = urllib.request.Request(
            base + "/generate",
            data=_json.dumps({"tokens": [1, 2], "max_new_tokens": 2,
                              "top_logprobs": 99}).encode(),
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected 400 for k over the cap")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.stop()
