"""OpenAI-compatible /v1/completions surface (round 5).

A client speaking the OpenAI completions API must get schema-correct
responses from the same engine the native /generate endpoint drives:
text_completion objects with choices/usage, logprobs in the OpenAI layout
(tokens / token_logprobs / top_logprobs / text_offset), n completions,
honest 400s for fields whose semantics the server cannot honor, and SSE
streaming terminated by `data: [DONE]`.
"""

import json
import urllib.error
import urllib.request

import pytest

import jax
import jax.numpy as jnp

from protoquant_tpu.engine import Engine, EngineConfig
from protoquant_tpu.engine.server import EngineServer
from protoquant_tpu.models import LlamaModel
from protoquant_tpu.utils.config import ModelConfig

pytestmark = pytest.mark.slow

CFG = ModelConfig(
    vocab_size=64,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=64,
)


@pytest.fixture(scope="module")
def server():
    model = LlamaModel(CFG, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    cfg = EngineConfig(max_batch_size=4, max_seq_len=64, prefill_chunk=16,
                       max_new_tokens=8, temperature=0.0)
    eng = Engine(model, params, cfg, kv_dtype=jnp.int8)
    srv = EngineServer(eng, port=0, model_name="tiny-test-model").start()
    yield srv
    srv.stop()


def _post(srv, payload, path="/v1/completions"):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.load(r)


def test_completions_schema_and_greedy_match(server):
    """Schema: text_completion envelope + usage; the tokens match the
    native /generate endpoint (same engine, same greedy stream)."""
    native = _post(server, {"tokens": [3, 17, 5, 9], "max_new_tokens": 6},
                   path="/generate")
    r = _post(server, {"prompt": [3, 17, 5, 9], "max_tokens": 6})
    assert r["object"] == "text_completion"
    assert r["id"].startswith("cmpl-")
    assert r["model"] == "tiny-test-model"
    (c,) = r["choices"]
    assert c["index"] == 0
    assert c["tokens"] == native["tokens"]
    assert c["finish_reason"] == "length"  # ran to max_tokens, no eos
    assert c["logprobs"] is None
    assert r["usage"] == {"prompt_tokens": 4, "completion_tokens": 6,
                          "total_tokens": 10}


def test_completions_openai_logprobs_layout(server):
    """OpenAI "logprobs": k -> token_logprobs + k-wide top_logprobs dicts
    per position, chosen token present with matching value (greedy)."""
    r = _post(server, {"prompt": [3, 17, 5, 9], "max_tokens": 5,
                       "logprobs": 3})
    (c,) = r["choices"]
    lp = c["logprobs"]
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) == 5
    assert len(lp["top_logprobs"]) == 5
    assert lp["text_offset"][0] == 0
    for tok, tok_lp, alts in zip(c["tokens"], lp["token_logprobs"],
                                 lp["top_logprobs"]):
        assert len(alts) == 3
        key = str(tok)  # no tokenizer configured: ids stringify
        assert key in alts
        assert abs(alts[key] - tok_lp) < 1e-4
        assert all(v <= 1e-6 for v in alts.values())


def test_completions_n_and_seed(server):
    """n > 1 returns n indexed choices; a fixed seed at temperature > 0
    makes the whole batch reproducible (vLLM-style seed + i per choice)."""
    body = {"prompt": [1, 2, 3], "max_tokens": 6, "n": 3,
            "temperature": 0.9, "seed": 41}
    a = _post(server, body)
    b = _post(server, body)
    assert [c["index"] for c in a["choices"]] == [0, 1, 2]
    assert ([c["tokens"] for c in a["choices"]]
            == [c["tokens"] for c in b["choices"]])
    assert a["usage"]["completion_tokens"] == sum(
        len(c["tokens"]) for c in a["choices"]
    )


@pytest.mark.parametrize("bad", [
    {"prompt": [1, 2], "echo": True},
    {"prompt": [1, 2], "suffix": "tail"},
    {"prompt": [1, 2], "n": 2, "best_of": 4},
    {"prompt": "text needs a tokenizer"},
    {"prompt": [[1, 2], [3, 4]]},  # batched prompts unsupported
])
def test_completions_unsupported_fields_400(server, bad):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/completions",
        data=json.dumps({"max_tokens": 2, **bad}).encode(),
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_models_endpoint(server):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{server.port}/v1/models", timeout=10
    ) as r:
        m = json.load(r)
    assert m["object"] == "list"
    assert m["data"][0]["id"] == "tiny-test-model"


def test_completions_streaming_done_sentinel(server):
    """Streaming: one text_completion chunk per token (finish_reason null),
    a final chunk with finish_reason, then the [DONE] sentinel."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/completions",
        data=json.dumps({"prompt": [3, 17, 5, 9], "max_tokens": 5,
                         "stream": True}).encode(),
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert len(chunks) == 6  # 5 token chunks + 1 finish chunk
    assert all(c["object"] == "text_completion" for c in chunks)
    assert all(c["choices"][0]["finish_reason"] is None for c in chunks[:-1])
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"
    # Token chunks carry the ids as text (no tokenizer configured).
    native = _post(server, {"tokens": [3, 17, 5, 9], "max_new_tokens": 5},
                   path="/generate")
    assert [int(c["choices"][0]["text"]) for c in chunks[:-1]] \
        == native["tokens"]


def _tiny_tokenizer(tmp_path):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    from protoquant_tpu.tokenizer import Tokenizer

    t = HFTok(models.BPE())
    t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    t.decoder = decoders.ByteLevel()
    t.train_from_iterator(
        ["hello world how are you", "<|user|> <|assistant|> <|system|>"] * 8,
        trainers.BpeTrainer(
            vocab_size=400, special_tokens=["<s>", "</s>"],
            show_progress=False,
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        ),
    )
    path = str(tmp_path / "tok.json")
    t.save(path)
    return Tokenizer.from_file(path)


@pytest.fixture(scope="function")
def chat_server(tmp_path):
    tok = _tiny_tokenizer(tmp_path)
    cfg = ModelConfig(
        vocab_size=len(tok.vocab) + len(tok.added),
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    ecfg = EngineConfig(max_batch_size=4, max_seq_len=128, prefill_chunk=16,
                        max_new_tokens=8, temperature=0.0)
    eng = Engine(model, params, ecfg, kv_dtype=jnp.int8)
    srv = EngineServer(eng, port=0, tokenizer=tok,
                       model_name="tiny-chat").start()
    yield srv, tok
    srv.stop()


def test_chat_completions_schema(chat_server):
    """chat.completion envelope: assistant message content decodes the
    emitted ids; usage covers the templated prompt; chat logprobs use the
    content=[{token, logprob, top_logprobs}] layout."""
    srv, tok = chat_server
    r = _post(srv, {
        "messages": [{"role": "system", "content": "be brief"},
                     {"role": "user", "content": "hello world"}],
        "max_tokens": 5, "logprobs": True, "top_logprobs": 2,
    }, path="/v1/chat/completions")
    assert r["object"] == "chat.completion"
    assert r["id"].startswith("chatcmpl-")
    (c,) = r["choices"]
    assert c["message"]["role"] == "assistant"
    assert c["message"]["content"] == tok.decode(c["tokens"])
    assert c["finish_reason"] == "length"
    content = c["logprobs"]["content"]
    assert len(content) == 5
    for entry, t in zip(content, c["tokens"]):
        assert entry["token"] == tok.decode([t])
        assert len(entry["top_logprobs"]) == 2
        assert entry["top_logprobs"][0]["logprob"] == entry["logprob"]
    # The prompt the engine saw is the TEMPLATED text, not the raw turns.
    templated = srv.chat_template(
        [{"role": "system", "content": "be brief"},
         {"role": "user", "content": "hello world"}]
    )
    assert r["usage"]["prompt_tokens"] == len(tok.encode(templated))


def test_chat_completions_streaming_deltas(chat_server):
    """Chat streaming: chat.completion.chunk objects, role in the first
    delta, content pieces reassembling the full message, then [DONE]."""
    srv, tok = chat_server
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.port}/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "hello"}],
            "max_tokens": 4, "stream": True,
        }).encode(),
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    assert all(c["object"] == "chat.completion.chunk" for c in chunks)
    assert chunks[0]["choices"][0]["delta"]["role"] == "assistant"
    assert chunks[-1]["choices"][0]["finish_reason"] == "length"
    text = "".join(
        c["choices"][0]["delta"].get("content", "") for c in chunks
    )
    ref = _post(srv, {
        "messages": [{"role": "user", "content": "hello"}],
        "max_tokens": 4,
    }, path="/v1/chat/completions")
    assert text == ref["choices"][0]["message"]["content"]


def test_chat_requires_tokenizer(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/chat/completions",
        data=json.dumps({
            "messages": [{"role": "user", "content": "hi"}],
        }).encode(),
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def test_completions_streaming_n_interleaved(server):
    """n > 1 streaming: indexed chunks share one SSE stream (the official
    OpenAI n-streaming shape); per index, the reassembled tokens equal the
    non-stream choice for the same seed."""
    body = {"prompt": [1, 2, 3], "max_tokens": 5, "n": 2,
            "temperature": 0.9, "seed": 17}
    ref = _post(server, body)
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/completions",
        data=json.dumps({**body, "stream": True}).encode(),
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    chunks = [json.loads(e) for e in events[:-1]]
    per_index = {0: [], 1: []}
    fins = {}
    for c in chunks:
        (ch,) = c["choices"]
        if ch["finish_reason"] is not None:
            fins[ch["index"]] = ch["finish_reason"]
        elif ch["text"]:
            per_index[ch["index"]].append(int(ch["text"]))
    assert set(fins) == {0, 1}
    for i in (0, 1):
        assert per_index[i] == ref["choices"][i]["tokens"], i


def test_completions_stream_options_include_usage(server):
    """stream_options.include_usage: a final pre-[DONE] chunk with empty
    choices and the usage object (the OpenAI streaming-usage shape)."""
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/v1/completions",
        data=json.dumps({"prompt": [3, 17, 5, 9], "max_tokens": 4,
                         "stream": True,
                         "stream_options": {"include_usage": True}}).encode(),
    )
    events = []
    with urllib.request.urlopen(req, timeout=120) as r:
        for raw in r:
            line = raw.decode().strip()
            if line.startswith("data: "):
                events.append(line[len("data: "):])
    assert events[-1] == "[DONE]"
    usage_chunk = json.loads(events[-2])
    assert usage_chunk["choices"] == []
    assert usage_chunk["usage"] == {"prompt_tokens": 4,
                                    "completion_tokens": 4,
                                    "total_tokens": 8}
