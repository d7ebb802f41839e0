"""From-scratch BPE tokenizer vs the ``tokenizers`` library oracle.

Tokenizers are synthesized ON THE FLY (trained with the oracle library on a
small corpus, serialized to tokenizer.json), then our loader must produce
IDENTICAL encodings and round-trip decodes — byte-level (GPT-2/Llama-3
family) and metaspace (Llama-2/SentencePiece-export family), including
unicode, whitespace runs, contractions, and special tokens. The merge loop
itself is the native C++ BpeMerger; its pure-Python fallback is pinned
equal separately.
"""

import json

import pytest

tokenizers = pytest.importorskip("tokenizers")

from protoquant_tpu.tokenizer import Tokenizer  # noqa: E402

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "hello world, hello tokenization! it's a test — naïve café über alles",
    "numbers 12345 and 67, punctuation?! (brackets) [more] {even more}",
    "newlines\nand\ttabs   and   runs of spaces",
    "日本語のテキストと emoji 🙂 mixed in",
    "def f(x):\n    return x * 2  # code-ish text",
] * 8

SAMPLES = [
    "hello world",
    "the quick brown fox",
    "it's naïve, isn't it?",
    "  leading and trailing  ",
    "tabs\tand\nnewlines",
    "日本語 🙂 test",
    "numbers 123 and x42",
    "",
]


def _train_byte_level(tmp_path):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    t = HFTok(models.BPE())
    t.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    t.decoder = decoders.ByteLevel()
    t.train_from_iterator(
        CORPUS,
        trainers.BpeTrainer(
            vocab_size=400, special_tokens=["<s>", "</s>"], show_progress=False,
            initial_alphabet=pre_tokenizers.ByteLevel.alphabet(),
        ),
    )
    path = str(tmp_path / "bl.json")
    t.save(path)
    return t, path


def _train_metaspace(tmp_path):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    t = HFTok(models.BPE(unk_token="<unk>", byte_fallback=True))
    t.pre_tokenizer = pre_tokenizers.Metaspace(prepend_scheme="always")
    t.decoder = decoders.Metaspace(prepend_scheme="always")
    alphabet = sorted({c for line in CORPUS for c in line.replace(" ", "▁")})
    t.train_from_iterator(
        [line.replace(" ", "▁") for line in CORPUS],
        trainers.BpeTrainer(
            vocab_size=400, special_tokens=["<unk>", "<s>", "</s>"],
            show_progress=False, initial_alphabet=alphabet,
        ),
    )
    path = str(tmp_path / "ms.json")
    t.save(path)
    return t, path


def test_byte_level_encode_matches_oracle(tmp_path):
    hf, path = _train_byte_level(tmp_path)
    ours = Tokenizer.from_file(path)
    for s in SAMPLES:
        want = hf.encode(s).ids
        got = ours.encode(s)
        assert got == want, (s, got, want)


def test_byte_level_decode_roundtrip(tmp_path):
    hf, path = _train_byte_level(tmp_path)
    ours = Tokenizer.from_file(path)
    for s in SAMPLES:
        ids = ours.encode(s)
        assert ours.decode(ids) == hf.decode(ids), s
        assert ours.decode(ids) == s, s  # byte-level is lossless


def test_byte_level_special_tokens(tmp_path):
    hf, path = _train_byte_level(tmp_path)
    ours = Tokenizer.from_file(path)
    s = "<s>hello world</s>"
    want = hf.encode(s).ids
    got = ours.encode(s)
    assert got == want, (got, want)
    # Specials skipped on decode by default; kept on request.
    assert ours.decode(got) == "hello world"
    assert "<s>" in ours.decode(got, skip_special_tokens=False)


def test_metaspace_encode_matches_oracle(tmp_path):
    hf, path = _train_metaspace(tmp_path)
    ours = Tokenizer.from_file(path)
    for s in SAMPLES:
        if not s:
            continue
        want = hf.encode(s).ids
        got = ours.encode(s)
        assert got == want, (s, got, want)


def test_metaspace_byte_fallback_unicode(tmp_path):
    """Characters outside the trained alphabet go through <0xNN> byte
    fallback and must reassemble into the original UTF-8 on decode."""
    hf, path = _train_metaspace(tmp_path)
    ours = Tokenizer.from_file(path)
    s = "hello Ωmega ζ"
    want = hf.encode(s).ids
    got = ours.encode(s)
    assert got == want, (got, want)
    assert ours.decode(got) == hf.decode(got)


def test_python_fallback_matches_native(tmp_path):
    """The pure-Python merge loop is bit-identical to the C++ one."""
    from protoquant_tpu import native

    hf, path = _train_byte_level(tmp_path)
    spec = json.load(open(path))
    ours = Tokenizer(spec)
    if not ours._merger.native:
        pytest.skip("no native toolchain: only one implementation to test")
    pure = Tokenizer(spec)
    pure._merger._lib = None
    pure._merger.native = False
    merges = []
    for m in spec["model"]["merges"]:
        a, b = m if isinstance(m, list) else m.split(" ", 1)
        v = spec["model"]["vocab"]
        merges.append((v[a], v[b], v[a + b]))
    pure._merger._ranks = {}
    for r, (a, b, nid) in enumerate(merges):
        pure._merger._ranks.setdefault((a, b), (r, nid))
    for s in SAMPLES:
        assert ours.encode(s) == pure.encode(s), s
    assert ours._merger.native and not pure._merger.native


def test_server_text_roundtrip(tmp_path):
    """End-to-end text serving: POST {"prompt": text} -> response carries
    decoded "text" (tokenizer wired into the HTTP frontend)."""
    import http.client

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.engine.server import EngineServer
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.utils.config import ModelConfig

    hf, path = _train_byte_level(tmp_path)
    tok = Tokenizer.from_file(path)
    cfg = ModelConfig(
        vocab_size=len(tok.vocab) + len(tok.added),
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    eng = Engine(model, params,
                 EngineConfig(max_batch_size=2, max_seq_len=64,
                              prefill_chunk=16, max_new_tokens=6),
                 kv_dtype=jnp.float32)
    srv = EngineServer(eng, port=0, tokenizer=tok).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
        conn.request("POST", "/generate",
                     json.dumps({"prompt": "hello world", "max_new_tokens": 6}),
                     {"Content-Type": "application/json"})
        rec = json.loads(conn.getresponse().read())
        conn.close()
        assert len(rec["tokens"]) == 6
        assert rec["text"] == tok.decode(rec["tokens"])
    finally:
        srv.stop()


def test_server_text_stop_strings(tmp_path):
    """"stop": [strings] encode through the server tokenizer into
    token-suffix stop sequences; without a tokenizer it is a 400."""
    import http.client

    import jax
    import jax.numpy as jnp

    from protoquant_tpu.engine import Engine, EngineConfig
    from protoquant_tpu.engine.server import EngineServer
    from protoquant_tpu.models import LlamaModel
    from protoquant_tpu.utils.config import ModelConfig

    hf, path = _train_byte_level(tmp_path)
    tok = Tokenizer.from_file(path)
    cfg = ModelConfig(
        vocab_size=len(tok.vocab) + len(tok.added),
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64,
    )
    model = LlamaModel(cfg, mode="fp", dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))

    def run_server(with_tok):
        eng = Engine(model, params,
                     EngineConfig(max_batch_size=2, max_seq_len=64,
                                  prefill_chunk=16, max_new_tokens=12),
                     kv_dtype=jnp.float32)
        return EngineServer(eng, port=0,
                            tokenizer=tok if with_tok else None).start()

    srv = run_server(True)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=120)
        conn.request("POST", "/generate",
                     json.dumps({"prompt": "hello world",
                                 "max_new_tokens": 12}),
                     {"Content-Type": "application/json"})
        base = json.loads(conn.getresponse().read())
        # Use the decoded text of the first 2 generated tokens as the stop
        # string: generation must retire right after producing it.
        stop_text = tok.decode(base["tokens"][:2])
        conn.request("POST", "/generate",
                     json.dumps({"prompt": "hello world",
                                 "max_new_tokens": 12,
                                 "stop": stop_text}),
                     {"Content-Type": "application/json"})
        rec = json.loads(conn.getresponse().read())
        conn.close()
        assert len(rec["tokens"]) < 12, rec
    finally:
        srv.stop()

    srv = run_server(False)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=60)
        conn.request("POST", "/generate",
                     json.dumps({"tokens": [1, 2], "stop": ["x"]}),
                     {"Content-Type": "application/json"})
        assert conn.getresponse().status == 400
        conn.close()
    finally:
        srv.stop()


# -- SentencePiece-Unigram (Gemma/T5 lineage; VERDICT r3 item 10) ------------


def _train_unigram(tmp_path, byte_fallback=True):
    from tokenizers import Tokenizer as HFTok
    from tokenizers import decoders, models, pre_tokenizers, trainers

    t = HFTok(models.Unigram())
    t.pre_tokenizer = pre_tokenizers.Metaspace(prepend_scheme="always")
    t.decoder = decoders.Metaspace(prepend_scheme="always")
    t.train_from_iterator(
        CORPUS,
        trainers.UnigramTrainer(
            vocab_size=300, special_tokens=["<unk>", "<s>", "</s>"],
            unk_token="<unk>", show_progress=False,
        ),
    )
    path = str(tmp_path / "uni.json")
    t.save(path)
    return t, path


def test_unigram_encode_matches_oracle(tmp_path):
    oracle, path = _train_unigram(tmp_path)
    ours = Tokenizer.from_file(path)
    for s in SAMPLES:
        want = oracle.encode(s).ids
        got = ours.encode(s)
        assert got == want, (s, got, want)


def test_unigram_decode_roundtrip(tmp_path):
    oracle, path = _train_unigram(tmp_path)
    ours = Tokenizer.from_file(path)
    for s in SAMPLES:
        ids = oracle.encode(s).ids
        assert ours.decode(ids) == oracle.decode(ids), s


def test_unigram_unknown_chars(tmp_path):
    """Characters outside the trained alphabet: oracle-equal handling
    (unk / byte fallback per the export's settings)."""
    oracle, path = _train_unigram(tmp_path)
    ours = Tokenizer.from_file(path)
    for s in ["ℵ∅ unknown", "mixed ℵ inside", "ℵ"]:
        want = oracle.encode(s).ids
        got = ours.encode(s)
        assert got == want, (s, got, want)
        assert ours.decode(got) == oracle.decode(want), s
